/*
 * libsvt_av1_tpu AVCodec wrapper — same integration shape as the
 * reference's ffmpeg_plugin (SURVEY.md §2.6), adapted to the TPU
 * build: the encoder is a Python/JAX library, so the codec drives the
 * stable CLI surface (python -m svt_av1_tpu.app.enc_app) over pipes —
 * raw I420 frames in, an IVF stream out, repacketized to AVPackets.
 *
 * Build: apply 0001-add-libsvt-av1-tpu.patch to ffmpeg 4.x, drop this
 * file into libavcodec/, configure --enable-libsvt-av1-tpu.
 * NOTE: authored against the documented libavcodec 58 API; the build
 * image carries no ffmpeg source tree (zero egress), so this shim is
 * compile-untested here — the pipe protocol itself is exercised by
 * tests/test_app.py through the same CLI.
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>
#include <sys/wait.h>

#include "libavutil/opt.h"
#include "libavutil/imgutils.h"
#include "avcodec.h"
#include "internal.h"

typedef struct SvtAv1TpuContext {
    const AVClass *class;
    int qp;
    int intra_period;
    int preset;
    pid_t child;
    FILE *to_enc;    /* raw I420 writer */
    FILE *from_enc;  /* IVF reader */
    int ivf_header_read;
} SvtAv1TpuContext;

static av_cold int svt_tpu_init(AVCodecContext *avctx)
{
    SvtAv1TpuContext *s = avctx->priv_data;
    int in_pipe[2], out_pipe[2];
    char warg[16], harg[16], qarg[16], iparg[16], parg[16];

    if (pipe(in_pipe) || pipe(out_pipe))
        return AVERROR(errno);
    snprintf(warg, sizeof(warg), "%d", avctx->width);
    snprintf(harg, sizeof(harg), "%d", avctx->height);
    snprintf(qarg, sizeof(qarg), "%d", s->qp);
    snprintf(iparg, sizeof(iparg), "%d", s->intra_period);
    snprintf(parg, sizeof(parg), "%d", s->preset);

    s->child = fork();
    if (s->child == 0) {
        dup2(in_pipe[0], 0);
        dup2(out_pipe[1], 1);
        close(in_pipe[1]);
        close(out_pipe[0]);
        execlp("python", "python", "-m", "svt_av1_tpu.app.enc_app",
               "-i", "-", "-b", "-", "-w", warg, "-h", harg,
               "-q", qarg, "--intra-period", iparg, "--preset", parg,
               (char *)NULL);
        _exit(127);
    }
    close(in_pipe[0]);
    close(out_pipe[1]);
    s->to_enc = fdopen(in_pipe[1], "wb");
    s->from_enc = fdopen(out_pipe[0], "rb");
    if (!s->to_enc || !s->from_enc)
        return AVERROR(errno);
    return 0;
}

static int read_ivf_frame(SvtAv1TpuContext *s, AVCodecContext *avctx,
                          AVPacket *pkt)
{
    uint8_t hdr[12];
    uint32_t size;
    uint64_t pts;
    int ret;

    if (!s->ivf_header_read) {
        uint8_t file_hdr[32];
        if (fread(file_hdr, 1, 32, s->from_enc) != 32)
            return AVERROR(EAGAIN);
        s->ivf_header_read = 1;
    }
    if (fread(hdr, 1, 12, s->from_enc) != 12)
        return AVERROR(EAGAIN);
    size = AV_RL32(hdr);
    pts = AV_RL64(hdr + 4);
    if ((ret = ff_alloc_packet2(avctx, pkt, size, size)) < 0)
        return ret;
    if (fread(pkt->data, 1, size, s->from_enc) != size)
        return AVERROR(EIO);
    pkt->pts = pkt->dts = pts;
    return 0;
}

static int svt_tpu_encode(AVCodecContext *avctx, AVPacket *pkt,
                          const AVFrame *frame, int *got_packet)
{
    SvtAv1TpuContext *s = avctx->priv_data;
    *got_packet = 0;

    if (frame) {
        int p, r;
        for (p = 0; p < 3; p++) {
            int w = p ? (avctx->width + 1) / 2 : avctx->width;
            int h = p ? (avctx->height + 1) / 2 : avctx->height;
            for (r = 0; r < h; r++)
                fwrite(frame->data[p] + r * frame->linesize[p], 1, w,
                       s->to_enc);
        }
        fflush(s->to_enc);
    } else if (s->to_enc) {
        fclose(s->to_enc);   /* EOS: close stdin, drain remaining IVF */
        s->to_enc = NULL;
    }

    if (read_ivf_frame(s, avctx, pkt) == 0)
        *got_packet = 1;
    return 0;
}

static av_cold int svt_tpu_close(AVCodecContext *avctx)
{
    SvtAv1TpuContext *s = avctx->priv_data;
    if (s->to_enc)
        fclose(s->to_enc);
    if (s->from_enc)
        fclose(s->from_enc);
    if (s->child > 0)
        waitpid(s->child, NULL, 0);
    return 0;
}

#define OFFSET(x) offsetof(SvtAv1TpuContext, x)
#define VE AV_OPT_FLAG_ENCODING_PARAM | AV_OPT_FLAG_VIDEO_PARAM
static const AVOption options[] = {
    { "qp", "quantizer 0-63", OFFSET(qp), AV_OPT_TYPE_INT,
      { .i64 = 40 }, 0, 63, VE },
    { "intra_period", "keyframe interval", OFFSET(intra_period),
      AV_OPT_TYPE_INT, { .i64 = 63 }, -2, 1 << 30, VE },
    { "preset", "enc-mode 0-8", OFFSET(preset), AV_OPT_TYPE_INT,
      { .i64 = 8 }, 0, 8, VE },
    { NULL },
};

static const AVClass svt_tpu_class = {
    .class_name = "libsvt_av1_tpu",
    .item_name  = av_default_item_name,
    .option     = options,
    .version    = LIBAVUTIL_VERSION_INT,
};

AVCodec ff_libsvt_av1_tpu_encoder = {
    .name           = "libsvt_av1_tpu",
    .long_name      = NULL_IF_CONFIG_SMALL("SVT-AV1-TPU"),
    .type           = AVMEDIA_TYPE_VIDEO,
    .id             = AV_CODEC_ID_AV1,
    .priv_data_size = sizeof(SvtAv1TpuContext),
    .init           = svt_tpu_init,
    .encode2        = svt_tpu_encode,
    .close          = svt_tpu_close,
    .capabilities   = AV_CODEC_CAP_DELAY,
    .pix_fmts       = (const enum AVPixelFormat[]){ AV_PIX_FMT_YUV420P,
                                                    AV_PIX_FMT_NONE },
    .priv_class     = &svt_tpu_class,
    .wrapper_name   = "libsvt_av1_tpu",
};
