import os
_COPY = os.environ.get("REFSRC_COPY", "/tmp/refsrc")
import re
# 1) EbRestProcess.c: replace the ReconOutput call with a direct file dump
p = _COPY + "/Source/Lib/Common/Codec/EbRestProcess.c"
s = open(p).read()
dump_fn = r'''
/* recon-dump workaround: this snapshot's recon FIFO deadlocks the whole
 * pipeline (first frame never completes with -o).  Dump the recon planes
 * straight to the file at picture_number offsets instead (REST threads
 * may complete out of order).  Enabled via env SVT_RECON_DUMP. */
#define _GNU_SOURCE
#include "EbReferenceObject.h"
#include <stdlib.h>
#include <fcntl.h>
#include <unistd.h>
static void ReconDumpToFile(
    PictureControlSet_t  *pcs,
    SequenceControlSet   *scs)
{
    const char *path = getenv("SVT_RECON_DUMP");
    if (!path) return;
    EbBool is16bit = (scs->static_config.encoder_bit_depth > EB_8BIT);
    EbPictureBufferDesc_t *rp;
    if (pcs->parent_pcs_ptr->is_used_as_reference_flag == EB_TRUE)
        rp = is16bit ?
            ((EbReferenceObject*)pcs->parent_pcs_ptr->reference_picture_wrapper_ptr->object_ptr)->reference_picture16bit :
            ((EbReferenceObject*)pcs->parent_pcs_ptr->reference_picture_wrapper_ptr->object_ptr)->reference_picture;
    else
        rp = is16bit ? pcs->recon_picture16bit_ptr : pcs->recon_picture_ptr;
    uint32_t w = rp->width - scs->pad_right;
    uint32_t h = rp->height - scs->pad_bottom;
    uint32_t ps = 1 << is16bit;               /* bytes per sample */
    uint64_t fsz = (uint64_t)w * h * 3 / 2 * ps;
    int fd = open(path, O_WRONLY | O_CREAT, 0644);
    if (fd < 0) return;
    uint64_t off = pcs->picture_number * fsz;
    uint8_t *base = rp->buffer_y + ((rp->origin_y * rp->stride_y + rp->origin_x) << is16bit);
    for (uint32_t r = 0; r < h; r++)
        off += pwrite(fd, base + ((uint64_t)r * rp->stride_y << is16bit), w * ps, off);
    base = rp->bufferCb + (((rp->origin_y >> 1) * rp->strideCb + (rp->origin_x >> 1)) << is16bit);
    for (uint32_t r = 0; r < h / 2; r++)
        off += pwrite(fd, base + ((uint64_t)r * rp->strideCb << is16bit), w / 2 * ps, off);
    base = rp->bufferCr + (((rp->origin_y >> 1) * rp->strideCr + (rp->origin_x >> 1)) << is16bit);
    for (uint32_t r = 0; r < h / 2; r++)
        off += pwrite(fd, base + ((uint64_t)r * rp->strideCr << is16bit), w / 2 * ps, off);
    close(fd);
}
'''
# insert the helper right before the first function definition region; put after includes
incl_end = s.index("\n", s.index('#include "EbRestProcess.h"'))
s = s[:incl_end+1] + dump_fn + s[incl_end+1:]
s = s.replace("""            if (sequence_control_set_ptr->static_config.recon_enabled) {
                ReconOutput(
                    picture_control_set_ptr,
                    sequence_control_set_ptr);
            }""",
"""            if (sequence_control_set_ptr->static_config.recon_enabled) {
                ReconDumpToFile(
                    picture_control_set_ptr,
                    sequence_control_set_ptr);
            }""")
open(p, "w").write(s)
print("RestProcess patched:", "ReconDumpToFile" in s)

# 2) EbAppProcessCmd.c: never poll the recon fifo (it is bypassed)
p2 = _COPY + "/Source/App/EncApp/EbAppProcessCmd.c"
s2 = open(p2).read()
s2 = s2.replace("""    AppExitConditionType    return_value = APP_ExitConditionNone;
    EbErrorType            recon_status = EB_ErrorNone;
    int32_t fseekReturnVal;
    // non-blocking call until all input frames are sent
    recon_status = eb_svt_get_recon(componentHandle, headerPtr);""",
"""    AppExitConditionType    return_value = APP_ExitConditionNone;
    EbErrorType            recon_status = EB_ErrorNone;
    int32_t fseekReturnVal;
    // recon fifo is bypassed (SVT_RECON_DUMP writes the file directly
    // from the REST process); report finished so the app terminates on
    // the stream EOS alone
    (void)componentHandle; (void)headerPtr; (void)fseekReturnVal;
    if (1) return APP_ExitConditionFinished;
    recon_status = eb_svt_get_recon(componentHandle, headerPtr);""")
open(p2, "w").write(s2)
print("App patched:", "recon fifo is bypassed" in s2)
