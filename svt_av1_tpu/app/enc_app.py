"""Encoder CLI (ref SvtAv1EncApp, EbAppMain.c:82 / EbAppConfig.c tokens).

Token names mirror the reference app where meaningful:
  -i <file>       input (.y4m autodetected, else raw 4:2:0 YUV; '-' stdin)
  -b <file>       output IVF bitstream
  -o <file>       optional recon YUV output (ref -o)
  -w/-h           width/height (required for raw YUV)
  -q              quantizer 0..63 (ref -q)
  -n              number of frames to encode
  --preset        enc_mode 0..8 (ref -enc-mode)
  --intra-period  -2 intra-only, -1 first-frame-only, N = keyframe every N+1
  --fps           frame rate (IVF header)
  --tiles-log2    tile columns log2
  --stat-report   print per-frame PSNR
  --synthetic N   encode N synthetic frames (no input needed)

Run: python -m svt_av1_tpu.app.enc_app -w 854 -h 480 -q 40 --synthetic 8 -b out.ivf
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="svt_av1_tpu.enc_app", add_help=False)
    p.add_argument("--help", action="help")
    p.add_argument("-i", dest="input")
    p.add_argument("-b", dest="output")
    p.add_argument("-o", dest="recon")
    p.add_argument("-w", dest="width", type=int, default=0)
    p.add_argument("-h", dest="height", type=int, default=0)
    p.add_argument("-q", dest="qp", type=int, default=50)
    p.add_argument("-n", dest="frames", type=int, default=0)
    p.add_argument("--preset", type=int, default=8)
    p.add_argument("--intra-period", type=int, default=-2)
    p.add_argument("--pred-struct", type=int, default=0,
                   help="0 low-delay P, 2 random access (hier-B)")
    p.add_argument("--hierarchical-levels", type=int, default=3)
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--tiles-log2", type=int, default=0)
    p.add_argument("--stat-report", action="store_true")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--gop-shards", type=int, default=1,
                   help="encode N GOPs in lockstep over a device mesh "
                        "(needs --intra-period >= 1 and flat pred "
                        "structure; ref multi-channel instances)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.io import IvfWriter, Y4MReader, YuvReader
    from svt_av1_tpu.io.yuv import synthetic_frame
    from svt_av1_tpu.pipeline.encoder import Encoder

    if args.synthetic:
        if not (args.width and args.height):
            print("--synthetic requires -w and -h", file=sys.stderr)
            return 2
        frames = (synthetic_frame(args.width, args.height, seed=i)
                  for i in range(args.synthetic))
        width, height = args.width, args.height
    else:
        if not args.input:
            print("missing -i input (or --synthetic N)", file=sys.stderr)
            return 2
        fh = sys.stdin.buffer if args.input == "-" else open(args.input, "rb")
        head = fh.peek(9)[:9] if hasattr(fh, "peek") else b""
        if args.input.endswith(".y4m") or head.startswith(b"YUV4MPEG2"):
            reader = Y4MReader(fh)
            width, height = reader.width, reader.height
        else:
            if not (args.width and args.height):
                print("raw YUV requires -w and -h", file=sys.stderr)
                return 2
            reader = YuvReader(fh, args.width, args.height)
            width, height = args.width, args.height
        frames = reader.frames()

    cfg = EncoderConfig(width=width, height=height, qp=args.qp,
                        enc_mode=args.preset,
                        intra_period=args.intra_period,
                        pred_structure=args.pred_struct,
                        hierarchical_levels=args.hierarchical_levels,
                        tile_columns_log2=args.tiles_log2,
                        stat_report=args.stat_report,
                        recon_output=bool(args.recon) or args.stat_report,
                        num_gop_shards=args.gop_shards)
    if args.gop_shards > 1:
        if args.pred_struct != 0 or args.intra_period < 1:
            print("--gop-shards needs --pred-struct 0 and "
                  "--intra-period >= 1", file=sys.stderr)
            return 2
        from svt_av1_tpu.parallel import GopShardedEncoder
        enc = GopShardedEncoder(cfg, args.gop_shards,
                                args.intra_period + 1)
    else:
        enc = Encoder(cfg)

    out = open(args.output, "wb") if args.output else None
    ivf = IvfWriter(out, width, height, args.fps, 1) if out else None
    rec_fh = open(args.recon, "wb") if args.recon else None

    t0 = time.perf_counter()
    state = {"n_out": 0, "total": 0, "pend": b""}
    rec_buf: dict = {}   # hier-B: recon arrives in decode order

    def write_rec(rc) -> None:
        for pl in (rc.y, rc.u, rc.v):
            rec_fh.write(pl.tobytes())

    def drain() -> None:
        while True:
            pkt = enc.get_packet()
            if pkt is None:
                return
            state["total"] += len(pkt.payload)
            if not pkt.show:
                # hier-B no-show TU: bundle into the IVF frame of the
                # next shown picture (one IVF frame per display step)
                state["pend"] += pkt.payload
            else:
                if ivf:
                    ivf.write_frame(state["pend"] + pkt.payload, pkt.pts)
                state["pend"] = b""
                state["n_out"] += 1
            if rec_fh:
                if pkt.display_idx is None:      # flat modes: in order
                    if pkt.recon is not None:
                        write_rec(pkt.recon)
                else:
                    if pkt.recon is not None:
                        rec_buf[pkt.display_idx] = pkt.recon
                    if pkt.show:
                        rc = rec_buf.pop(pkt.display_idx, None)
                        if rc is not None:
                            write_rec(rc)
            if args.stat_report and pkt.psnr:
                print(f"frame {pkt.pts}: {len(pkt.payload)} bytes, "
                      f"PSNR {pkt.psnr[0]:.2f}/{pkt.psnr[1]:.2f}/"
                      f"{pkt.psnr[2]:.2f}")

    n_in = 0
    for frame in frames:
        if args.frames and n_in >= args.frames:
            break
        enc.send_picture(frame)
        n_in += 1
        drain()
    enc.flush()
    drain()
    n_out, total = state["n_out"], state["total"]
    dt = time.perf_counter() - t0

    if ivf:
        ivf.finalize()
        out.close()
    if rec_fh:
        rec_fh.close()
    kbps = total * 8 * args.fps / max(n_out, 1) / 1000
    print(f"encoded {n_out} frames in {dt:.2f}s ({n_out / max(dt, 1e-9):.2f} "
          f"fps), {total} bytes (~{kbps:.0f} kbps @ {args.fps}fps)",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
