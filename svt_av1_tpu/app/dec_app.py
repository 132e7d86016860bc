"""Decoder CLI (the reference's SvtAv1DecApp is a 44-line stub,
EbDecAppMain.c; this one actually decodes the subset this encoder emits).

  -i <file.ivf>   input IVF
  -o <file.yuv>   output raw 4:2:0 YUV (planar)
  --md5           print a hex digest of the decoded planes instead

Run: python -m svt_av1_tpu.app.dec_app -i out.ivf -o recon.yuv
"""

from __future__ import annotations

import argparse
import hashlib
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="svt_av1_tpu.dec_app")
    p.add_argument("-i", dest="input", required=True)
    p.add_argument("-o", dest="output")
    p.add_argument("--md5", action="store_true")
    args = p.parse_args(argv)

    from svt_av1_tpu.decoder.decode import Decoder
    from svt_av1_tpu.io.ivf import IvfReader

    dec = Decoder()
    md5 = hashlib.md5()
    out = open(args.output, "wb") if args.output else None
    t0 = time.perf_counter()
    n = 0
    with open(args.input, "rb") as fh:
        for _pts, payload in IvfReader(fh).frames():
            frame = dec.decode_temporal_unit(payload)
            for pl in (frame.y, frame.u, frame.v):
                if out:
                    out.write(pl.tobytes())
                if args.md5:
                    md5.update(pl.tobytes())
            n += 1
    dt = time.perf_counter() - t0
    if out:
        out.close()
    if args.md5:
        print(md5.hexdigest())
    print(f"decoded {n} frames in {dt:.2f}s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
