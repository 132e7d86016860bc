#!/usr/bin/env python3
"""BD-rate harness: compare two encoder configs over a QP sweep.

Usage:  python tools/bdrate.py [--cpu] [--frames N] [--size WxH]
            [--qps 32,40,48,56] [--a key=val,...] [--b key=val,...]

Encodes the same synthetic moving clip with config A and config B at
each QP, measures (bitrate, PSNR-Y), and reports BD-rate of B vs A
(negative = B saves bits at equal quality).  This is the repo's
standing quality gate for RDO/tool changes (VERDICT round-1 item 2:
the <=0.5% BD-rate target needs a measurable harness).

BD-rate per Bjontegaard: integrate the difference of the two
log-rate-vs-PSNR curves (cubic fit) over the overlapping PSNR range.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def bd_rate(rate_a, psnr_a, rate_b, psnr_b) -> float:
    """Bjontegaard delta-rate (%) of B vs A (negative = B better)."""
    la, lb = np.log(rate_a), np.log(rate_b)
    pa = np.polyfit(psnr_a, la, 3)
    pb = np.polyfit(psnr_b, lb, 3)
    lo = max(min(psnr_a), min(psnr_b))
    hi = min(max(psnr_a), max(psnr_b))
    if hi <= lo:
        return float("nan")
    ia = np.polyint(pa)
    ib = np.polyint(pb)
    va = np.polyval(ia, hi) - np.polyval(ia, lo)
    vb = np.polyval(ib, hi) - np.polyval(ib, lo)
    return float((np.exp((vb - va) / (hi - lo)) - 1.0) * 100.0)


def make_clip(w, h, n):
    from svt_av1_tpu.io.yuv import synthetic_frame

    base = synthetic_frame(w, h, seed=11)
    out = []
    for i in range(n):
        f = synthetic_frame(w, h, seed=11)
        f.y[:] = np.roll(base.y, (i, 2 * i), (0, 1))
        f.u[:] = np.roll(base.u, (0, i), (0, 1))
        f.v[:] = np.roll(base.v, (0, i), (0, 1))
        yy, xx = (13 * i) % max(1, h - 40), (7 * i) % max(1, w - 40)
        f.y[yy : yy + 32, xx : xx + 32] ^= 0x55
        out.append(f)
    return out


def run_points(frames, w, h, qps, overrides):
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.pipeline.encoder import Encoder

    rates, psnrs = [], []
    for qp in qps:
        kw = dict(width=w, height=h, qp=qp, intra_period=-1,
                  pred_structure=0, stat_report=True,
                  scene_change_detection=False)
        kw.update(overrides)
        enc = Encoder(EncoderConfig(**kw))
        tot_bits = 0
        tot_psnr = []
        for pkt in enc.encode_all(frames):
            tot_bits += len(pkt.payload) * 8
            if pkt.psnr:
                tot_psnr.append(pkt.psnr[0])
        rates.append(tot_bits / len(frames))
        psnrs.append(float(np.mean(tot_psnr)))
        print(f"  qp={qp}: {rates[-1]:9.0f} bits/frame  "
              f"PSNR-Y {psnrs[-1]:.3f}", file=sys.stderr)
    return np.array(rates), np.array(psnrs)


def parse_overrides(s):
    out = {}
    if not s:
        return out
    for kv in s.split(","):
        k, v = kv.split("=")
        try:
            out[k] = int(v)
        except ValueError:
            out[k] = v
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--size", default="640x360")
    ap.add_argument("--qps", default="28,36,44,52")
    ap.add_argument("--a", default="enc_mode=8", help="config A overrides")
    ap.add_argument("--b", default="enc_mode=4", help="config B overrides")
    args = ap.parse_args(argv)

    if args.cpu:
        import os
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from svt_av1_tpu.utils.cache import jax_cache_dir
    jax.config.update("jax_compilation_cache_dir",
                      jax_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    w, h = (int(x) for x in args.size.split("x"))
    qps = [int(q) for q in args.qps.split(",")]
    frames = make_clip(w, h, args.frames)
    print(f"config A ({args.a}):", file=sys.stderr)
    ra, pa = run_points(frames, w, h, qps, parse_overrides(args.a))
    print(f"config B ({args.b}):", file=sys.stderr)
    rb, pb = run_points(frames, w, h, qps, parse_overrides(args.b))
    bd = bd_rate(ra, pa, rb, pb)
    print(f"BD-rate (B vs A): {bd:+.2f}%  (negative = B better)")
    return 0


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    sys.exit(main())
