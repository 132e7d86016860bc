#!/usr/bin/env python3
"""Driver benchmark: BASELINE config 1 — all-intra 480p 8-bit CQP -> IVF.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the ratio to 30 fps real-time 480p (the reference's VOD/
live positioning, README.md:7; the repo publishes no absolute fps —
BASELINE.md "published: none").

Runs on whatever backend the environment provides (real TPU under the
driver; CPU fallback elsewhere).  Measures the full hybrid pipeline:
device wavefront encode + host entropy + packetization, steady-state
(compile excluded via warmup frame).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> int:
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.io.yuv import synthetic_frame
    from svt_av1_tpu.pipeline.encoder import Encoder

    W, H, QP, NFRAMES = 854, 480, 40, 64
    enc = Encoder(EncoderConfig(width=W, height=H, qp=QP, device_batch=32,
                            recon_output=False))
    frames = [synthetic_frame(W, H, seed=i) for i in range(NFRAMES)]

    # warmup (compile the batched step at the same batch size)
    for f in frames[:32]:
        enc.send_picture(f)
    for _ in range(32):
        enc.get_packet()

    t0 = time.perf_counter()
    total_bytes = 0
    for f in frames:          # async: device queues up
        enc.send_picture(f)
    for _ in frames:          # host entropy overlaps device work
        total_bytes += len(enc.get_packet().payload)
    dt = time.perf_counter() - t0
    fps = NFRAMES / dt

    print(json.dumps({
        "metric": "480p_allintra_cqp_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
