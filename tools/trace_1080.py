#!/usr/bin/env python3
"""Run bench config 3 (1080p hier-B) with SVT_TRACE and print a
per-stage time summary — shows where the e2e ms/frame actually go
(dispatch vs fetch vs entropy vs collect) on the real device."""
from __future__ import annotations

import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SVT_TRACE", "/tmp/trace_1080.json")

import jax

from svt_av1_tpu.utils.cache import jax_cache_dir

jax.config.update("jax_compilation_cache_dir", jax_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import time

import numpy as np

from bench import synthetic_clip
from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.pipeline.encoder import Encoder


def main():
    W, H, N = 1920, 1080, 17
    frames = synthetic_clip(W, H, N)
    cfg = dict(width=W, height=H, qp=40, intra_period=-1,
               pred_structure=2, hierarchical_levels=3, compound_mode=1,
               enable_cdef=True, enable_deblocking=True,
               recon_output=False, scene_change_detection=False)
    enc = Encoder(EncoderConfig(**cfg))
    for f in frames[:9]:
        enc.send_picture(f)
    enc.flush()
    while enc.get_packet() is not None:
        pass
    print("warm", flush=True)
    enc2 = Encoder(EncoderConfig(**cfg))
    tr = enc2._tracer
    tr.events.clear()
    t0 = time.perf_counter()
    for f in frames:
        enc2.send_picture(f)
    enc2.flush()
    n = 0
    while enc2.get_packet() is not None:
        n += 1
    dt = time.perf_counter() - t0
    print(f"e2e: {N / dt:.2f} fps ({dt / N * 1e3:.0f} ms/frame, n={n})")
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for e in tr.events:
        agg[e["name"]] += e["dur"] / 1e3
        cnt[e["name"]] += 1
    for k in sorted(agg, key=agg.get, reverse=True):
        print(f"{k:20s} {agg[k]:8.0f} ms total  {agg[k]/max(1,cnt[k]):7.1f}"
              f" ms avg  x{cnt[k]}")
    # wall coverage: how much of the run the MAIN thread spent inside
    # dispatch/collect (the serial part)
    main_tid = max(set(e["tid"] for e in tr.events
                       if e["name"] == "dispatch"), default=None)
    ser = sum(e["dur"] / 1e3 for e in tr.events if e["tid"] == main_tid)
    print(f"main-thread span time: {ser:.0f} ms of {dt*1e3:.0f} ms wall")


if __name__ == "__main__":
    main()
