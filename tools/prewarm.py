#!/usr/bin/env python3
"""Populate the persistent TPU compile cache for every bench config.

The driver benchmark runs in a fresh container where the only durable
state is the git checkout, so the cache lives IN the repo
(.jax_cache/tpu — svt_av1_tpu.utils.cache.repo_tpu_cache_dir).  Run
this after any change to device-step code, then commit the refreshed
cache:

    python tools/prewarm.py          # ~run-time of one bench pass
    git add -A .jax_cache && git commit -m 'refresh TPU compile cache'

This is the TPU equivalent of the reference pre-installing its kernel
pointers at init (EbEncHandle.c:917): compiles happen at build time,
never inside a measured encode.

Each config is failure-isolated; the script reports per-config wall
time and the number of XLA compilations it triggered (0 = the cache
already covered it).
"""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    configs = [
        ("headline_1080p_hierB", bench.run_hierb_1080p),
        ("480p_allintra", bench.run_intra_480p),
        ("720p_ldp", bench.run_ldp_720p),
        ("4k10_vod", bench.run_vod_4k10),
        ("4x1080p_live", bench.run_live_4x1080),
        ("smoke", bench.run_smoke),
    ]
    failures = 0
    for name, fn in configs:
        c0 = bench._compiles.count
        t0 = time.perf_counter()
        try:
            fps, _t = fn()
            status = f"{fps:7.3f} fps"
        except Exception as e:
            status = f"FAILED {type(e).__name__}: {e}"
            failures += 1
        dt = time.perf_counter() - t0
        print(f"{name:22s} {status}  [{dt:7.1f} s, "
              f"{bench._compiles.count - c0} compiles]", flush=True)
    d = bench.jax.config.jax_compilation_cache_dir
    print(f"cache dir: {d}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
