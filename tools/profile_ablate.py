#!/usr/bin/env python3
"""Ablation timing of the fused inter step: build variants with stages
disabled and diff the wall times (per-stage jit timings are masked by
the ~25 ms tunnel RTT floor; the fused diffs are the ground truth).

Usage: python tools/profile_ablate.py [W H]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from svt_av1_tpu.utils.cache import jax_cache_dir

jax.config.update("jax_compilation_cache_dir", jax_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from svt_av1_tpu.pipeline import inter_encoder as PE

W, H = (1920, 1080) if len(sys.argv) < 3 else (int(sys.argv[1]), int(sys.argv[2]))
ph, pw = -(-H // 64) * 64, -(-W // 64) * 64
rng = np.random.default_rng(0)
sy = jnp.asarray(rng.integers(0, 255, (ph, pw), np.uint8))
su = jnp.asarray(rng.integers(0, 255, (ph // 2, pw // 2), np.uint8))
ry = jnp.asarray(rng.integers(0, 255, (ph, pw), np.uint8))
ru = jnp.asarray(rng.integers(0, 255, (ph // 2, pw // 2), np.uint8))
mi_r, mi_c = H // 4, W // 4
dyn = (jnp.int32(100), jnp.int32(10), jnp.int32(10), jnp.int32(10))
a1 = (sy, su, su, ry, ru, ru)
a2 = a1 + (ry, ru, ru)


def timeit(name, fn, args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt*1000:8.2f} ms", flush=True)
    return dt


print(f"=== ablation {W}x{H} ===")
base = timeit("B fast compound cdef (bench cfg3)", PE.build_b_frame_encoder_dyn(
    ph, pw, mi_r, mi_c, cdef=True, compound=True, rdo=False), a2 + dyn)
nocdef = timeit("B fast compound NO cdef", PE.build_b_frame_encoder_dyn(
    ph, pw, mi_r, mi_c, cdef=False, compound=True, rdo=False), a2 + dyn)
nocomp = timeit("B fast NO compound cdef", PE.build_b_frame_encoder_dyn(
    ph, pw, mi_r, mi_c, cdef=True, compound=False, rdo=False), a2 + dyn)
p_cdef = timeit("P fast cdef", PE.build_p_frame_encoder_dyn(
    ph, pw, mi_r, mi_c, cdef=True, rdo=False), a1[:6] + dyn)
p_nocdef = timeit("P fast NO cdef", PE.build_p_frame_encoder_dyn(
    ph, pw, mi_r, mi_c, cdef=False, rdo=False), a1[:6] + dyn)
print(f"cdef cost inside B step: {1000*(base-nocdef):.1f} ms")
print(f"compound cost inside B step: {1000*(base-nocomp):.1f} ms")
print(f"second-ref cost (P->B, both cdef): {1000*(base-p_cdef):.1f} ms")
