#!/usr/bin/env python3
"""Quick profile: dense subpel refine + full P/B steps."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from svt_av1_tpu.ops import mc as MC
from svt_av1_tpu.ops import me as ME
from svt_av1_tpu.pipeline import inter_encoder as PE

W, H = (1280, 720) if len(sys.argv) < 3 else (int(sys.argv[1]), int(sys.argv[2]))
ph, pw = -(-H // 32) * 32, -(-W // 32) * 32
search = PE.SEARCH_RANGE
pad = search + 1
rng = np.random.default_rng(0)
sy = jnp.asarray(rng.integers(0, 255, (ph, pw), np.int32))
ry = jnp.asarray(rng.integers(0, 255, (ph, pw), np.int32))
su = jnp.asarray(rng.integers(0, 255, (ph // 2, pw // 2), np.int32))
ru = jnp.asarray(rng.integers(0, 255, (ph // 2, pw // 2), np.int32))


def timeit(name, fn, *args, n=5):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:36s} {dt*1000:8.2f} ms   (compile {tc:.1f}s)", flush=True)
    return out


print(f"=== {W}x{H} padded {pw}x{ph}, search={search} ===")

lam = 20
mv_fp = {bs: jnp.zeros((ph // bs, pw // bs, 2), jnp.int32) for bs in (8, 16, 32)}
pr = {bs: jnp.zeros((ph // bs, pw // bs, 2), jnp.int32) for bs in (8, 16, 32)}
py = jax.jit(lambda r: MC.pad_for_filter(jnp, r, pad))(ry)
jax.block_until_ready(py)

dsp = jax.jit(lambda pp: [PE._subpel_refine_dense(
    PE._block(sy, bs), pp, mv_fp[bs], bs, pad, lam, pr[bs] * 8)
    for bs in (8, 16, 32)])
timeit("subpel refine DENSE (3 sizes)", dsp, py)

fn = PE.build_p_frame_encoder(ph, pw, H // 4, W // 4, 100, cdef=True)
timeit("FULL fused P step (cdef on)", fn,
       sy.astype(jnp.uint8), su.astype(jnp.uint8), su.astype(jnp.uint8),
       ry.astype(jnp.uint8), ru.astype(jnp.uint8), ru.astype(jnp.uint8), n=3)

fnb = PE.build_b_frame_encoder_dyn(ph, pw, H // 4, W // 4, cdef=True,
                                   compound=True)
timeit("FULL fused B step (cdef+compound)", fnb,
       sy.astype(jnp.uint8), su.astype(jnp.uint8), su.astype(jnp.uint8),
       ry.astype(jnp.uint8), ru.astype(jnp.uint8), ru.astype(jnp.uint8),
       ry.astype(jnp.uint8), ru.astype(jnp.uint8), ru.astype(jnp.uint8),
       jnp.int32(100), jnp.int32(10), jnp.int32(10), jnp.int32(10), n=3)
