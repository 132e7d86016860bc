#!/usr/bin/env python3
"""Micro-profile the dense refine internals at bs=8, 720p."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from svt_av1_tpu.ops import mc as MC
from svt_av1_tpu.pipeline import inter_encoder as PE

W, H = 1280, 720
ph, pw = -(-H // 32) * 32, -(-W // 32) * 32
search = PE.SEARCH_RANGE
pad = search + 1
rng = np.random.default_rng(0)
sy = jnp.asarray(rng.integers(0, 255, (ph, pw), np.int32))
ry = jnp.asarray(rng.integers(0, 255, (ph, pw), np.int32))
ref_pad = jax.jit(lambda r: MC.pad_for_filter(jnp, r, pad))(ry)
jax.block_until_ready(ref_pad)


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt*1000:8.2f} ms", flush=True)
    return out


for bs in (8, 16, 32):
    nbh, nbw = ph // bs, pw // bs
    mv_fp = jnp.zeros((nbh, nbw, 2), jnp.int32)
    pr8 = jnp.zeros((nbh, nbw, 2), jnp.int32)
    ext = bs + 8

    def gather_only(rp):
        base_r = (jnp.arange(nbh)[:, None] * bs + pad - 1
                  + mv_fp[..., 0]).reshape(-1)
        base_c = (jnp.arange(nbw)[None, :] * bs + pad - 1
                  + mv_fp[..., 1]).reshape(-1)
        one = lambda r, c: jax.lax.dynamic_slice(rp, (r, c), (ext, ext))
        return jax.vmap(one)(base_r, base_c)

    g = jax.jit(gather_only)
    timeit(f"bs={bs:2d} patch gather [N,{ext},{ext}]", g, ref_pad)

    gt = jax.jit(lambda rp: jnp.transpose(gather_only(rp), (1, 2, 0)))
    timeit(f"bs={bs:2d} gather + transpose", gt, ref_pad)

    full = jax.jit(lambda rp: PE._subpel_refine_dense(
        PE._block(sy, bs), rp, mv_fp, bs, pad, 20, pr8, 8))
    timeit(f"bs={bs:2d} full dense refine", full, ref_pad)
