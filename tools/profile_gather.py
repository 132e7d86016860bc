#!/usr/bin/env python3
"""Correctness + speed: Pallas gather_tiles vs vmapped dynamic_slice."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from svt_av1_tpu.ops import gather as G

W, H = 1280, 736
pad = 17
ext = 16
bs = 8
Hp, Wp = H + 2 * pad + 7, W + 2 * pad + 7
nbh, nbw = H // bs, W // bs
rng = np.random.default_rng(0)
plane = jnp.asarray(rng.integers(0, 255, (Hp, Wp), np.int32))
mv = rng.integers(-16, 17, (nbh, nbw, 2)).astype(np.int32)
base_r = (np.arange(nbh)[:, None] * bs + pad - 1 + mv[..., 0]).reshape(-1)
base_c = (np.arange(nbw)[None, :] * bs + pad - 1 + mv[..., 1]).reshape(-1)
base_r_j = jnp.asarray(base_r)
base_c_j = jnp.asarray(base_c)


def xla_gather(p, br, bc):
    one = lambda r, c: jax.lax.dynamic_slice(p, (r, c), (ext, ext))
    return jax.vmap(one)(br, bc)


f_x = jax.jit(xla_gather)
f_p = lambda p, br, bc: G.gather_tiles(
    p, br, bc, nbh=nbh, nbw=nbw, stride=bs, band_off=0,
    band_h=2 * 16 + ext + 1, th=ext, tw=ext)

a = np.asarray(f_x(plane, base_r_j, base_c_j))
b = np.asarray(f_p(plane, base_r_j, base_c_j))
print("match:", np.array_equal(a, b))


def timeit(name, fn, n=20):
    out = fn(plane, base_r_j, base_c_j)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(plane, base_r_j, base_c_j)
        jax.block_until_ready(out)
    print(f"{name:28s} {(time.perf_counter()-t0)/n*1000:8.2f} ms", flush=True)


timeit("XLA vmapped dynamic_slice", f_x)
timeit("Pallas band gather", f_p)
for u in ():
    fn = lambda p, br, bc, u=u: G.gather_tiles(
        p, br, bc, nbh=nbh, nbw=nbw, stride=bs, band_off=0,
        band_h=2 * 16 + ext + 1, th=ext, tw=ext, unroll=u)
    timeit(f"Pallas unroll={u}", fn)
