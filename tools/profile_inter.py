#!/usr/bin/env python3
"""Profile the inter (P/B) device step stage by stage on the real chip.

Each stage is jitted separately and timed warm (block_until_ready), so
the totals differ slightly from the fused step (XLA fuses across stage
boundaries there), but the ranking tells us where the time goes.

Usage: python tools/profile_inter.py [W H]   (default 1920 1080)
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

from svt_av1_tpu.ops import cdef as CD
from svt_av1_tpu.ops import deblock as DB
from svt_av1_tpu.ops import mc as MC
from svt_av1_tpu.ops import me as ME
from svt_av1_tpu.pipeline import inter_encoder as PE

W, H = (1920, 1080) if len(sys.argv) < 3 else (int(sys.argv[1]), int(sys.argv[2]))
ph, pw = -(-H // 64) * 64, -(-W // 64) * 64
search = PE.SEARCH_RANGE
pad = search + 1
cpad = pad // 2 + 1
rng = np.random.default_rng(0)
sy = jnp.asarray(rng.integers(0, 255, (ph, pw), np.int32))
ry = jnp.asarray(rng.integers(0, 255, (ph, pw), np.int32))
su = jnp.asarray(rng.integers(0, 255, (ph // 2, pw // 2), np.int32))
ru = jnp.asarray(rng.integers(0, 255, (ph // 2, pw // 2), np.int32))
lam = 20


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt*1000:8.2f} ms")
    return out


print(f"=== {W}x{H} padded {pw}x{ph}, search={search} ===")

py = jax.jit(lambda r: MC.pad_for_filter(jnp, r, pad))(ry)
pu = jax.jit(lambda r: MC.pad_for_filter(jnp, r, cpad))(ru)
jax.block_until_ready((py, pu))

# --- full-pel ME pipeline (one reference) -------------------------------
r2 = 4
hme = jax.jit(lambda s, r: ME.hme_centers(s, r, search_reach=search - r2))
centers = timeit("hme_centers", hme, sy, ry)
warp = jax.jit(lambda r, c: ME.warp_by_centers(
    jnp.pad(r, search, mode="edge"), c, 32, search))
warped = timeit("warp_by_centers", warp, ry, centers)
lat_f = jax.jit(lambda s, w: ME.sad_lattice_multisize(s, w, r2))
lat = timeit("sad_lattice_multisize", lat_f, sy, warped)
sel1 = jax.jit(lambda l, c: ME.select_from_lattice(l, c, 32, r2))
p1 = timeit("select_from_lattice (pass 1)", sel1, lat, centers)
pri = jax.jit(ME.median3_mv_field)
priors = {bs: pri(p1[bs][0]) for bs in PE.SIZES}
jax.block_until_ready(priors)


def sel2(l, c, pr8, pr16, pr32):
    return ME.select_from_lattice(l, c, 32, r2, lam,
                                  {8: pr8, 16: pr16, 32: pr32})


p2 = timeit("select_from_lattice (rate-biased)", jax.jit(sel2), lat,
            centers, priors[8], priors[16], priors[32])

for bs in PE.SIZES:
    f = jax.jit(lambda mv, pr, bs=bs: PE._subpel_refine_dense(
        PE._block(sy, bs), py, mv, bs, pad, lam, pr * 8))
    timeit(f"subpel_refine_dense {bs}x{bs}", f, p2[bs][0], priors[bs])

mv = {bs: jax.jit(lambda m, p, bs=bs: PE._subpel_refine_dense(
    PE._block(sy, bs), py, m, bs, pad, lam, p * 8)[0])(
        p2[bs][0], priors[bs]) for bs in PE.SIZES}
jax.block_until_ready(mv)


def me64f(mv32, pr64):
    src64 = PE._block(sy, 64)
    best = None
    bmv = None
    for dr in (0, 1):
        for dc in (0, 1):
            mvc = mv32[dr::2, dc::2]
            pred = PE._mc_patch(py, mvc, 64, pad, False, 8)
            c = (jnp.abs(src64 - pred).sum((-1, -2))
                 + ((lam * ME.mv_rate_bits(mvc - pr64 * 8)) >> 4))
            if best is None:
                best, bmv = c, mvc
            else:
                b = c < best
                bmv = jnp.where(b[..., None], mvc, bmv)
                best = jnp.minimum(c, best)
    return bmv, best


mv[64], _ = timeit("me64 (4 cand)", jax.jit(me64f), mv[32],
                   priors[32][::2, ::2])

# --- compound candidate (per size: 2 jnt MC + average + SAD) ------------
for bs in PE.SIZES64:
    f = jax.jit(lambda m, bs=bs: MC.jnt_average(
        jnp,
        PE._mc_patch(py, m, bs, pad, False, 8, jnt=True),
        PE._mc_patch(py, m, bs, pad, False, 8, jnt=True), 8))
    timeit(f"compound 2xjntMC+avg {bs}x{bs}", f, mv[bs])

# --- fast-path MC at selected-cell granularity --------------------------
mv8 = jnp.repeat(jnp.repeat(mv[8], 1, 0), 1, 1)
f = jax.jit(lambda m: PE._mc_patch(py, m, 8, pad, False, 8))
timeit("mc_patch luma 8x8 cells (1 ref)", f, mv8)
mvc4 = mv8  # same grid count for chroma 4x4
f = jax.jit(lambda m: PE._mc_patch(pu, m, 4, cpad, True, 8))
timeit("mc_patch chroma 4x4 cells (1 pl)", f, mvc4)

# --- residual coding at each size (3 planes) ----------------------------
for bs in PE.SIZES64:
    def res(m, bs=bs):
        pred = PE._mc_patch(py, m, bs, pad, False, 8)
        ly, ry_ = PE._encode_plane(PE._block(sy, bs), pred, 100,
                                   PE.TX_OF[bs])
        cbs = bs // 2
        predc = PE._mc_patch(pu, m, cbs, cpad, True, 8)
        lu, ru_ = PE._encode_plane(PE._block(su, cbs), predc, 100,
                                   PE.TX_OF_C[bs])
        return ly, ry_, lu, ru_
    timeit(f"MC+residual code {bs} (y+1c)", jax.jit(res), mv[bs])

# --- in-loop filters ----------------------------------------------------
sz_y = jnp.full((ph, pw), 8, jnp.int32)
f = jax.jit(lambda p: DB.deblock_plane(jnp, p, sz_y, 10, 10, True))
timeit("deblock luma", f, sy)
sk = jnp.zeros((ph // 8, pw // 8), bool)
f = jax.jit(lambda cy, cu, cv: CD.cdef_search_and_apply(
    jnp, (cy, cu, cv), (cy, cu, cv), sk, 5, coeff_shift=0))
timeit("cdef search+apply", f, sy, su, su)

# --- full fused steps ---------------------------------------------------
mi_r, mi_c = H // 4, W // 4
su8 = su.astype(jnp.uint8)
fnp = PE.build_p_frame_encoder_dyn(ph, pw, mi_r, mi_c, cdef=True,
                                   rdo=False)
args = (sy.astype(jnp.uint8), su8, su8,
        ry.astype(jnp.uint8), ru.astype(jnp.uint8), ru.astype(jnp.uint8))
dyn = (jnp.int32(100), jnp.int32(10), jnp.int32(10), jnp.int32(10))
timeit("FULL P step (fast, cdef)", fnp, *args, *dyn, n=3)
fnb = PE.build_b_frame_encoder_dyn(ph, pw, mi_r, mi_c, cdef=True,
                                   compound=True, rdo=False)
timeit("FULL B step (fast, compound, cdef)", fnb, *args,
       ry.astype(jnp.uint8), ru.astype(jnp.uint8), ru.astype(jnp.uint8),
       *dyn, n=3)
