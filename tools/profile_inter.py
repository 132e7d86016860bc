#!/usr/bin/env python3
"""Profile the P-frame device step stage by stage on the real chip.

Each stage is jitted separately and timed warm (block_until_ready), so
the totals differ slightly from the fused step (XLA fuses across stage
boundaries there), but the ranking tells us where the ~1s goes.
"""
import os
import time
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from svt_av1_tpu.ops import mc as MC
from svt_av1_tpu.ops import me as ME
from svt_av1_tpu.pipeline import inter_encoder as PE

W, H = (1280, 720) if len(sys.argv) < 2 else (int(sys.argv[1]), int(sys.argv[2]))
ph, pw = -(-H // 32) * 32, -(-W // 32) * 32
search = PE.SEARCH_RANGE
pad = search + 1
rng = np.random.default_rng(0)
sy = jnp.asarray(rng.integers(0, 255, (ph, pw), np.int32))
ry = jnp.asarray(rng.integers(0, 255, (ph, pw), np.int32))
su = jnp.asarray(rng.integers(0, 255, (ph // 2, pw // 2), np.int32))
ru = jnp.asarray(rng.integers(0, 255, (ph // 2, pw // 2), np.int32))


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:36s} {dt*1000:8.2f} ms")
    return out


print(f"=== {W}x{H} padded {pw}x{ph}, search={search} ===")

# 1. phase banks (per ref: 1 luma 4x4 + 2 chroma 2x2)
pad_y = jax.jit(lambda r: MC.pad_for_filter(jnp, r, pad))
py = timeit("pad_for_filter luma", pad_y, ry)
bank_y = jax.jit(lambda p: MC.phase_bank(jnp, p, 4, 8))
by = timeit("phase_bank luma 4x4", bank_y, py)
cpad = pad // 2 + 1
pad_c = jax.jit(lambda r: MC.pad_for_filter(jnp, r, cpad))
pu = timeit("pad_for_filter chroma", pad_c, ru)
bank_c = jax.jit(lambda p: MC.phase_bank(jnp, p, 2, 8))
bu = timeit("phase_bank chroma 2x2 (x2 planes)", bank_c, pu)

# 2. HME centers
hme = jax.jit(lambda s, r: ME.hme_centers(s, r, search_reach=search - 4))
centers = timeit("hme_centers", hme, sy, ry)

# 3. warp_by_centers
warp = jax.jit(lambda r, c: ME.warp_by_centers(jnp.pad(r, search, mode="edge"), c, 32, search))
warped = timeit("warp_by_centers", warp, ry, centers)

# 4. refined sweep (one pass)
sweep = jax.jit(lambda s, w, c: ME.refined_search_multisize(s, w, c, 32, 4))
p1 = timeit("refined_search_multisize (1 pass)", sweep, sy, warped, centers)

# 5. priors + pass2
lam = 20
pri = jax.jit(lambda m: ME.median3_mv_field(m))
priors8 = timeit("median3_mv_field", pri, p1[8][0])


def sweep2(s, w, c, pr8, pr16, pr32):
    return ME.refined_search_multisize(s, w, c, 32, 4, lam,
                                       {8: pr8, 16: pr16, 32: pr32})


sw2 = jax.jit(sweep2)
p2 = timeit("refined sweep pass2 (rate-biased)", sw2, sy, warped, centers,
            priors8, pri(p1[16][0]), pri(p1[32][0]))

# 6. true-cost re-score (3 sizes)
def rescore(bank, mv, pr):
    out = []
    for bs in (8, 16, 32):
        pred0 = PE._mc_luma(bank, mv[bs][0] * 8, bs, pad)
        out.append((jnp.abs(PE._block(sy, bs) - pred0).sum((-1, -2))
                    + ((lam * ME.mv_rate_bits((mv[bs][0] - pr[bs]) * 8)) >> 4)))
    return out


pr = {bs: pri(p1[bs][0]) for bs in (8, 16, 32)}
rs = jax.jit(lambda b: rescore(b, p2, pr))
true_cost = timeit("true-cost re-score (3 sizes)", rs, by)

# 7. subpel refine (3 sizes)
def subpel(bank, tc):
    out = []
    for i, bs in enumerate((8, 16, 32)):
        out.append(PE._subpel_refine(PE._block(sy, bs), bank, p2[bs][0] * 8,
                                     tc[i], bs, pad, lam, pr[bs] * 8))
    return out


sp = jax.jit(lambda b, tc: subpel(b, tc))
mvs = timeit("subpel refine (2 steps x 3 sizes)", sp, by, true_cost)

# 8. residual coding at 3 sizes (luma + 2 chroma each)
def resid(bank_y_, mv8):
    outs = []
    for i, bs in enumerate((8, 16, 32)):
        pred = PE._mc_luma(bank_y_, mv8[i][0], bs, pad)
        lv, rec = PE._encode_plane(PE._block(sy, bs), pred, 100, PE.TX_OF[bs])
        outs.append((lv, rec))
    return outs


rd = jax.jit(resid)
timeit("residual code luma (3 sizes)", rd, by, mvs)


def resid_c(bank_u_, mv8):
    outs = []
    for i, bs in enumerate((8, 16, 32)):
        cbs = bs // 2
        pred = PE._mc_chroma(bank_u_, mv8[i][0], cbs, cpad)
        lv, rec = PE._encode_plane(PE._block(su, cbs), pred, 100, PE.TX_OF_C[bs])
        outs.append((lv, rec))
    return outs


rdc = jax.jit(resid_c)
timeit("residual code chroma u (3 sizes)", rdc, bu, mvs)

# 9. full fused step for comparison
fn = PE.build_p_frame_encoder(ph, pw, H // 4, W // 4, 100, cdef=True)
su8 = sy.astype(jnp.uint8)
timeit("FULL fused P step (cdef on)", fn,
       sy.astype(jnp.uint8), su.astype(jnp.uint8), su.astype(jnp.uint8),
       ry.astype(jnp.uint8), ru.astype(jnp.uint8), ru.astype(jnp.uint8), n=3)

# 10. dense subpel refine (new path)
dsp = jax.jit(lambda pp: [PE._subpel_refine_dense(
    PE._block(sy, bs), pp, p2[bs][0], bs, pad, lam, pr[bs] * 8)
    for bs in (8, 16, 32)])
timeit("subpel refine DENSE (3 sizes)", dsp, py)
