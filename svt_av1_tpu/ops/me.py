"""Motion estimation (device): batched full-pel SAD search.

The reference's ME is a per-segment multi-threaded HME/SAD sweep
(MotionEstimationKernel, EbMotionEstimationProcess.c:374;
open_loop_me_fullpel_search_sblock, EbMotionEstimation.c:3251).  The TPU
formulation evaluates EVERY block of the frame against EVERY candidate
offset as one dense tensor program: for each offset d in a (2R+1)^2
window, |src - shift(ref, d)| is reduced per aligned block by a reshape
block-sum — no per-block control flow, all MXU/VPU-friendly.

SAD tie-breaking follows raster order over (dy, dx), matching a
'first-best-wins' scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


import numpy as np


def mv_rate_bits(mv8):
    """Approximate MV coding cost in bits for a (0,0) predictor prior.

    Rough model of av1_encode_mv's sign+class+offset+fraction bins; used
    only as the encoder-side rate bias (the reference's lambda-weighted
    ME cost, EbMotionEstimation.c mv cost tables) — never in the
    bitstream, so a cheap approximation is fine.

    ceil(log2(a + 1)) == bit_length(a) for a >= 1, so the magnitude
    term is integer clz — the float log2 was ~25% of the whole B step's
    select stage (81-offset lattices evaluate this per offset x block).
    """
    a = jnp.abs(mv8).astype(jnp.uint32)
    nbits = 32 - jax.lax.clz(a)           # bit_length; clz(0) = 32 -> 0
    comp = jnp.where(a == 0, 0, 5 + nbits.astype(jnp.int32))
    return 2 + comp.sum(-1)


def fullpel_search(src, ref_pad, block: int, search_range: int,
                   lam=None, prior_fp=None):
    """Exhaustive full-pel rate-biased SAD search on aligned blocks.

    src:      [H, W] int32 source plane (H, W multiples of `block`)
    ref_pad:  [H + 2R, W + 2R] int32 edge-padded reference plane
    lam:      cost = SAD + (lam * mv_bits(mv - prior)) >> 4 (None: pure
              SAD); int or traced scalar
    prior_fp: [nbh, nbw, 2] full-pel MV predictor approximation (the
              entropy coder's ref-MV stack neighborhood); None = (0,0)
    returns:  (mv [nbh, nbw, 2] int32 full-pel (row, col), cost [nbh, nbw])
    """
    H, W = src.shape
    R = search_range
    n = 2 * R + 1
    nbh, nbw = H // block, W // block

    def body(k, state):
        best_cost, best_k = state
        dy = k // n
        dx = k % n
        win = jax.lax.dynamic_slice(ref_pad, (dy, dx), (H, W))
        diff = jnp.abs(src - win)
        cost = diff.reshape(nbh, block, nbw, block).sum((1, 3))
        if lam is not None:
            mv8 = (jnp.stack([dy - R, dx - R])[None, None] -
                   (prior_fp if prior_fp is not None else 0)) * 8
            cost = cost + ((lam * mv_rate_bits(mv8)) >> 4)
        better = cost < best_cost
        return (jnp.where(better, cost, best_cost),
                jnp.where(better, k, best_k))

    init = (jnp.full((nbh, nbw), 2**30, jnp.int32),
            jnp.zeros((nbh, nbw), jnp.int32))
    best_cost, best_k = jax.lax.fori_loop(0, n * n, body, init)
    mv = jnp.stack([best_k // n - R, best_k % n - R], axis=-1)
    return mv, best_cost


def fullpel_search_multisize(src, ref_pad, search_range: int,
                             lam=None, priors=None):
    """One exhaustive sweep scoring 8/16/32 blocks simultaneously.

    The SAD of a 16x16 (32x32) block at an offset is the 2x2 (4x4) sum
    of its children's 8x8 SADs at that offset, so one diff pass per
    offset feeds all three size pyramids (vs three sweeps).

    priors: optional {8: [nb8,...], 16: ..., 32: ...} full-pel MV priors
    for the rate bias.  Returns {bs: (mv, cost)}.
    """
    H, W = src.shape
    R = search_range
    n = 2 * R + 1

    def blocksum(d, bs):
        return d.reshape(H // bs, bs, W // bs, bs).sum((1, 3))

    def body(dy, state):
        # one dynamic row-slice per dy; the dx axis unrolls as STATIC
        # lane slices (dynamic 2-D slicing per offset is pathologically
        # slow on TPU)
        rows = jax.lax.dynamic_slice(ref_pad, (dy, 0), (H, W + 2 * R))
        out = {bs: state[bs] for bs in (8, 16, 32)}
        for dx in range(n):
            diff = jnp.abs(src - rows[:, dx : dx + W])
            d8 = blocksum(diff, 8)
            d16 = d8.reshape(H // 16, 2, W // 16, 2).sum((1, 3))
            d32 = d16.reshape(H // 32, 2, W // 32, 2).sum((1, 3))
            k = dy * n + dx
            nxt = {}
            for bs, d in ((8, d8), (16, d16), (32, d32)):
                best_cost, best_k = out[bs]
                cost = d
                if lam is not None:
                    mv8 = (jnp.stack([dy - R, dx - R])[None, None]
                           - (priors[bs] if priors is not None else 0)) * 8
                    cost = cost + ((lam * mv_rate_bits(mv8)) >> 4)
                better = cost < best_cost
                nxt[bs] = (jnp.where(better, cost, best_cost),
                           jnp.where(better, k, best_k))
            out = nxt
        return out

    state = {bs: (jnp.full((H // bs, W // bs), 2**30, jnp.int32),
                  jnp.zeros((H // bs, W // bs), jnp.int32))
             for bs in (8, 16, 32)}
    state = jax.lax.fori_loop(0, n, body, state)
    return {bs: (jnp.stack([state[bs][1] // n - R, state[bs][1] % n - R],
                           axis=-1), state[bs][0])
            for bs in (8, 16, 32)}


def hme_centers(src, ref, search_reach: int = 12):
    """Hierarchical ME level 0: quarter-res full search -> per-32x32-tile
    full-pel center MVs (ref HmeLevel0, EbMotionEstimation.c:5689).

    src/ref: [H, W] int32, H, W multiples of 32.  Returns centers
    [H/32, W/32, 2] full-pel, clamped to +-search_reach.
    """
    sq = src[::4, ::4]
    rq = ref[::4, ::4]
    Rq = (search_reach + 3) // 4 + 1
    n = 2 * Rq + 1
    Hq, Wq = sq.shape
    rq_pad = jnp.pad(rq, Rq, mode="edge")

    def body(dy, state):
        rows = jax.lax.dynamic_slice(rq_pad, (dy, 0), (Hq, Wq + 2 * Rq))
        best_cost, best_k = state
        for dx in range(n):
            diff = jnp.abs(sq - rows[:, dx : dx + Wq])
            d = diff.reshape(Hq // 8, 8, Wq // 8, 8).sum((1, 3))
            k = dy * n + dx
            better = d < best_cost
            best_cost = jnp.where(better, d, best_cost)
            best_k = jnp.where(better, k, best_k)
        return best_cost, best_k

    init = (jnp.full((Hq // 8, Wq // 8), 2**30, jnp.int32),
            jnp.zeros((Hq // 8, Wq // 8), jnp.int32))
    _, best_k = jax.lax.fori_loop(0, n, body, init)
    mv = jnp.stack([best_k // n - Rq, best_k % n - Rq], axis=-1) * 4
    return jnp.clip(mv, -search_reach, search_reach)


def warp_by_centers(ref_pad, centers, tile: int, pad: int):
    """Tile-gather a center-compensated reference plane (one
    [tile, tile] tile per 32x32 grid cell; ops.gather kernel)."""
    from svt_av1_tpu.ops import gather as G
    th, tw = centers.shape[:2]
    base_r = (jnp.arange(th)[:, None] * tile + pad
              + centers[..., 0]).reshape(-1)
    base_c = (jnp.arange(tw)[None, :] * tile + pad
              + centers[..., 1]).reshape(-1)
    tiles = G.gather_tiles(ref_pad, base_r, base_c, nbh=th, nbw=tw,
                           stride=tile, band_off=0,
                           band_h=2 * pad + tile, th=tile, tw=tile)
    return (tiles.reshape(th, tw, tile, tile)
            .transpose(0, 2, 1, 3).reshape(th * tile, tw * tile))


def sad_lattice_multisize(src, warped, r2: int, bd: int = 8):
    """One +-r2 full-pel sweep on the center-warped reference, returning
    the FULL per-offset SAD lattice {bs: [(2r2+1)^2, H//bs, W//bs]}.

    The two selections the encoder needs (unbiased winners for the MVP
    prior, then rate-biased winners against that prior) are cheap
    reductions over this lattice — computing the image diffs once
    replaces the former double sweep (ref runs its ME once and re-costs
    candidates the same way, EbMotionEstimation.c full-pel loop).

    The offset axis is MAJOR (contiguous block stores).  The sweep
    accumulates only the 8x8 level, in int16 when the bit depth allows
    (|8x8 SAD| <= 64*255 fits; halves the sweep's memory traffic — the
    81-offset diff+blocksum pass is bandwidth-bound); the 16/32 levels
    are 2x2 lattice sums AFTER the loop, batched over all offsets."""
    H, W = src.shape
    n = 2 * r2 + 1
    # 8x8 SAD bound: 64 * ((1<<bd)-1); int16 only when it fits (bd=8)
    dt = jnp.int16 if 64 * ((1 << bd) - 1) <= 32767 else jnp.int32
    s16 = src.astype(dt)
    wpad = jnp.pad(warped, r2, mode="edge").astype(dt)

    def body(dy, lat8):
        rows = jax.lax.dynamic_slice(wpad, (dy, 0), (H, W + 2 * r2))
        for dx in range(n):
            diff = jnp.abs(s16 - rows[:, dx : dx + W])
            d8 = diff.reshape(H // 8, 8, W // 8, 8).sum((1, 3), dtype=dt)
            lat8 = jax.lax.dynamic_update_index_in_dim(
                lat8, d8, dy * n + dx, 0)
        return lat8

    lat8 = jax.lax.fori_loop(
        0, n, body, jnp.zeros((n * n, H // 8, W // 8), dt))
    lat8 = lat8.astype(jnp.int32)
    lat16 = lat8.reshape(n * n, H // 16, 2, W // 16, 2).sum((2, 4))
    lat32 = lat16.reshape(n * n, H // 32, 2, W // 32, 2).sum((2, 4))
    return {8: lat8, 16: lat16, 32: lat32}


def select_from_lattice(lat, centers, tile: int, r2: int,
                        lam=None, priors=None):
    """Pick per-block winners from a sad_lattice_multisize result;
    returns {bs: (mv_fp, cost)} like refined_search_multisize.

    The winner's (dy, dx) is resolved with a one-hot matmul against the
    tiny offset table (MXU-friendly) instead of a per-block gather."""
    n = 2 * r2 + 1
    dyx = jnp.stack([jnp.arange(n * n) // n - r2,
                     jnp.arange(n * n) % n - r2], -1)        # [n*n, 2]
    out = {}
    for bs in (8, 16, 32):
        k = tile // bs
        cen = jnp.repeat(jnp.repeat(centers, k, 0), k, 1)
        cost = lat[bs]                                       # [n*n, h, w]
        if lam is not None:
            mv8 = (cen[None] + dyx[:, None, None, :]
                   - (priors[bs][None]
                      if priors is not None else 0)) * 8
            cost = cost + ((lam * mv_rate_bits(mv8)) >> 4)
        kbest = jnp.argmin(cost, 0)                          # [h, w]
        onehot = (kbest[..., None]
                  == jnp.arange(n * n)[None, None]).astype(jnp.int32)
        out[bs] = (cen + onehot @ dyx, cost.min(0))
    return out


def refined_search_multisize(src, warped, centers, tile: int, r2: int,
                             lam=None, priors=None):
    """+-r2 full-pel sweep on the center-warped reference; returns
    {bs: (mv_fp, cost)} with mv_fp = tile center + delta.

    Near tile seams the sweep reads pixels warped with the neighbor
    tile's center — an encoder-side cost approximation only (the MV
    produced is always applied against the true reference)."""
    H, W = src.shape
    n = 2 * r2 + 1
    wpad = jnp.pad(warped, r2, mode="edge")

    def up_centers(bs):
        k = tile // bs
        return jnp.repeat(jnp.repeat(centers, k, 0), k, 1)

    cen = {bs: up_centers(bs) for bs in (8, 16, 32)}

    def body(dy, state):
        rows = jax.lax.dynamic_slice(wpad, (dy, 0), (H, W + 2 * r2))
        out = {bs: state[bs] for bs in (8, 16, 32)}
        for dx in range(n):
            diff = jnp.abs(src - rows[:, dx : dx + W])
            d8 = diff.reshape(H // 8, 8, W // 8, 8).sum((1, 3))
            d16 = d8.reshape(H // 16, 2, W // 16, 2).sum((1, 3))
            d32 = d16.reshape(H // 32, 2, W // 32, 2).sum((1, 3))
            k = dy * n + dx
            nxt = {}
            for bs, d in ((8, d8), (16, d16), (32, d32)):
                best_cost, best_k = out[bs]
                cost = d
                if lam is not None:
                    delta = jnp.stack([dy - r2, dx - r2])[None, None]
                    mv8 = (cen[bs] + delta
                           - (priors[bs] if priors is not None else 0)) * 8
                    cost = cost + ((lam * mv_rate_bits(mv8)) >> 4)
                better = cost < best_cost
                nxt[bs] = (jnp.where(better, cost, best_cost),
                           jnp.where(better, k, best_k))
            out = nxt
        return out

    state = {bs: (jnp.full((H // bs, W // bs), 2**30, jnp.int32),
                  jnp.zeros((H // bs, W // bs), jnp.int32))
             for bs in (8, 16, 32)}
    state = jax.lax.fori_loop(0, n, body, state)
    return {bs: (cen[bs] + jnp.stack([state[bs][1] // n - r2,
                                      state[bs][1] % n - r2], axis=-1),
                 state[bs][0])
            for bs in (8, 16, 32)}


def median3_mv_field(mv):
    """Component-wise median of (left, up, up-right) neighbor MVs — a
    bulk-parallel approximation of the entropy coder's ref-MV-stack
    predictor (the reference's spatial MVP; EbAdaptiveMotionVector
    Prediction.c scan_row/-col candidates)."""
    left = jnp.roll(mv, 1, axis=1).at[:, 0].set(0)
    up = jnp.roll(mv, 1, axis=0).at[0, :].set(0)
    upr = jnp.roll(jnp.roll(mv, 1, axis=0), -1, axis=1)
    upr = upr.at[0, :].set(0).at[:, -1].set(0)
    return left + up + upr - jnp.minimum(jnp.minimum(left, up), upr) \
        - jnp.maximum(jnp.maximum(left, up), upr)


def gather_blocks(plane_pad, mv, block: int, pad: int):
    """Motion-compensated block gather from a padded plane.

    plane_pad: [H + 2*pad, W + 2*pad]; mv: [nbh, nbw, 2] integer offsets
    (in this plane's pixels).  Returns [nbh, nbw, block, block].
    """
    nbh, nbw = mv.shape[:2]
    base_r = jnp.arange(nbh)[:, None] * block + pad + mv[..., 0]
    base_c = jnp.arange(nbw)[None, :] * block + pad + mv[..., 1]
    rr = base_r[:, :, None, None] + jnp.arange(block)[None, None, :, None]
    cc = base_c[:, :, None, None] + jnp.arange(block)[None, None, None, :]
    return plane_pad[rr, cc]
