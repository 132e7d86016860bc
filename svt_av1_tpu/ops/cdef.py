"""CDEF (constrained directional enhancement filter) — xp-generic.

Exact integer port of the reference kernels restructured for the TPU:
- direction search (cdef_find_dir_c, EbCdef.c:129): the 8 partial-sum
  families become static [bins, 8, 8] masks so every 8x8 block of the
  frame is classified in one tensordot.
- filter (cdef_filter_block_c, EbCdef.c:204 + constrain :101): the
  per-pixel taps become whole-plane gathers with direction-indexed
  offset tables; all 8x8 (4x4 chroma) units filter in one pass reading
  only PRE-CDEF pixels (CDEF never feeds CDEF, so it is embarrassingly
  parallel).
- out-of-frame samples are CDEF_VERY_LARGE, which self-masks in
  constrain() and is excluded from the min/max clamp, exactly like the
  reference's bordered intermediate buffer.

coeff_shift = bd-8 parameterizes the high-bitdepth path\n(strength scaling, damping adjust, shifted direction search).
"""

from __future__ import annotations

import functools

import numpy as np

VERY_LARGE = 30000
PRI_TAPS = ((4, 2), (3, 3))   # indexed by pri_strength & 1
SEC_TAPS = (2, 1)
# (dy, dx) per direction, k = 0 (near) / 1 (far); ref cdef_directions
DIRS = np.array([
    [[-1, 1], [-2, 2]],
    [[0, 1], [-1, 2]],
    [[0, 1], [0, 2]],
    [[0, 1], [1, 2]],
    [[1, 1], [2, 2]],
    [[1, 0], [2, 1]],
    [[1, 0], [2, 0]],
    [[1, 0], [2, -1]],
], np.int32)

# int32 throughout: the div_table normalization keeps every cost term
# under 2^31 for 8-bit input (same contract as the C reference)
_DIV_TABLE = np.array([0, 840, 420, 280, 210, 168, 140, 120, 105], np.int32)


@functools.lru_cache(maxsize=1)
def _partial_masks():
    """[8 families][15 bins][8][8] 0/1 masks for the partial sums."""
    m = np.zeros((8, 15, 8, 8), np.int32)
    for i in range(8):
        for j in range(8):
            m[0, i + j, i, j] = 1
            m[1, i + j // 2, i, j] = 1
            m[2, i, i, j] = 1
            m[3, 3 + i - j // 2, i, j] = 1
            m[4, 7 + i - j, i, j] = 1
            m[5, 3 - i // 2 + j, i, j] = 1
            m[6, j, i, j] = 1
            m[7, i // 2 + j, i, j] = 1
    return m


def find_dir_grid(xp, luma, coeff_shift: int = 0):
    """Per-8x8-block (direction, variance) over a whole plane.

    luma: [H, W] int32 (H, W multiples of 8).  Returns (dir [h8, w8],
    var [h8, w8]) int32 — exact cdef_find_dir_c semantics
    (x = (img >> coeff_shift) - 128, EbCdef.c:146).
    """
    H, W = luma.shape
    h8, w8 = H // 8, W // 8
    x = ((luma.reshape(h8, 8, w8, 8).transpose(0, 2, 1, 3)
          .reshape(h8, w8, 64).astype(xp.int32) >> coeff_shift) - 128)
    masks = xp.asarray(_partial_masks().reshape(8, 15, 64))
    # partial[f, b] = sum over pixels of x * mask
    p = xp.einsum("hwp,fbp->hwfb", x, masks)     # [h8, w8, 8, 15]

    div = xp.asarray(_DIV_TABLE)
    cost = [None] * 8
    for d in (2, 6):
        cost[d] = (p[..., d, :8] ** 2).sum(-1) * div[8]
    for d in (0, 4):
        c = xp.zeros_like(cost[2])
        for i in range(7):
            c = c + (p[..., d, i] ** 2 + p[..., d, 14 - i] ** 2) * div[i + 1]
        cost[d] = c + p[..., d, 7] ** 2 * div[8]
    for d in (1, 3, 5, 7):
        c = (p[..., d, 3:8] ** 2).sum(-1) * div[8]
        for j in range(3):
            c = c + (p[..., d, j] ** 2 + p[..., d, 10 - j] ** 2) * div[2 * j + 2]
        cost[d] = c
    costs = xp.stack(cost, axis=-1)              # [h8, w8, 8]
    # best_dir: first maximum with cost > 0 (C scans in order with >)
    best = xp.zeros(costs.shape[:2], xp.int32)
    best_cost = xp.zeros(costs.shape[:2], costs.dtype)
    for d in range(8):
        better = costs[..., d] > best_cost
        best = xp.where(better, d, best)
        best_cost = xp.where(better, costs[..., d], best_cost)
    opp = xp.take_along_axis(costs, ((best + 4) & 7)[..., None],
                             axis=-1)[..., 0]
    var = ((best_cost - opp) >> 10).astype(xp.int32)
    return best.astype(xp.int32), var


def _msb6(v):
    """floor(log2(v)) for 1 <= v <= 63 as a compare chain (gather-free;
    TPU-friendly); returns 0 for v == 0 (masked out by callers)."""
    return ((v > 1).astype(v.dtype) + (v > 3) + (v > 7) + (v > 15)
            + (v > 31))


def _constrain(xp, diff, threshold, damping):
    """ref constrain(): threshold/damping may be per-pixel arrays."""
    shift = xp.maximum(0, damping - _msb6(threshold))
    mag = xp.minimum(xp.abs(diff),
                     xp.maximum(0, threshold - (xp.abs(diff) >> shift)))
    return xp.sign(diff) * mag * (threshold > 0)


def adjust_strength(xp, strength, var):
    """ref adjust_strength: luma primary strength scaled by direction
    variance."""
    v6 = xp.minimum(var >> 6, 63)
    i = xp.minimum(_msb6(v6), 12)
    i = xp.where(v6 > 0, i, 0)
    return xp.where(var > 0, (strength * (4 + i) + 8) >> 4, 0)


def filter_plane(xp, plane, dir_units, pri, sec, damping, bs: int,
                 coeff_shift: int = 0):
    """Apply CDEF to a whole plane.

    plane:     [H, W] int32 pre-CDEF pixels
    dir_units: [H/bs, W/bs] direction per filter unit (already 0 where
               the primary strength is 0 — ref `t ? dir : 0`)
    pri, sec:  [H/bs, W/bs] strengths per unit (0 = unfiltered; luma
               pri must already be var-adjusted)
    damping:   scalar (already plane-adjusted: luma d, chroma d-1)
    bs:        8 (luma) or 4 (chroma 4:2:0)
    """
    H, W = plane.shape
    pad = xp.full((H + 4, W + 4), VERY_LARGE, xp.int32)
    if xp is np:
        pad[2:-2, 2:-2] = plane
    else:
        pad = pad.at[2:-2, 2:-2].set(plane)

    up = lambda a: xp.repeat(xp.repeat(a, bs, 0), bs, 1)
    dir_px = up(dir_units)                       # [H, W]
    pri_px = up(pri)
    sec_px = up(sec)
    # tap parity from the UNSCALED strength (ref EbCdef.c:212)
    tap_sel = ((pri_px >> coeff_shift) & 1).astype(xp.int32)

    x0 = plane
    vmax = x0
    vmin = x0
    total = xp.zeros((H, W), xp.int32)

    if xp is np:
        yy = np.arange(H)[:, None] + 2
        xx = np.arange(W)[None, :] + 2

        def taps_for(dsel, k):
            dy = DIRS[dsel, k, 0]
            dx = DIRS[dsel, k, 1]
            return pad[yy + dy, xx + dx], pad[yy - dy, xx - dx]
    else:
        # TPU: per-pixel gathers are slow; precompute the 8 statically
        # shifted planes per (k, sign) and select by direction index —
        # numerically identical to the gather formulation.
        shifted = {}
        for d in range(8):
            for k in range(2):
                for sgn in (1, -1):
                    dy = int(DIRS[d, k, 0]) * sgn
                    dx = int(DIRS[d, k, 1]) * sgn
                    shifted[(d, k, sgn)] = pad[2 + dy : 2 + dy + H,
                                               2 + dx : 2 + dx + W]

        def taps_for(dsel, k):
            a = shifted[(0, k, 1)]
            b = shifted[(0, k, -1)]
            for d in range(1, 8):
                m = dsel == d
                a = xp.where(m, shifted[(d, k, 1)], a)
                b = xp.where(m, shifted[(d, k, -1)], b)
            return a, b

    for k in range(2):
        p0, p1 = taps_for(dir_px, k)
        # select, NOT a per-pixel table gather (see _filter_from_taps)
        t = xp.where(tap_sel == 1, PRI_TAPS[1][k], PRI_TAPS[0][k])
        total = total + t * _constrain(xp, p0 - x0, pri_px, damping)
        total = total + t * _constrain(xp, p1 - x0, pri_px, damping)
        for s in (p0, p1):
            valid = s != VERY_LARGE
            vmax = xp.where(valid, xp.maximum(vmax, s), vmax)
            vmin = xp.minimum(vmin, s)
        for rot in (2, 6):
            s0, s1 = taps_for((dir_px + rot) & 7, k)
            st = SEC_TAPS[k]
            total = total + st * _constrain(xp, s0 - x0, sec_px, damping)
            total = total + st * _constrain(xp, s1 - x0, sec_px, damping)
            for s in (s0, s1):
                valid = s != VERY_LARGE
                vmax = xp.where(valid, xp.maximum(vmax, s), vmax)
                vmin = xp.minimum(vmin, s)

    out = x0 + ((8 + total - (total < 0)) >> 4)
    out = xp.clip(out, vmin, vmax)
    active = (pri_px > 0) | (sec_px > 0)
    return xp.where(active, out, plane)


def _extract_taps(xp, plane, dir_px):
    """Shared tap extraction for one plane: the direction-indexed
    shifted planes (the expensive 8-way select chains) depend only on
    the DIRECTION field, not the strengths, so the encoder search
    evaluates many strength candidates off one extraction.

    Returns (x0, taps) where taps[k] = (p0, p1, s0a, s0b, s1a, s1b):
    primary pair + the two secondary rotations' pairs at distance k.
    """
    H, W = plane.shape
    pad = xp.full((H + 4, W + 4), VERY_LARGE, xp.int32)
    pad = pad.at[2:-2, 2:-2].set(plane)
    shifted = {}
    for d in range(8):
        for k in range(2):
            for sgn in (1, -1):
                dy = int(DIRS[d, k, 0]) * sgn
                dx = int(DIRS[d, k, 1]) * sgn
                shifted[(d, k, sgn)] = pad[2 + dy : 2 + dy + H,
                                           2 + dx : 2 + dx + W]

    def taps_for(dsel, k):
        a = shifted[(0, k, 1)]
        b = shifted[(0, k, -1)]
        for d in range(1, 8):
            m = dsel == d
            a = xp.where(m, shifted[(d, k, 1)], a)
            b = xp.where(m, shifted[(d, k, -1)], b)
        return a, b

    taps = []
    vmax = plane
    vmin = plane
    for k in range(2):
        p0, p1 = taps_for(dir_px, k)
        s0a, s0b = taps_for((dir_px + 2) & 7, k)
        s1a, s1b = taps_for((dir_px + 6) & 7, k)
        taps.append((p0, p1, s0a, s0b, s1a, s1b))
        for s in (p0, p1, s0a, s0b, s1a, s1b):
            valid = s != VERY_LARGE
            vmax = xp.where(valid, xp.maximum(vmax, s), vmax)
            vmin = xp.minimum(vmin, s)
    return plane, taps, vmin, vmax


def _filter_from_taps(xp, x0, taps, vmin, vmax, pri_px, sec_px, tap_sel,
                      damping, plane):
    """Apply one (pri, sec) strength candidate on pre-extracted taps
    (numerics identical to filter_plane)."""
    total = xp.zeros_like(x0)
    for k in range(2):
        p0, p1, s0a, s0b, s1a, s1b = taps[k]
        # per-pixel 2-entry table GATHERS are pathologically slow on
        # TPU (~46 ms/pass at 1080p measured); a select is free
        t = xp.where(tap_sel == 1, PRI_TAPS[1][k], PRI_TAPS[0][k])
        total = total + t * _constrain(xp, p0 - x0, pri_px, damping)
        total = total + t * _constrain(xp, p1 - x0, pri_px, damping)
        st = SEC_TAPS[k]
        for s in (s0a, s0b, s1a, s1b):
            total = total + st * _constrain(xp, s - x0, sec_px, damping)
    out = x0 + ((8 + total - (total < 0)) >> 4)
    out = xp.clip(out, vmin, vmax)
    active = (pri_px > 0) | (sec_px > 0)
    return xp.where(active, out, plane)


def pick_damping(qindex: int) -> int:
    """Encoder damping choice (3..6), scaling with q like libaom's
    pickcdef default."""
    return 3 + (qindex >> 6)


# ---------------------------------------------------------------------------
# Frame-level apply + encoder search (shared: device jax / decoder numpy)
# ---------------------------------------------------------------------------

# fixed frame strength lists (signaled in the frame header; cdef_bits=2).
# Index 0 must be (0,0) so all-flat superblocks can opt out cheaply.
Y_STRENGTHS = ((0, 0), (3, 1), (7, 2), (12, 2))
UV_STRENGTHS = ((0, 0), (2, 1), (4, 1), (6, 2))
CDEF_BITS = 2


def _unit_strengths(xp, idx_sb, skip_units, strengths, h_units, w_units,
                    units_per_sb: int, coeff_shift: int = 0):
    """Per-unit (pri, sec) from the per-64x64 strength index (scaled
    << coeff_shift for high bit depth; ref EbCdef.c:284-285)."""
    pri_tab = [s[0] << coeff_shift for s in strengths]
    sec_raw = [s[1] for s in strengths]
    sec_tab = [(s + (s == 3)) << coeff_shift for s in sec_raw]
    up = lambda a: xp.repeat(xp.repeat(a, units_per_sb, 0), units_per_sb, 1)
    idx_u = up(idx_sb)[:h_units, :w_units]
    # select chains over the (tiny, static) strength lists — per-element
    # table gathers are slow on TPU
    pri = xp.full_like(idx_u, pri_tab[0])
    sec = xp.full_like(idx_u, sec_tab[0])
    for i in range(1, len(strengths)):
        pri = xp.where(idx_u == i, pri_tab[i], pri)
        sec = xp.where(idx_u == i, sec_tab[i], sec)
    pri = xp.where(skip_units, 0, pri)
    sec = xp.where(skip_units, 0, sec)
    return pri, sec


def cdef_frame(xp, planes, skip8, idx_sb, damping: int,
               y_strengths=Y_STRENGTHS, uv_strengths=UV_STRENGTHS,
               dir_var=None, coeff_shift: int = 0):
    """Apply CDEF to (y, u, v) post-deblock planes.

    planes: y [H, W], u, v [H/2, W/2] int32 (H, W multiples of 8)
    skip8:  [H/8, W/8] bool — unit skipped (all mi coded skip)
    idx_sb: [ceil(H/64), ceil(W/64)] int32 strength index per 64x64
    dir_var: optional precomputed find_dir_grid(y) (the search path
             shares one direction pass across all candidates)
    Returns (y, u, v) filtered planes.
    """
    y, u, v = planes
    H, W = y.shape
    h8, w8 = H // 8, W // 8
    cs = coeff_shift
    dirs, var = dir_var if dir_var is not None else find_dir_grid(xp, y, cs)

    pri_y, sec_y = _unit_strengths(xp, idx_sb, skip8, y_strengths,
                                   h8, w8, 8, cs)
    pri_y = adjust_strength(xp, pri_y, var)
    dir_y = xp.where(pri_y > 0, dirs, 0)
    out_y = filter_plane(xp, y, dir_y, pri_y, sec_y, damping + cs, 8, cs)

    pri_c, sec_c = _unit_strengths(xp, idx_sb, skip8, uv_strengths,
                                   h8, w8, 8, cs)
    dir_c = xp.where(pri_c > 0, dirs, 0)
    out_u = filter_plane(xp, u, dir_c, pri_c, sec_c, damping + cs - 1, 4,
                         cs)
    out_v = filter_plane(xp, v, dir_c, pri_c, sec_c, damping + cs - 1, 4,
                         cs)
    return out_y, out_u, out_v


def cdef_search_and_apply(xp, planes, srcs, skip8, damping: int,
                          coeff_shift: int = 0):
    """Encoder: try every frame-list strength per 64x64, pick by SSE
    against the source, return (filtered planes, idx_sb).

    The reference searches per-segment then solves a strength-subset
    selection (cdef_seg_search + finish_cdef_search); with a fixed
    signaled list the search reduces to one argmin over 4 candidate
    filtered frames — 4 dense passes, no control flow."""
    y, u, v = planes
    H, W = y.shape
    nsb_h, nsb_w = -(-H // 64), -(-W // 64)

    def sb_sse(a, b, scale):
        d = (a - b) ** 2
        hh, ww = d.shape
        sb = 64 // scale
        ph_, pw_ = nsb_h * sb, nsb_w * sb
        if (ph_, pw_) != (hh, ww):
            d = xp.pad(d, ((0, ph_ - hh), (0, pw_ - ww)))
        return d.reshape(nsb_h, sb, nsb_w, sb).sum((1, 3))

    # luma-only candidate filtering (index 0 is the identity); chroma is
    # filtered once afterwards with the chosen per-SB indices — ~2.5x
    # less filter work than filtering all planes per candidate.  The
    # direction field is identical for every nonzero-strength candidate
    # (pri > 0 iff var > 0 and not skipped), so the expensive
    # direction-indexed tap selection runs ONCE and each candidate only
    # re-runs the cheap constrain/accumulate stage (_filter_from_taps).
    cs = coeff_shift
    dirs, var = find_dir_grid(xp, y, cs)
    h8, w8 = H // 8, W // 8
    up = lambda a: xp.repeat(xp.repeat(a, 8, 0), 8, 1)
    pris, secs = [], []
    for i in range(1, len(Y_STRENGTHS)):
        idx = xp.full((nsb_h, nsb_w), i, xp.int32)
        pri, sec = _unit_strengths(xp, idx, skip8, Y_STRENGTHS, h8, w8, 8,
                                   cs)
        pris.append(adjust_strength(xp, pri, var))
        secs.append(sec)
    dir_px = up(xp.where(pris[0] > 0, dirs, 0))
    x0, taps, vmin, vmax = _extract_taps(xp, y, dir_px)
    lumas = [y]
    costs = [sb_sse(y, srcs[0], 1)]
    for pri, sec in zip(pris, secs):
        pri_px, sec_px = up(pri), up(sec)
        tap_sel = ((pri_px >> cs) & 1).astype(xp.int32)
        fy = _filter_from_taps(xp, x0, taps, vmin, vmax, pri_px, sec_px,
                               tap_sel, damping + cs, y)
        lumas.append(fy)
        costs.append(sb_sse(fy, srcs[0], 1))
    cost = xp.stack(costs, axis=-1)          # [nsb_h, nsb_w, 4]
    idx_sb = xp.argmin(cost, axis=-1).astype(xp.int32)

    m = xp.repeat(xp.repeat(idx_sb, 64, 0), 64, 1)[:H, :W]
    out_y = lumas[0]
    for i in range(1, len(lumas)):
        out_y = xp.where(m == i, lumas[i], out_y)

    pri_c, sec_c = _unit_strengths(xp, idx_sb, skip8, UV_STRENGTHS,
                                   h8, w8, 8, cs)
    dir_c = xp.where(pri_c > 0, dirs, 0)
    out_u = filter_plane(xp, u, dir_c, pri_c, sec_c, damping + cs - 1, 4,
                         cs)
    out_v = filter_plane(xp, v, dir_c, pri_c, sec_c, damping + cs - 1, 4,
                         cs)
    return (out_y, out_u, out_v), idx_sb
