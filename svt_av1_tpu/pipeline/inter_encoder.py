"""Device-side P-frame encoder: batched ME + MC + transform coding with
variable partitions.

Unlike intra (wavefront-ordered), inter prediction has NO intra-frame
dependency: every block predicts from the previous reconstructed frame.
The whole P-frame therefore encodes as ONE bulk-parallel device program —
the TPU-native answer to the reference's EncDec wavefront + ME segment
pools (EbEncDecProcess.c:1448, EbMotionEstimationProcess.c:374).

Partitioning (the reference's MD partition RDO, EbProductCodingLoop.c
mode_decision_sb) is restructured TPU-first: motion search and residual
coding run for EVERY block of EVERY size (8/16/32) as dense batched
passes, then a bottom-up merge pass picks the quadtree by rate-biased
cost — no per-block control flow; the host entropy stage walks the
resulting size map.  Nodes that cross the frame edge are forced to
split to 8x8 (static masks), so the partition tree never needs the
edge-forced rectangular forms.

Motion is quarter-pel (AV1 low-precision MVs): exhaustive full-pel SAD
search per size, then half- and quarter-pel refinement against subpel-
phase plane banks (ops.mc.phase_bank) — whole-plane 8-tap convs once
per frame, then per-block gathers.  Chroma (1/8-pel positions under
quarter-pel luma MVs) uses an eighth-pel bank.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from svt_av1_tpu.ops import cdef as CD
from svt_av1_tpu.ops import deblock as DB
from svt_av1_tpu.ops import mc as MC
from svt_av1_tpu.ops import me as ME
from svt_av1_tpu.ops import quant as Q
from svt_av1_tpu.ops import transforms as T

SEARCH_RANGE = 16   # full-pel luma search window (+-R)
PAD = SEARCH_RANGE + 1  # +1: subpel refinement can cross one more pel
SIZES = (8, 16, 32)     # luma leaf sizes (64 always splits)
TX_OF = {8: T.TX_8X8, 16: T.TX_16X16, 32: T.TX_32X32}
TX_OF_C = {8: T.TX_4X4, 16: T.TX_8X8, 32: T.TX_16X16}
# per-leaf overhead bits beyond residual+mv (mode/ref/skip + amortized
# partition symbol) used in the merge decision
LEAF_OVERHEAD_BITS = 6
SPLIT_EXTRA_BITS = 4


def _block(plane, bs: int):
    h, w = plane.shape
    return plane.reshape(h // bs, bs, w // bs, bs).transpose(0, 2, 1, 3)


def _unblock(blocks):
    nbh, nbw, bs, _ = blocks.shape
    return blocks.transpose(0, 2, 1, 3).reshape(nbh * bs, nbw * bs)


def _encode_plane(src_blocks, pred_blocks, qindex: int, tx_size: int,
                  bd: int = 8):
    nbh, nbw, bs, _ = src_blocks.shape
    resid = (src_blocks - pred_blocks).reshape(-1, bs, bs)
    coeff = T.fwd_txfm2d_batch_exact(resid, tx_size, T.DCT_DCT, bd)
    levels = Q.quantize_batch(coeff, qindex, tx_size, bd)
    dq = Q.dequantize_batch(levels, qindex, tx_size, bd)
    rec = T.inv_txfm2d_batch(dq, tx_size, T.DCT_DCT, bd)
    recon = jnp.clip(pred_blocks + rec.reshape(nbh, nbw, bs, bs), 0,
                     (1 << bd) - 1)
    return levels.reshape(nbh, nbw, bs, bs), recon


def _gather_bank(bank, py_idx, px_idx, off_r, off_c, bs: int, pad: int):
    """Per-block gather from a phase bank [n,n,H+2p,W+2p].

    The phase axes fold into the row index of a 2-D view so each block
    is ONE [bs,bs] dynamic-slice (vmapped) — tile-granular 2-D gathers;
    per-pixel index arrays or 4-D slices are pathologically slow on
    TPU."""
    n = bank.shape[0]
    hp = bank.shape[2]
    flat = bank.reshape(n * n * hp, bank.shape[3])
    nbh, nbw = off_r.shape
    base_r = (jnp.arange(nbh)[:, None] * bs + pad + off_r
              + (py_idx * n + px_idx) * hp).reshape(-1)
    base_c = (jnp.arange(nbw)[None, :] * bs + pad + off_c).reshape(-1)

    def one(r, c):
        return jax.lax.dynamic_slice(flat, (r, c), (bs, bs))

    out = jax.vmap(one)(base_r, base_c)
    return out.reshape(nbh, nbw, bs, bs)


def _mc_luma(bank, mv8, bs: int, pad: int):
    """Quarter-pel luma MC from the 4x4 phase bank; mv8 in 1/8 pel (even)."""
    frac16_r = (mv8[..., 0] * 2) & 15
    frac16_c = (mv8[..., 1] * 2) & 15
    return _gather_bank(bank, frac16_r >> 2, frac16_c >> 2,
                        mv8[..., 0] >> 3, mv8[..., 1] >> 3, bs, pad)


def _mc_chroma(bank, mv8, bs: int, pad: int):
    """Eighth-pel chroma MC; chroma 1/16-pel frac == mv8 & 15 (4:2:0)."""
    frac_r = mv8[..., 0] & 15
    frac_c = mv8[..., 1] & 15
    return _gather_bank(bank, frac_r >> 1, frac_c >> 1,
                        mv8[..., 0] >> 4, mv8[..., 1] >> 4, bs, pad)


def _subpel_refine(src_blocks, bank, mv8, cost, bs: int, pad: int, lam: int,
                   prior8):
    """Half- then quarter-pel 8-neighbor refinement (ref
    HalfPelSearch_LCU / QuarterPelSearch_LCU, batched over all blocks);
    same rate-biased cost as the full-pel stage."""
    for step in (4, 2):
        base = mv8  # neighbors of the step-start best (bounds total drift)
        for dy in (-step, 0, step):
            for dx in (-step, 0, step):
                if dy == 0 and dx == 0:
                    continue
                cand = base + jnp.array([dy, dx], jnp.int32)
                pred = _mc_luma(bank, cand, bs, pad)
                s = (jnp.abs(src_blocks - pred).sum((-1, -2))
                     + ((lam * ME.mv_rate_bits(cand - prior8)) >> 4))
                better = s < cost
                cost = jnp.where(better, s, cost)
                mv8 = jnp.where(better[..., None], cand, mv8)
    return mv8, cost


def _jnt_pred_grid(plane_pad, mv8, bs: int, pad: int, chroma: bool,
                   bd: int = 8):
    """Batched compound-domain (CONV_BUF) prediction: one bs x bs block
    per grid cell from the full-pel padded plane, per-block subpel
    kernels selected arithmetically (no per-block control flow).
    Mirrors ops.mc.jnt_block / jnt_pred_np exactly."""
    from svt_av1_tpu import tables as _tbl
    table = jnp.asarray(_tbl.spec_tables()["subpel_filters_regular"],
                        jnp.int32)                       # [16][8]
    gh, gw = mv8.shape[:2]
    if chroma:
        f = mv8 >> 4
        ph = mv8 & 15
    else:
        f = mv8 >> 3
        ph = (mv8 * 2) & 15
    win = bs + 7
    r0 = (jnp.arange(gh)[:, None] * bs + f[..., 0] + pad).reshape(-1)
    c0 = (jnp.arange(gw)[None, :] * bs + f[..., 1] + pad).reshape(-1)

    def slc(r, c):
        return jax.lax.dynamic_slice(plane_pad, (r, c), (win, win))

    patches = jax.vmap(slc)(r0, c0).reshape(gh, gw, win, win)
    onehot = lambda p: (p[..., None] == jnp.arange(16)).astype(jnp.int32)
    kx = jnp.einsum("ghp,pk->ghk", onehot(ph[..., 1]), table)
    ky = jnp.einsum("ghp,pk->ghk", onehot(ph[..., 0]), table)
    im = None
    for k in range(8):
        term = kx[..., k, None, None] * patches[..., :, k : k + bs]
        im = term if im is None else im + term
    im = (im + (1 << (bd + 6)) + 4) >> 3                 # round_0 = 3
    res = None
    for k in range(8):
        term = ky[..., k, None, None] * im[..., k : k + bs, :]
        res = term if res is None else res + term
    offset_bits = bd + 11                                # bd + 2*7 - 3
    return (res + (1 << offset_bits) + 64) >> 7          # round_1 = 7


COMP_EXTRA_BITS = 8  # comp_inter + ref pair + compound mode signaling


def _sum4(a):
    """[2H, 2W] -> [H, W] 2x2 block sum."""
    return a.reshape(a.shape[0] // 2, 2, a.shape[1] // 2, 2).sum((1, 3))


def _tiles8(x, t: int):
    """[gh, gw, bs, bs] block grid -> [gh*bs/t, gw*bs/t, t, t] tile grid
    (pure reshuffle; host inverts it with numpy)."""
    gh, gw, bs, _ = x.shape
    k = bs // t
    return (x.reshape(gh, gw, k, t, k, t).transpose(0, 2, 1, 4, 3, 5)
            .reshape(gh * k, gw * k, t, t))


def p_frame_step(ph: int, pw: int, qindex=None, search: int = SEARCH_RANGE,
                 nrefs: int = 1, compound: bool = False, bd: int = 8):
    """Build the (unjitted) P/B-frame encode step.

    Geometry: ph, pw are the *32-padded* plane dims (multiples of 32).
    fn(src_y [ph,pw], src_u, src_v [ph/2,pw/2],
       ref0_y, ref0_u, ref0_v [, ref1_y, ref1_u, ref1_v when nrefs=2]
       [, qindex, lf_y, lf_u, lf_v — when built with qindex=None, rate
       control varies q per frame without recompiling])
    -> (sizes [nb8h,nb8w] u8 (8/16/32 leaf size covering each 8x8 cell),
        mv8   [nb8h,nb8w,2] i16 (selected leaf MV, replicated per cell),
        levels y/u/v at each size (9 arrays, i16),
        recon_y [ph,pw] u8, recon_u, recon_v, cdef idx
        [, ref8 [nb8h,nb8w] u8 (0 = ref0/fwd, 1 = ref1/bwd) when nrefs=2])

    With nrefs=2 the full ME pipeline runs against both references and
    every leaf size picks the cheaper one per block (the TPU analog of
    the reference's per-ref ME loop in EbMotionEstimation.c; the per-ref
    results stay batched device arrays instead of per-PU loops).
    """
    pad = search + 1
    from svt_av1_tpu import tables as _tbl
    dynamic_q = qindex is None

    nb8h, nb8w = ph // 8, pw // 8

    def step(sy, su, sv, *rest):
        refs = rest[: 3 * nrefs]
        dyn = rest[3 * nrefs:]
        ph_mi, pw_mi = mi_extent[0], mi_extent[1]
        use_cdef = use_cdef_cell[0]
        if dynamic_q:
            q = dyn[0]
            lf_levels = (dyn[1], dyn[1], dyn[2], dyn[3])
            ac = jnp.asarray(_tbl.spec_tables()[f"ac_qlookup_{bd}"])[q]
            lam = jnp.maximum(8, ac // 4).astype(jnp.int32)
        else:
            q = qindex
            lf_levels = lf_levels_cell[0]
            # SAD-domain lambda from the quantizer step (the reference
            # scales its fast-loop lambda with qstep; EbLambdaRateTables.h)
            lam = max(8, _tbl.ac_q(qindex, bd) // 4)
        sy = sy.astype(jnp.int32)
        su = su.astype(jnp.int32)
        sv = sv.astype(jnp.int32)
        cpad = pad // 2 + 1
        banks = []
        padded = []   # full-pel padded planes (compound jnt path)
        for i in range(nrefs):
            py_ = MC.pad_for_filter(jnp, refs[3 * i].astype(jnp.int32), pad)
            pu_ = MC.pad_for_filter(jnp, refs[3 * i + 1].astype(jnp.int32),
                                    cpad)
            pv_ = MC.pad_for_filter(jnp, refs[3 * i + 2].astype(jnp.int32),
                                    cpad)
            padded.append((py_, pu_, pv_))
            banks.append((MC.phase_bank(jnp, py_, 4, bd),
                          MC.phase_bank(jnp, pu_, 2, bd),
                          MC.phase_bank(jnp, pv_, 2, bd)))

        def me_one_ref(ry_i, bank_y_i):
            # hierarchical full-pel ME: quarter-res center search, then a
            # +-4 multi-size sweep on a center-warped reference (10x fewer
            # offsets than exhaustive; ref HME levels 0-2)
            r2 = 4
            ref_pad = jnp.pad(ry_i, search, mode="edge")
            centers = ME.hme_centers(sy, ry_i, search_reach=search - r2)
            warped = ME.warp_by_centers(ref_pad, centers, 32, search)
            p1 = ME.refined_search_multisize(sy, warped, centers, 32, r2)
            priors = {bs: ME.median3_mv_field(p1[bs][0]) for bs in SIZES}
            p2 = ME.refined_search_multisize(sy, warped, centers, 32, r2,
                                             lam, priors)
            mv_i, cost_i = {}, {}
            for bs in SIZES:
                # re-score the winner against the TRUE reference (the
                # warped sweep cost is approximate near tile seams)
                pred0 = _mc_luma(bank_y_i, p2[bs][0] * 8, bs, pad)
                true_cost = (jnp.abs(_block(sy, bs) - pred0).sum((-1, -2))
                             + ((lam * ME.mv_rate_bits(
                                 (p2[bs][0] - priors[bs]) * 8)) >> 4))
                mv_i[bs], cost_i[bs] = _subpel_refine(
                    _block(sy, bs), bank_y_i, p2[bs][0] * 8, true_cost, bs,
                    pad, lam, priors[bs] * 8)
            return mv_i, cost_i, priors

        per_ref = [me_one_ref(refs[3 * i].astype(jnp.int32), banks[i][0])
                   for i in range(nrefs)]
        mv, cost = per_ref[0][:2]
        refsel = {bs: None for bs in SIZES}
        mv_c = {bs: None for bs in SIZES}   # compound second (bwd) MV
        if nrefs == 2:
            mv1, cost1 = per_ref[1][:2]
            mv, cost = dict(mv), dict(cost)
            for bs in SIZES:
                sel = (cost1[bs] < cost[bs]).astype(jnp.uint8)
                mv_sel_single = jnp.where(sel[..., None].astype(bool),
                                          mv1[bs], mv[bs])
                cost_single = jnp.minimum(cost1[bs], cost[bs])
                if compound:
                    # COMPOUND_AVERAGE candidate from the per-ref best
                    # MVs (ref per-ref ME + BI candidate injection)
                    mid0 = _jnt_pred_grid(padded[0][0], mv[bs], bs, pad,
                                          False, bd)
                    mid1 = _jnt_pred_grid(padded[1][0], mv1[bs], bs, pad,
                                          False, bd)
                    pred_c = MC.jnt_average(jnp, mid0, mid1, bd)
                    rate = (ME.mv_rate_bits(mv[bs] - per_ref[0][2][bs] * 8)
                            + ME.mv_rate_bits(mv1[bs]
                                              - per_ref[1][2][bs] * 8)
                            + COMP_EXTRA_BITS)
                    cost_c = (jnp.abs(_block(sy, bs) - pred_c).sum((-1, -2))
                              + ((lam * rate) >> 4))
                    use_c = cost_c < cost_single
                    refsel[bs] = jnp.where(use_c, 2, sel).astype(jnp.uint8)
                    mv[bs] = jnp.where(use_c[..., None], mv[bs],
                                       mv_sel_single)
                    mv_c[bs] = mv1[bs]
                    cost[bs] = jnp.minimum(cost_c, cost_single)
                else:
                    refsel[bs] = sel
                    mv[bs] = mv_sel_single
                    cost[bs] = cost_single

        # --- bottom-up merge decisions (rate-biased; static edge masks) ---
        oh = (lam * LEAF_OVERHEAD_BITS) >> 4
        split_oh = (lam * SPLIT_EXTRA_BITS) >> 4
        j8 = cost[8] + oh
        # 16-level
        j_split16 = _sum4(j8) + split_oh
        j16 = cost[16] + oh
        use16 = j16 <= j_split16
        j_at16 = jnp.where(use16, j16, j_split16)
        # 32-level
        j_split32 = _sum4(j_at16) + split_oh
        j32 = cost[32] + oh
        use32 = j32 <= j_split32

        # edge legality: a merged node must lie fully inside the mi grid;
        # ph/pw are 32-padded so only the true frame geometry (baked in by
        # the caller via masks) matters — caller passes it via closure.
        use16 = use16 & jnp.asarray(inside16)
        use32 = use32 & jnp.asarray(inside32)

        # per-8x8-cell size map
        up2 = lambda a: jnp.repeat(jnp.repeat(a, 2, 0), 2, 1)
        size8 = jnp.where(up2(up2(use32)), 32,
                          jnp.where(up2(use16), 16, 8)).astype(jnp.uint8)

        # selected-MV field at 8x8 granularity
        mv_sel = jnp.where(up2(up2(use32))[..., None], up2(up2(mv[32])),
                           jnp.where(up2(use16)[..., None], up2(mv[16]),
                                     mv[8])).astype(jnp.int16)

        # selected-ref/mode field (0 = ref0/fwd, 1 = ref1/bwd,
        # 2 = compound average) + second MV for compound leaves
        ref8 = None
        mv2_sel = None
        if nrefs == 2:
            ref8 = jnp.where(up2(up2(use32)), up2(up2(refsel[32])),
                             jnp.where(up2(use16), up2(refsel[16]),
                                       refsel[8])).astype(jnp.uint8)
            if compound:
                mv2_sel = jnp.where(
                    up2(up2(use32))[..., None], up2(up2(mv_c[32])),
                    jnp.where(up2(use16)[..., None], up2(mv_c[16]),
                              mv_c[8])).astype(jnp.int16)

        # --- residual coding at every size, all three planes -------------
        def mc_sel(mc_fn, plane_idx, bs2, mvs2, mvs_c, sel, pad2,
                   chroma):
            p0 = mc_fn(banks[0][plane_idx], mvs2, bs2, pad2)
            if nrefs == 1:
                return p0
            p1 = mc_fn(banks[1][plane_idx], mvs2, bs2, pad2)
            out = jnp.where((sel == 1)[..., None, None], p1, p0)
            if compound:
                m0 = _jnt_pred_grid(padded[0][plane_idx], mvs2, bs2, pad2,
                                    chroma, bd)
                m1 = _jnt_pred_grid(padded[1][plane_idx], mvs_c, bs2,
                                    pad2, chroma, bd)
                pc = MC.jnt_average(jnp, m0, m1, bd)
                out = jnp.where((sel == 2)[..., None, None], pc, out)
            return out

        levels = {}
        rec_planes = {}
        for bs in SIZES:
            pred_y = mc_sel(_mc_luma, 0, bs, mv[bs], mv_c[bs], refsel[bs],
                            pad, False)
            ly, rec_y = _encode_plane(_block(sy, bs), pred_y, q,
                                      TX_OF[bs], bd)
            cbs = bs // 2
            pred_u = mc_sel(_mc_chroma, 1, cbs, mv[bs], mv_c[bs],
                            refsel[bs], cpad, True)
            pred_v = mc_sel(_mc_chroma, 2, cbs, mv[bs], mv_c[bs],
                            refsel[bs], cpad, True)
            lu, rec_u = _encode_plane(_block(su, cbs), pred_u, q,
                                      TX_OF_C[bs], bd)
            lv, rec_v = _encode_plane(_block(sv, cbs), pred_v, q,
                                      TX_OF_C[bs], bd)
            levels[bs] = (ly.astype(jnp.int16), lu.astype(jnp.int16),
                          lv.astype(jnp.int16))
            rec_planes[bs] = (_unblock(rec_y), _unblock(rec_u),
                              _unblock(rec_v))

        # --- final recon: per-cell select of the chosen size's recon -----
        def select_plane(idx_plane, shift):
            m8 = jnp.repeat(jnp.repeat(size8, 8 >> shift, 0), 8 >> shift, 1)
            out = jnp.where(m8 == 32, rec_planes[32][idx_plane],
                            jnp.where(m8 == 16, rec_planes[16][idx_plane],
                                      rec_planes[8][idx_plane]))
            return out

        rec_y = select_plane(0, 0)
        rec_u = select_plane(1, 1)
        rec_v = select_plane(2, 1)

        # --- in-loop filters over the mi-grid region (the decoder
        # filters exactly [ph_mi, pw_mi]; the 32-pad margin is redefined
        # by edge replication afterwards either way) ---------------------
        crop = lambda p2, sh: p2[: ph_mi >> sh, : pw_mi >> sh]
        repad = lambda core, like: jnp.pad(
            core, ((0, like.shape[0] - core.shape[0]),
                   (0, like.shape[1] - core.shape[1])), mode="edge")
        cy, cu, cv = crop(rec_y, 0), crop(rec_u, 1), crop(rec_v, 1)
        sz8 = size8[: ph_mi // 8, : pw_mi // 8].astype(jnp.int32)
        idx_sb = jnp.zeros((-(-ph_mi // 64), -(-pw_mi // 64)), jnp.uint8)

        if dynamic_q or lf_levels[0] or lf_levels[2] or lf_levels[3]:
            sizes_y = jnp.repeat(jnp.repeat(sz8, 8, 0), 8, 1)
            sizes_c = jnp.repeat(jnp.repeat(sz8 >> 1, 4, 0), 4, 1)
            cy = DB.deblock_plane(jnp, cy, sizes_y, lf_levels[0],
                                  lf_levels[1], True)
            cu = DB.deblock_plane(jnp, cu, sizes_c, lf_levels[2],
                                  lf_levels[2], False)
            cv = DB.deblock_plane(jnp, cv, sizes_c, lf_levels[3],
                                  lf_levels[3], False)

        if use_cdef:
            # per-8x8-unit skip: the selected leaf has all-zero levels
            def skipmap(bs2):
                lyv, luv, lvv2 = levels[bs2]
                z = ((lyv == 0).all((-1, -2)) & (luv == 0).all((-1, -2))
                     & (lvv2 == 0).all((-1, -2)))
                rep = bs2 // 8
                return jnp.repeat(jnp.repeat(z, rep, 0), rep, 1)

            sk = jnp.where(sz8 == 32, skipmap(32)[: sz8.shape[0],
                                                  : sz8.shape[1]],
                           jnp.where(sz8 == 16, skipmap(16)[: sz8.shape[0],
                                                            : sz8.shape[1]],
                                     skipmap(8)[: sz8.shape[0],
                                                : sz8.shape[1]]))
            # traced damping mirrors CD.pick_damping(q) so the header's
            # per-frame damping matches under dynamic q (hier-B layers, RC)
            damping = (3 + (q >> 6)) if dynamic_q else CD.pick_damping(qindex)
            (cy, cu, cv), idx_sb = CD.cdef_search_and_apply(
                jnp, (cy, cu, cv),
                (crop(sy, 0), crop(su, 1), crop(sv, 1)), sk, damping)
            idx_sb = idx_sb.astype(jnp.uint8)

        px_dt = jnp.uint8 if bd == 8 else jnp.uint16
        rec_y = repad(cy, rec_y).astype(px_dt)
        rec_u = repad(cu, rec_u).astype(px_dt)
        rec_v = repad(cv, rec_v).astype(px_dt)

        # pack levels: per 8x8 cell, the SELECTED leaf's tiles only — one
        # array per plane instead of three size grids (the tunnel link is
        # the bottleneck; host re-stitches leaves from tiles)
        m8 = size8[..., None, None]
        ly_pack = jnp.where(m8 == 32, _tiles8(levels[32][0], 8),
                            jnp.where(m8 == 16, _tiles8(levels[16][0], 8),
                                      levels[8][0]))
        lu_pack = jnp.where(m8 == 32, _tiles8(levels[32][1], 4),
                            jnp.where(m8 == 16, _tiles8(levels[16][1], 4),
                                      levels[8][1]))
        lv_pack = jnp.where(m8 == 32, _tiles8(levels[32][2], 4),
                            jnp.where(m8 == 16, _tiles8(levels[16][2], 4),
                                      levels[8][2]))
        if not dynamic_q:
            dt = (Q.level_dtype(qindex, T.TX_32X32, bd)
                  if Q.level_dtype(qindex, T.TX_32X32, bd) ==
                  Q.level_dtype(qindex, T.TX_4X4, bd)
                  else jnp.int16)
            ly_pack = ly_pack.astype(dt)
            lu_pack = lu_pack.astype(dt)
            lv_pack = lv_pack.astype(dt)
        out = (size8, mv_sel, ly_pack, lu_pack, lv_pack,
               rec_y, rec_u, rec_v, idx_sb)
        if nrefs == 2:
            out = out + (ref8,)
        if compound:
            out = out + (mv2_sel,)
        return out

    # static edge-legality masks in mi-grid terms are bound by the caller
    # via build_p_frame_encoder (closure cells patched below).
    inside16 = np.ones((ph // 16, pw // 16), bool)
    inside32 = np.ones((ph // 32, pw // 32), bool)
    mi_extent = [ph, pw]
    lf_levels_cell = [(0, 0, 0, 0)]
    use_cdef_cell = [False]

    def bind_masks(mi_rows: int, mi_cols: int, deblock: bool,
                   cdef: bool = False):
        cells_h, cells_w = mi_rows // 2, mi_cols // 2  # 8x8 cells in frame
        i16 = np.zeros((ph // 16, pw // 16), bool)
        for r in range(ph // 16):
            for c in range(pw // 16):
                i16[r, c] = (r * 2 + 2 <= cells_h) and (c * 2 + 2 <= cells_w)
        i32 = np.zeros((ph // 32, pw // 32), bool)
        for r in range(ph // 32):
            for c in range(pw // 32):
                i32[r, c] = (r * 4 + 4 <= cells_h) and (c * 4 + 4 <= cells_w)
        inside16[:] = i16
        inside32[:] = i32
        mi_extent[0] = mi_rows * 4
        mi_extent[1] = mi_cols * 4
        if deblock and qindex is not None:
            ly, lu, lv = DB.pick_filter_levels(qindex, is_key=False)
            lf_levels_cell[0] = (ly, ly, lu, lv)
        use_cdef_cell[0] = cdef

    step.bind_masks = bind_masks
    return step


@functools.lru_cache(maxsize=8)
def build_p_frame_encoder(ph: int, pw: int, mi_rows: int, mi_cols: int,
                          qindex: int, search: int = SEARCH_RANGE,
                          deblock: bool = True, cdef: bool = False,
                          bd: int = 8):
    fn = p_frame_step(ph, pw, qindex, search, bd=bd)
    fn.bind_masks(mi_rows, mi_cols, deblock, cdef)
    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def build_b_frame_encoder(ph: int, pw: int, mi_rows: int, mi_cols: int,
                          qindex: int, search: int = SEARCH_RANGE,
                          deblock: bool = True, cdef: bool = False):
    """Two-reference (fwd + bwd) step for hierarchical-B mini-GOPs.
    fn(sy, su, sv, r0y, r0u, r0v, r1y, r1u, r1v) -> P outputs + ref8."""
    fn = p_frame_step(ph, pw, qindex, search, nrefs=2)
    fn.bind_masks(mi_rows, mi_cols, deblock, cdef)
    return jax.jit(fn)


@functools.lru_cache(maxsize=4)
def build_p_frame_encoder_dyn(ph: int, pw: int, mi_rows: int, mi_cols: int,
                              search: int = SEARCH_RANGE,
                              cdef: bool = False, bd: int = 8):
    """Dynamic-q P step: fn(..., qindex, lf_y, lf_u, lf_v); one compile
    serves every qindex (rate control)."""
    fn = p_frame_step(ph, pw, None, search, bd=bd)
    fn.bind_masks(mi_rows, mi_cols, False, cdef)
    return jax.jit(fn)


@functools.lru_cache(maxsize=4)
def build_b_frame_encoder_dyn(ph: int, pw: int, mi_rows: int, mi_cols: int,
                              search: int = SEARCH_RANGE,
                              cdef: bool = False, compound: bool = False,
                              bd: int = 8):
    """Dynamic-q two-ref step: fn(sy, su, sv, r0y, r0u, r0v, r1y, r1u,
    r1v, qindex, lf_y, lf_u, lf_v); one compile serves every qindex
    (hier-B layer offsets, rate control).  compound=True adds the
    COMPOUND_AVERAGE candidate (fwd+bwd pairs only)."""
    fn = p_frame_step(ph, pw, None, search, nrefs=2, compound=compound,
                      bd=bd)
    fn.bind_masks(mi_rows, mi_cols, False, cdef)
    return jax.jit(fn)
