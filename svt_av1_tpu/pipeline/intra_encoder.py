"""Device-side intra frame encoder: wavefront sweeps of batched blocks.

The reference's EncDec stage claims wavefront *segments* per thread
(AssignEncDecSegments, EbEncDecProcess.c:388-520) to satisfy the intra
reconstruction dependency (a block predicts from its reconstructed above/
left neighbors).  The TPU formulation keeps the same dependency order but
batches every block on an anti-diagonal into ONE tensor program step:

    for d in 0..(nbh + nbw - 2):          # lax.fori_loop, on device
        blocks (r, c) with r + c == d:    # up to min(nbh, nbw) at once
            predict (all modes) -> select -> fwd txfm -> quant ->
            dequant -> inv txfm -> reconstruct -> scatter

Reconstruction state lives in block-grid layout [nbh, nbw, bs, bs] so all
neighbor access is static-shape gathers (no dynamic slices).  Anti-diagonal
order is consistent with the decoder's Z-order because any above/left
neighbor precedes the block in both orders.

Scope: uniform 8x8 luma partition (4x4 chroma); 13 base modes (plus
+-1..3 angle deltas and a DC/V/H/SMOOTH chroma pick at presets <= 5),
DCT residuals, static or traced q.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from svt_av1_tpu.ops import intra
from svt_av1_tpu.ops import quant as Q
from svt_av1_tpu.ops import transforms as T

# mode-decision candidate lists (indices into intra.predict_all_modes
# output).  The rich set (presets <= 5) adds +-1..3 angle deltas on every
# directional base (ref angle-delta candidate injection,
# EbModeDecision.c:1120+); chroma then picks between DC/V/H/SMOOTH.
DIR_MODES = (intra.V, intra.H, intra.D45, intra.D135, intra.D113,
             intra.D157, intra.D203, intra.D67)
RICH_MODES = tuple(intra.ALL_MODES) + tuple(
    (m, d) for m in DIR_MODES for d in (-3, -2, -1, 1, 2, 3))
UV_MODES = (intra.DC, intra.V, intra.H, intra.SMOOTH)
# intra chroma tx type is DERIVED from the uv mode (spec compute_tx_type
# -> Mode_To_Txfm_Type; ref intra_mode_to_tx_type, EbModeDecision.c:1851)
UV_TX = {intra.DC: T.DCT_DCT, intra.V: T.ADST_DCT,
         intra.H: T.DCT_ADST, intra.SMOOTH: T.ADST_ADST}


def _cand_tables(cands):
    mode_ids, deltas, is_d203 = [], [], []
    for c in cands:
        m, d = c if isinstance(c, tuple) else (c, 0)
        mode_ids.append(m)
        deltas.append(d)
        is_d203.append(m == intra.D203)
    return (np.array(mode_ids, np.int32), np.array(deltas, np.int32),
            np.array(is_d203))

LUMA_BS = 8
CHROMA_BS = 4
UV_CFL_ID = 13     # UV_CFL_PRED symbol (spec intra_frame_uv_mode)


def _encode_plane_batch(src, pred, qindex: int, tx_size: int, bd: int = 8,
                        tx_type: int = T.DCT_DCT):
    """residual -> (levels, recon) for a [B, n, n] batch."""
    resid = src - pred
    coeff = T.fwd_txfm2d_batch_exact(resid, tx_size, tx_type, bd)
    levels = Q.quantize_batch(coeff, qindex, tx_size, bd)
    dq = Q.dequantize_batch(levels, qindex, tx_size, bd)
    rec_resid = T.inv_txfm2d_batch(dq, tx_size, tx_type, bd)
    recon = jnp.clip(pred + rec_resid, 0, (1 << bd) - 1)
    return levels, recon


def frame_step(nbh: int, nbw: int, qindex, bd: int = 8,
               rich: bool = False, ibc: bool = False):
    """The (unjitted) full-frame intra encode step for a block grid.

    fn(src_y [nbh,nbw,8,8], src_u [nbh,nbw,4,4], src_v)
    -> (modes [nbh,nbw], levels_y [nbh,nbw,8,8],
        levels_u, levels_v [nbh,nbw,4,4],
        recon_y [nbh,nbw,8,8], recon_u, recon_v
        [, angle_deltas [nbh,nbw] i32, uv_modes [nbh,nbw] i32 — rich])

    rich=True (presets <= 5) widens mode decision: 61 luma candidates
    (13 base + 48 angle-delta variants) and a 4-way chroma mode pick.
    Exposed unjitted so parallel/ can vmap it over GOP-sharded frame
    batches; use build_frame_encoder for the single-frame jitted form.

    ibc=True (screen content): fn takes three extra args
    (use8 [nbh,nbw] bool, dv_r, dv_c [nbh,nbw] i32 pixel offsets) —
    blocks flagged use8 are predicted by COPYING from the evolving
    recon state at the (host-validated, staircase-causal) displacement
    instead of the intra mode sweep (spec intra block copy; the
    reference searches DVs per block in MD, EbModeDecision.c:2301 —
    here pipeline/ibc.py hash-matches ahead of the device step).
    """
    cands = RICH_MODES if rich else tuple(intra.ALL_MODES)
    mode_ids_np, deltas_np, d203_np = _cand_tables(cands)
    uv_cands = UV_MODES if rich else (intra.DC,)
    # staircase wavefront d = 2r + c: the above-right neighbor (r-1, c+1)
    # lands on d-1, so spec-available above-right rows are real recon
    # (classic WPP two-column offset; the reference gets the same order
    # from its wavefront dependency map, EbEncDecSegments.c:105-121)
    B = min(nbh, (nbw + 1) // 2)
    ndiag = 2 * nbh + nbw - 2
    ar_avail_np, bl_avail_np = intra.edge_availability(nbh, nbw)
    # pad with an invalid row/col (dummy gathers land there)
    ar_pad = np.zeros((nbh + 1, nbw + 1), bool)
    ar_pad[:nbh, :nbw] = ar_avail_np
    bl_pad = np.zeros((nbh + 1, nbw + 1), bool)
    bl_pad[:nbh, :nbw] = bl_avail_np

    def _gather_win(state, pr, pc, n, nrow, ncol):
        """[B, n, n] windows at per-block pixel positions (pr, pc) from a
        blocked [nrow+1, ncol+1, n, n] plane state (arbitrary alignment:
        a window spans up to 4 cells; one advanced-index gather)."""
        rows = pr[:, None] + jnp.arange(n, dtype=jnp.int32)[None, :]
        cols = pc[:, None] + jnp.arange(n, dtype=jnp.int32)[None, :]
        cr = jnp.clip(rows // n, 0, nrow)
        cc_ = jnp.clip(cols // n, 0, ncol)
        return state[cr[:, :, None], cc_[:, None, :],
                     (rows % n)[:, :, None], (cols % n)[:, None, :]]

    def step(sy, su, sv, *ibc_args):
        if ibc:
            use8, dv_r, dv_c = ibc_args
            pad2 = lambda a, fill: jnp.pad(a, ((0, 1), (0, 1)),
                                           constant_values=fill)
            use_pad = pad2(use8.astype(bool), False)
            dvr_pad = pad2(dv_r.astype(jnp.int32), 0)
            dvc_pad = pad2(dv_c.astype(jnp.int32), 0)
        sy = sy.astype(jnp.int32)
        su = su.astype(jnp.int32)
        sv = sv.astype(jnp.int32)
        # +1 dummy row/col absorbs out-of-range gathers and masked scatters
        ry = jnp.zeros((nbh + 1, nbw + 1, LUMA_BS, LUMA_BS), jnp.int32)
        ru = jnp.zeros((nbh + 1, nbw + 1, CHROMA_BS, CHROMA_BS), jnp.int32)
        rv = jnp.zeros((nbh + 1, nbw + 1, CHROMA_BS, CHROMA_BS), jnp.int32)
        modes = jnp.zeros((nbh + 1, nbw + 1), jnp.int32)
        angles = jnp.zeros((nbh + 1, nbw + 1), jnp.int32)
        uvm = jnp.zeros((nbh + 1, nbw + 1), jnp.int32)
        cfl = jnp.zeros((nbh + 1, nbw + 1, 2), jnp.int32)
        ly = jnp.zeros((nbh + 1, nbw + 1, LUMA_BS, LUMA_BS), jnp.int32)
        lu = jnp.zeros((nbh + 1, nbw + 1, CHROMA_BS, CHROMA_BS), jnp.int32)
        lv = jnp.zeros((nbh + 1, nbw + 1, CHROMA_BS, CHROMA_BS), jnp.int32)

        def body(d, state):
            ry, ru, rv, modes, angles, uvm, ly, lu, lv, cfl = state
            r = jnp.maximum(0, (d - nbw + 2) // 2) + jnp.arange(B)
            c = d - 2 * r
            valid = (r < nbh) & (c >= 0) & (c < nbw)
            rs = jnp.where(valid, r, nbh)
            cs = jnp.where(valid, c, nbw)
            ha = (r > 0) & valid
            hl = (c > 0) & valid
            r_up = jnp.where(ha, rs - 1, nbh)
            c_lf = jnp.where(hl, cs - 1, nbw)
            rc = jnp.minimum(rs, nbh - 1)   # clamped src gather
            cc = jnp.minimum(cs, nbw - 1)

            # ---- luma: mode decision over all candidates ----
            above = ry[r_up, cs, LUMA_BS - 1, :]
            left = ry[rs, c_lf, :, LUMA_BS - 1]
            topleft = ry[r_up, c_lf, LUMA_BS - 1, LUMA_BS - 1]
            # above-right extension (real recon where spec-available —
            # the staircase order guarantees it is already computed)
            ar_avail = jnp.asarray(ar_pad)[rs, cs]
            bl_avail = jnp.asarray(bl_pad)[rs, cs]
            c_ar = jnp.where(ar_avail, jnp.minimum(cs + 1, nbw), nbw)
            above_ext = ry[r_up, c_ar, LUMA_BS - 1, :]
            preds = intra.predict_all_modes(
                above, left, topleft, ha, hl, LUMA_BS, LUMA_BS, bd,
                modes=cands, above_ext=above_ext,
                ar_avail=ar_avail)  # [B,M,8,8]
            src = sy[rc, cc]
            sse = ((preds - src[:, None]) ** 2).sum((-1, -2))
            # D203 (all deltas) reads below-left pixels the wavefront
            # cannot provide where the spec makes them available:
            # exclude those candidates there
            sse = sse + (jnp.asarray(d203_np)[None, :]
                         & bl_avail[:, None]) * (1 << 30)
            best = jnp.argmin(sse, axis=1)
            pred = jnp.take_along_axis(
                preds, best[:, None, None, None], axis=1)[:, 0]
            if ibc:
                # IBC lane: copy the prediction from the evolving recon
                # at the host-chosen displacement (staircase-causal by
                # construction, pipeline/ibc.py)
                use_b = use_pad[rs, cs] & valid
                pyr = rs * LUMA_BS + dvr_pad[rs, cs]
                pxc = cs * LUMA_BS + dvc_pad[rs, cs]
                pyr = jnp.where(use_b, pyr, 0)
                pxc = jnp.where(use_b, pxc, 0)
                pred_ibc = _gather_win(ry, pyr, pxc, LUMA_BS, nbh, nbw)
                pred = jnp.where(use_b[:, None, None], pred_ibc, pred)
            lvls, recon = _encode_plane_batch(src, pred, qindex, T.TX_8X8,
                                              bd)
            ry = ry.at[rs, cs].set(recon)
            ly = ly.at[rs, cs].set(lvls)
            sel_mode = jnp.asarray(mode_ids_np)[best]
            sel_ang = jnp.asarray(deltas_np)[best]
            if ibc:
                sel_mode = jnp.where(use_b, 0, sel_mode)   # DC_PRED
                sel_ang = jnp.where(use_b, 0, sel_ang)
            modes = modes.at[rs, cs].set(sel_mode)
            angles = angles.at[rs, cs].set(sel_ang)

            # ---- chroma: joint U+V mode pick over uv_cands (each
            # candidate coded with its DERIVED tx type, UV_TX) ----
            cpreds = []
            for rp in (ru, rv):
                above_c = rp[r_up, cs, CHROMA_BS - 1, :]
                left_c = rp[rs, c_lf, :, CHROMA_BS - 1]
                tl_c = rp[r_up, c_lf, CHROMA_BS - 1, CHROMA_BS - 1]
                cpreds.append(intra.predict_all_modes(
                    above_c, left_c, tl_c, ha, hl,
                    CHROMA_BS, CHROMA_BS, bd, modes=uv_cands))
            lvl_u, rec_u, lvl_v, rec_v, sse_c = [], [], [], [], []
            for i, cm in enumerate(uv_cands):
                txc = UV_TX[cm]
                li_u, ri_u = _encode_plane_batch(
                    su[rc, cc], cpreds[0][:, i], qindex, T.TX_4X4, bd, txc)
                li_v, ri_v = _encode_plane_batch(
                    sv[rc, cc], cpreds[1][:, i], qindex, T.TX_4X4, bd, txc)
                lvl_u.append(li_u)
                rec_u.append(ri_u)
                lvl_v.append(li_v)
                rec_v.append(ri_v)
                sse_c.append(((su[rc, cc] - ri_u) ** 2).sum((-1, -2))
                             + ((sv[rc, cc] - ri_v) ** 2).sum((-1, -2)))
            au = av = None
            if rich:
                # ---- CFL candidate (spec 7.11.5; ref
                # cfl_luma_subsampling_420 / subtract_average /
                # cfl_predict, EbIntraPrediction.c:1303-1379): AC of the
                # block's RECONSTRUCTED luma in Q3, alpha in Q3 searched
                # per plane against source, base = the chroma DC pred ----
                hi = (1 << bd) - 1
                lq3 = ((recon[:, 0::2, 0::2] + recon[:, 0::2, 1::2]
                        + recon[:, 1::2, 0::2]
                        + recon[:, 1::2, 1::2]) << 1)
                lavg = (lq3.sum((-1, -2)) + 8) >> 4   # round2, 16 px
                ac = lq3 - lavg[:, None, None]
                alphas = jnp.arange(-16, 17, dtype=jnp.int32)
                scaled = alphas[None, :, None, None] * ac[:, None]
                scq = jnp.where(scaled >= 0, (scaled + 32) >> 6,
                                -((-scaled + 32) >> 6))
                cfl_l, cfl_r, cfl_a, sse_cfl = [], [], [], 0
                for sp_, dc_ in ((su[rc, cc], cpreds[0][:, 0]),
                                 (sv[rc, cc], cpreds[1][:, 0])):
                    pcand = jnp.clip(dc_[:, None] + scq, 0, hi)
                    ssea = ((sp_[:, None] - pcand) ** 2).sum((-1, -2))
                    ai = jnp.argmin(ssea, 1)
                    cfl_a.append(alphas[ai])
                    pb = jnp.take_along_axis(
                        pcand, ai[:, None, None, None], 1)[:, 0]
                    li, ri = _encode_plane_batch(sp_, pb, qindex,
                                                 T.TX_4X4, bd, T.DCT_DCT)
                    cfl_l.append(li)
                    cfl_r.append(ri)
                    sse_cfl = sse_cfl + ((sp_ - ri) ** 2).sum((-1, -2))
                # alpha (0,0) has no joint-sign code: never pick CFL then
                both0 = (cfl_a[0] == 0) & (cfl_a[1] == 0)
                sse_c.append(sse_cfl + both0 * (1 << 30))
                lvl_u.append(cfl_l[0])
                rec_u.append(cfl_r[0])
                lvl_v.append(cfl_l[1])
                rec_v.append(cfl_r[1])
            if len(lvl_u) > 1:
                bc = jnp.argmin(jnp.stack(sse_c, axis=1), axis=1)
            else:
                bc = jnp.zeros(rs.shape, jnp.int32)
            uv_ids = (tuple(uv_cands) + (UV_CFL_ID,)) if rich \
                else tuple(uv_cands)
            sel_uv = jnp.asarray(np.array(uv_ids, np.int32))[bc]
            if ibc:
                sel_uv = jnp.where(use_b, 0, sel_uv)       # UV_DC_PRED
            uvm = uvm.at[rs, cs].set(sel_uv)
            if rich:
                is_cfl = bc == len(uv_cands)
                if ibc:
                    is_cfl = is_cfl & ~use_b
                cfl = cfl.at[rs, cs, 0].set(jnp.where(is_cfl, cfl_a[0], 0))
                cfl = cfl.at[rs, cs, 1].set(jnp.where(is_cfl, cfl_a[1], 0))
            pick = lambda lst: jnp.take_along_axis(
                jnp.stack(lst, axis=1), bc[:, None, None, None],
                axis=1)[:, 0]
            ru_sel, lu_sel = pick(rec_u), pick(lvl_u)
            rv_sel, lv_sel = pick(rec_v), pick(lvl_v)
            if ibc:
                # chroma copies at dv/2 (dv even -> integer chroma pel;
                # never the spec's forced-bilinear subpel path)
                cyr = rs * CHROMA_BS + dvr_pad[rs, cs] // 2
                cxc = cs * CHROMA_BS + dvc_pad[rs, cs] // 2
                cyr = jnp.where(use_b, cyr, 0)
                cxc = jnp.where(use_b, cxc, 0)
                pu_ibc = _gather_win(ru, cyr, cxc, CHROMA_BS, nbh, nbw)
                pv_ibc = _gather_win(rv, cyr, cxc, CHROMA_BS, nbh, nbw)
                lui, rui = _encode_plane_batch(su[rc, cc], pu_ibc, qindex,
                                               T.TX_4X4, bd, T.DCT_DCT)
                lvi, rvi = _encode_plane_batch(sv[rc, cc], pv_ibc, qindex,
                                               T.TX_4X4, bd, T.DCT_DCT)
                m3 = use_b[:, None, None]
                ru_sel = jnp.where(m3, rui, ru_sel)
                lu_sel = jnp.where(m3, lui, lu_sel)
                rv_sel = jnp.where(m3, rvi, rv_sel)
                lv_sel = jnp.where(m3, lvi, lv_sel)
            ru = ru.at[rs, cs].set(ru_sel)
            lu = lu.at[rs, cs].set(lu_sel)
            rv = rv.at[rs, cs].set(rv_sel)
            lv = lv.at[rs, cs].set(lv_sel)

            return ry, ru, rv, modes, angles, uvm, ly, lu, lv, cfl

        (ry, ru, rv, modes, angles, uvm, ly, lu,
         lv, cfl) = jax.lax.fori_loop(
            0, ndiag, body,
            (ry, ru, rv, modes, angles, uvm, ly, lu, lv, cfl))
        trim = lambda a: a[:nbh, :nbw]
        # narrow dtypes before leaving the device: levels fit int8/int16
        # by the quantizer bound, recon/modes fit uint8 — the tunneled
        # device->host link is the pipeline bottleneck (PROGRESS profiling)
        if isinstance(qindex, (int, np.integer)) and bd == 8:
            dt_y = Q.level_dtype(qindex, T.TX_8X8)
            dt_c = Q.level_dtype(qindex, T.TX_4X4)
        else:
            dt_y = dt_c = jnp.int16   # dynamic q / highbd: conservative
        px = jnp.uint8 if bd == 8 else jnp.uint16
        out = (trim(modes).astype(jnp.uint8),
               trim(ly).astype(dt_y), trim(lu).astype(dt_c),
               trim(lv).astype(dt_c),
               trim(ry).astype(px), trim(ru).astype(px),
               trim(rv).astype(px))
        if rich:
            out = out + (trim(angles).astype(jnp.int8),
                         trim(uvm).astype(jnp.uint8),
                         trim(cfl).astype(jnp.int8))
        return out

    return step


# --- multi-size keyframe wavefront (presets <= 7) ----------------------------
# Per-leaf overheads for the in-loop partition RD select (J = SSE +
# lambda * bits; same lambda model as the inter RD merge,
# pipeline/inter_encoder.py).  The scalars are derived from the default
# CDF tables (pipeline/rdo.py, the reference's av1_estimate_syntax_rate
# source): intra leaf = skip + expected kf-y-mode + uv-mode entropy;
# partition symbols from the size-16/size-8 rows.
from svt_av1_tpu.pipeline import rdo as _RDO

MODE_BITS_I = _RDO.intra_leaf_bits()
PART_NONE_I = _RDO.partition_bits()[8][0]
PART_SPLIT_I = _RDO.partition_bits()[16][1]
_PART_NONE16_I = _RDO.partition_bits()[16][0]


def frame_step16(nbh: int, nbw: int, qindex, bd: int = 8,
                 rich: bool = False):
    """16x16-unit keyframe wavefront with in-loop RD partition select.

    Each anti-diagonal of 16x16 units runs FIVE batched encodes: the
    four 8x8 sub-blocks in z-order (each a full mode decision, exactly
    the frame_step body) and the whole 16x16 block (TX_16X16 luma /
    TX_8X8 chroma), then keeps the J = SSE + lambda*bits winner per
    unit.  Halves the sequential diagonal count vs the 8x8 wavefront
    (the reference gets variable depth from per-SB mode_decision_sb,
    EbProductCodingLoop.c:3300; the TPU form evaluates both depths as
    two more lanes of the same batched program).

    fn(src_y [nbh,nbw,8,8], src_u [nbh,nbw,4,4], src_v)
    -> frame_step's rich tuple + (sizes [nbh,nbw] u8 (8/16),
       levels16_y [nuh,nuw,16,16], levels16_u [nuh,nuw,8,8], levels16_v)
    """
    from svt_av1_tpu import tables as _tbl
    from svt_av1_tpu.pipeline.inter_encoder import _coeff_bits

    cands = RICH_MODES if rich else tuple(intra.ALL_MODES)
    mode_ids_np, deltas_np, d203_np = _cand_tables(cands)
    uv_cands = UV_MODES if rich else (intra.DC,)
    nuh, nuw = -(-nbh // 2), -(-nbw // 2)
    BU = min(nuh, (nuw + 1) // 2)
    ndiag = 2 * nuh + nuw - 2
    dynamic_q = not isinstance(qindex, (int, np.integer))

    ar8_np, bl8_np = intra.edge_availability(nbh, nbw)
    arU_np, blU_np = intra.edge_availability(nuh, nuw, per_sb=4)
    # 16 merge legality: unit fully inside the block grid
    legal_np = np.zeros((nuh, nuw), bool)
    legal_np[: nbh // 2, : nbw // 2] = True
    # the 16px above-right strip must exist in full (partial strips
    # would need spec numTopRight replication; see edge_availability)
    strip_np = np.zeros((nuh, nuw), bool)
    for Ci in range(nuw):
        strip_np[:, Ci] = (2 * Ci + 3) < nbw

    def _pad_tbl(t):
        p = np.zeros((t.shape[0] + 1, t.shape[1] + 1), bool)
        p[: t.shape[0], : t.shape[1]] = t
        return p

    ar8_pad = _pad_tbl(ar8_np)
    bl8_pad = _pad_tbl(bl8_np)
    arU_pad = _pad_tbl(arU_np & strip_np)
    blU_pad = _pad_tbl(blU_np)
    legal_pad = _pad_tbl(legal_np)

    def step(sy, su, sv):
        sy = sy.astype(jnp.int32)
        su = su.astype(jnp.int32)
        sv = sv.astype(jnp.int32)
        if dynamic_q:
            ac = jnp.asarray(_tbl.spec_tables()[f"ac_qlookup_{bd}"])[qindex]
            lam = jnp.maximum(4, (ac * ac) >> 8).astype(jnp.float32)
        else:
            acq = _tbl.ac_q(qindex, bd)
            lam = float(max(4, (acq * acq) >> 8))

        ry = jnp.zeros((nbh + 1, nbw + 1, LUMA_BS, LUMA_BS), jnp.int32)
        ru = jnp.zeros((nbh + 1, nbw + 1, CHROMA_BS, CHROMA_BS), jnp.int32)
        rv = jnp.zeros((nbh + 1, nbw + 1, CHROMA_BS, CHROMA_BS), jnp.int32)
        modes = jnp.zeros((nbh + 1, nbw + 1), jnp.int32)
        angles = jnp.zeros((nbh + 1, nbw + 1), jnp.int32)
        uvm = jnp.zeros((nbh + 1, nbw + 1), jnp.int32)
        cfl = jnp.zeros((nbh + 1, nbw + 1, 2), jnp.int32)
        ly8 = jnp.zeros((nbh + 1, nbw + 1, LUMA_BS, LUMA_BS), jnp.int32)
        lu8 = jnp.zeros((nbh + 1, nbw + 1, CHROMA_BS, CHROMA_BS), jnp.int32)
        lv8 = jnp.zeros((nbh + 1, nbw + 1, CHROMA_BS, CHROMA_BS), jnp.int32)
        size8 = jnp.full((nbh + 1, nbw + 1), 8, jnp.uint8)
        ly16 = jnp.zeros((nuh + 1, nuw + 1, 16, 16), jnp.int32)
        lu16 = jnp.zeros((nuh + 1, nuw + 1, 8, 8), jnp.int32)
        lv16 = jnp.zeros((nuh + 1, nuw + 1, 8, 8), jnp.int32)

        hi = (1 << bd) - 1

        def chroma_search(su_b, sv_b, cp_u, cp_v, rec_y, ck, tx_c):
            """Joint U+V mode pick + CFL candidate for a [B, ck, ck]
            chroma block; returns (uv_ids, bc, lvl/rec picks, sse, bits,
            cfl alphas).  cp_u/cp_v: [B, M, ck, ck] per-mode preds."""
            lvl_u, rec_u, lvl_v, rec_v, sse_c, bits_c = [], [], [], [], [], []
            for i, cm in enumerate(uv_cands):
                txty = UV_TX[cm]
                li_u, ri_u = _encode_plane_batch(su_b, cp_u[:, i], qindex,
                                                 tx_c, bd, txty)
                li_v, ri_v = _encode_plane_batch(sv_b, cp_v[:, i], qindex,
                                                 tx_c, bd, txty)
                lvl_u.append(li_u)
                rec_u.append(ri_u)
                lvl_v.append(li_v)
                rec_v.append(ri_v)
                sse_c.append(((su_b - ri_u) ** 2).sum((-1, -2))
                             + ((sv_b - ri_v) ** 2).sum((-1, -2)))
                bits_c.append(_coeff_bits(li_u) + _coeff_bits(li_v))
            au16 = av16 = None
            if rich:
                # CFL (spec 7.11.5): AC of reconstructed luma in Q3
                npx = (2 * ck) * (2 * ck) // 4   # chroma px count
                shift = int(np.log2(npx * 4)) - 2
                lq3 = ((rec_y[:, 0::2, 0::2] + rec_y[:, 0::2, 1::2]
                        + rec_y[:, 1::2, 0::2] + rec_y[:, 1::2, 1::2])
                       << 1)
                lavg = (lq3.sum((-1, -2)) + (1 << (shift - 1))) >> shift
                ac2 = lq3 - lavg[:, None, None]
                alphas = jnp.arange(-16, 17, dtype=jnp.int32)
                scaled = alphas[None, :, None, None] * ac2[:, None]
                scq = jnp.where(scaled >= 0, (scaled + 32) >> 6,
                                -((-scaled + 32) >> 6))
                cfl_l, cfl_r, cfl_a, sse_cfl, bits_cfl = [], [], [], 0, 0
                for sp_, dc_ in ((su_b, cp_u[:, 0]), (sv_b, cp_v[:, 0])):
                    pcand = jnp.clip(dc_[:, None] + scq, 0, hi)
                    ssea = ((sp_[:, None] - pcand) ** 2).sum((-1, -2))
                    ai = jnp.argmin(ssea, 1)
                    cfl_a.append(alphas[ai])
                    pb = jnp.take_along_axis(
                        pcand, ai[:, None, None, None], 1)[:, 0]
                    li, ri = _encode_plane_batch(sp_, pb, qindex, tx_c,
                                                 bd, T.DCT_DCT)
                    cfl_l.append(li)
                    cfl_r.append(ri)
                    sse_cfl = sse_cfl + ((sp_ - ri) ** 2).sum((-1, -2))
                    bits_cfl = bits_cfl + _coeff_bits(li)
                both0 = (cfl_a[0] == 0) & (cfl_a[1] == 0)
                sse_c.append(sse_cfl + both0 * (1 << 30))
                bits_c.append(bits_cfl)
                lvl_u.append(cfl_l[0])
                rec_u.append(cfl_r[0])
                lvl_v.append(cfl_l[1])
                rec_v.append(cfl_r[1])
                au16, av16 = cfl_a
            if len(lvl_u) > 1:
                bc = jnp.argmin(jnp.stack(sse_c, axis=1), axis=1)
            else:
                bc = jnp.zeros(su_b.shape[:1], jnp.int32)
            pick = lambda lst: jnp.take_along_axis(
                jnp.stack(lst, axis=1), bc[:, None, None, None],
                axis=1)[:, 0]
            sse_sel = jnp.take_along_axis(jnp.stack(sse_c, 1),
                                          bc[:, None], 1)[:, 0]
            bits_sel = jnp.take_along_axis(jnp.stack(bits_c, 1),
                                           bc[:, None], 1)[:, 0]
            uv_ids = (tuple(uv_cands) + (UV_CFL_ID,)) if rich \
                else tuple(uv_cands)
            uv_sel = jnp.asarray(np.array(uv_ids, np.int32))[bc]
            is_cfl = (bc == len(uv_cands)) if rich else (bc < 0)
            a_u = jnp.where(is_cfl, au16, 0) if rich else bc * 0
            a_v = jnp.where(is_cfl, av16, 0) if rich else bc * 0
            return (uv_sel, pick(lvl_u), pick(rec_u), pick(lvl_v),
                    pick(rec_v), sse_sel, bits_sel, a_u, a_v)

        def enc8(rb, cb, valid_s, ry, ru, rv, modes, angles, uvm,
                 ly8, lu8, lv8, cfl, size8):
            """One 8x8 sub-block batch (the frame_step body at the given
            coords); returns updated state + per-lane J."""
            ha = (rb < nbh) & (rb > 0) & valid_s
            hl = (cb < nbw) & (cb > 0) & valid_s
            r_up = jnp.where(ha, rb - 1, nbh)
            c_lf = jnp.where(hl, cb - 1, nbw)
            rc = jnp.minimum(rb, nbh - 1)
            cc = jnp.minimum(cb, nbw - 1)

            above = ry[r_up, cb, LUMA_BS - 1, :]
            left = ry[rb, c_lf, :, LUMA_BS - 1]
            topleft = ry[r_up, c_lf, LUMA_BS - 1, LUMA_BS - 1]
            ar_avail = jnp.asarray(ar8_pad)[rb, cb]
            bl_avail = jnp.asarray(bl8_pad)[rb, cb]
            c_ar = jnp.where(ar_avail, jnp.minimum(cb + 1, nbw), nbw)
            above_ext = ry[r_up, c_ar, LUMA_BS - 1, :]
            preds = intra.predict_all_modes(
                above, left, topleft, ha, hl, LUMA_BS, LUMA_BS, bd,
                modes=cands, above_ext=above_ext, ar_avail=ar_avail)
            src = sy[rc, cc]
            sse = ((preds - src[:, None]) ** 2).sum((-1, -2))
            sse = sse + (jnp.asarray(d203_np)[None, :]
                         & bl_avail[:, None]) * (1 << 30)
            best = jnp.argmin(sse, axis=1)
            pred = jnp.take_along_axis(
                preds, best[:, None, None, None], axis=1)[:, 0]
            lvls, recon = _encode_plane_batch(src, pred, qindex, T.TX_8X8,
                                              bd)
            ry = ry.at[rb, cb].set(recon)
            ly8 = ly8.at[rb, cb].set(lvls)
            modes = modes.at[rb, cb].set(jnp.asarray(mode_ids_np)[best])
            angles = angles.at[rb, cb].set(jnp.asarray(deltas_np)[best])
            size8 = size8.at[rb, cb].set(jnp.uint8(8))

            cpreds = []
            for rp in (ru, rv):
                above_c = rp[r_up, cb, CHROMA_BS - 1, :]
                left_c = rp[rb, c_lf, :, CHROMA_BS - 1]
                tl_c = rp[r_up, c_lf, CHROMA_BS - 1, CHROMA_BS - 1]
                cpreds.append(intra.predict_all_modes(
                    above_c, left_c, tl_c, ha, hl,
                    CHROMA_BS, CHROMA_BS, bd, modes=uv_cands))
            (uv_sel, plu, pru, plv, prv, sse_c, bits_c, a_u,
             a_v) = chroma_search(su[rc, cc], sv[rc, cc], cpreds[0],
                                  cpreds[1], recon, CHROMA_BS, T.TX_4X4)
            uvm = uvm.at[rb, cb].set(uv_sel)
            cfl = cfl.at[rb, cb, 0].set(a_u)
            cfl = cfl.at[rb, cb, 1].set(a_v)
            ru = ru.at[rb, cb].set(pru)
            lu8 = lu8.at[rb, cb].set(plu)
            rv = rv.at[rb, cb].set(prv)
            lv8 = lv8.at[rb, cb].set(plv)

            sse_y = ((src - recon) ** 2).sum((-1, -2))
            j8 = (sse_y + sse_c).astype(jnp.float32) + lam * (
                _coeff_bits(lvls) + bits_c + MODE_BITS_I).astype(
                    jnp.float32)
            return (ry, ru, rv, modes, angles, uvm, ly8, lu8, lv8, cfl,
                    size8, j8)

        def body(d, state):
            (ry, ru, rv, modes, angles, uvm, ly8, lu8, lv8, cfl,
             size8, ly16, lu16, lv16) = state
            R = jnp.maximum(0, (d - nuw + 2) // 2) + jnp.arange(BU)
            C = d - 2 * R
            valid_u = (R < nuh) & (C >= 0) & (C < nuw)
            Ru = jnp.where(valid_u, R, nuh)
            Cu = jnp.where(valid_u, C, nuw)
            r0 = jnp.where(valid_u, R * 2, nbh)
            c0 = jnp.where(valid_u, C * 2, nbw)

            # ---- four 8x8 sub-blocks in z-order --------------------
            J8 = jnp.zeros((BU,), jnp.float32)
            subs = []
            for (i, j) in ((0, 0), (0, 1), (1, 0), (1, 1)):
                valid_s = valid_u & (R * 2 + i < nbh) & (C * 2 + j < nbw)
                rb = jnp.where(valid_s, r0 + i, nbh)
                cb = jnp.where(valid_s, c0 + j, nbw)
                (ry, ru, rv, modes, angles, uvm, ly8, lu8, lv8, cfl,
                 size8, j8) = enc8(rb, cb, valid_s, ry, ru, rv, modes,
                                   angles, uvm, ly8, lu8, lv8, cfl, size8)
                J8 = J8 + jnp.where(valid_s, j8, 0.0)
                subs.append((rb, cb))
            J8 = J8 + lam * (PART_SPLIT_I + 4 * PART_NONE_I)

            # ---- the 16x16 candidate -------------------------------
            ha = (R > 0) & valid_u
            hl = (C > 0) & valid_u
            rup = jnp.where(ha, r0 - 1, nbh)
            clf = jnp.where(hl, c0 - 1, nbw)
            r1 = jnp.minimum(r0 + 1, nbh)
            c1 = jnp.minimum(c0 + 1, nbw)
            above16 = jnp.concatenate(
                [ry[rup, c0, LUMA_BS - 1, :], ry[rup, c1, LUMA_BS - 1, :]],
                -1)
            left16 = jnp.concatenate(
                [ry[r0, clf, :, LUMA_BS - 1], ry[r1, clf, :, LUMA_BS - 1]],
                -1)
            tl16 = ry[rup, clf, LUMA_BS - 1, LUMA_BS - 1]
            arU = jnp.asarray(arU_pad)[Ru, Cu]
            blU = jnp.asarray(blU_pad)[Ru, Cu]
            c_ar0 = jnp.where(arU, jnp.minimum(c0 + 2, nbw), nbw)
            c_ar1 = jnp.where(arU, jnp.minimum(c0 + 3, nbw), nbw)
            ext16 = jnp.concatenate(
                [ry[rup, c_ar0, LUMA_BS - 1, :],
                 ry[rup, c_ar1, LUMA_BS - 1, :]], -1)
            preds16 = intra.predict_all_modes(
                above16, left16, tl16, ha, hl, 16, 16, bd,
                modes=cands, above_ext=ext16, ar_avail=arU)
            rc0 = jnp.minimum(r0, nbh - 1)
            cc0 = jnp.minimum(c0, nbw - 1)
            rc1 = jnp.minimum(r0 + 1, nbh - 1)
            cc1 = jnp.minimum(c0 + 1, nbw - 1)

            def asm(g, ra, rb_, ca, cb_):
                top = jnp.concatenate([g[ra, ca], g[ra, cb_]], -1)
                bot = jnp.concatenate([g[rb_, ca], g[rb_, cb_]], -1)
                return jnp.concatenate([top, bot], -2)

            src16 = asm(sy, rc0, rc1, cc0, cc1)
            sse16 = ((preds16 - src16[:, None]) ** 2).sum((-1, -2))
            sse16 = sse16 + (jnp.asarray(d203_np)[None, :]
                             & blU[:, None]) * (1 << 30)
            best16 = jnp.argmin(sse16, axis=1)
            pred16 = jnp.take_along_axis(
                preds16, best16[:, None, None, None], axis=1)[:, 0]
            l16y, rec16y = _encode_plane_batch(src16, pred16, qindex,
                                               T.TX_16X16, bd)
            m16 = jnp.asarray(mode_ids_np)[best16]
            a16 = jnp.asarray(deltas_np)[best16]

            cpreds16 = []
            for rp in (ru, rv):
                ab = jnp.concatenate([rp[rup, c0, CHROMA_BS - 1, :],
                                      rp[rup, c1, CHROMA_BS - 1, :]], -1)
                lf = jnp.concatenate([rp[r0, clf, :, CHROMA_BS - 1],
                                      rp[r1, clf, :, CHROMA_BS - 1]], -1)
                tl = rp[rup, clf, CHROMA_BS - 1, CHROMA_BS - 1]
                cpreds16.append(intra.predict_all_modes(
                    ab, lf, tl, ha, hl, 8, 8, bd, modes=uv_cands))
            su16 = asm(su, rc0, rc1, cc0, cc1)
            sv16 = asm(sv, rc0, rc1, cc0, cc1)
            (uv16, l16u, r16u, l16v, r16v, sse_c16, bits_c16, au16,
             av16) = chroma_search(su16, sv16, cpreds16[0], cpreds16[1],
                                   rec16y, 8, T.TX_8X8)
            sse_y16 = ((src16 - rec16y) ** 2).sum((-1, -2))
            J16 = (sse_y16 + sse_c16).astype(jnp.float32) + lam * (
                _coeff_bits(l16y) + bits_c16 + MODE_BITS_I
                + _PART_NONE16_I).astype(jnp.float32)

            legal = jnp.asarray(legal_pad)[Ru, Cu]
            use16 = legal & valid_u & (J16 <= J8)

            # ---- writeback: overwrite the four cells where 16 wins --
            w = use16[:, None, None]
            qy = lambda i, j: rec16y[:, i * 8 : i * 8 + 8,
                                     j * 8 : j * 8 + 8]
            qc = lambda a, i, j: a[:, i * 4 : i * 4 + 4, j * 4 : j * 4 + 4]
            for k, (i, j) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
                rb, cb = subs[k]
                ry = ry.at[rb, cb].set(jnp.where(w, qy(i, j), ry[rb, cb]))
                ru = ru.at[rb, cb].set(jnp.where(w, qc(r16u, i, j),
                                                 ru[rb, cb]))
                rv = rv.at[rb, cb].set(jnp.where(w, qc(r16v, i, j),
                                                 rv[rb, cb]))
                modes = modes.at[rb, cb].set(
                    jnp.where(use16, m16, modes[rb, cb]))
                angles = angles.at[rb, cb].set(
                    jnp.where(use16, a16, angles[rb, cb]))
                uvm = uvm.at[rb, cb].set(
                    jnp.where(use16, uv16, uvm[rb, cb]))
                cfl = cfl.at[rb, cb, 0].set(
                    jnp.where(use16, au16, cfl[rb, cb, 0]))
                cfl = cfl.at[rb, cb, 1].set(
                    jnp.where(use16, av16, cfl[rb, cb, 1]))
                size8 = size8.at[rb, cb].set(
                    jnp.where(use16, 16, size8[rb, cb]).astype(jnp.uint8))
            ly16 = ly16.at[Ru, Cu].set(jnp.where(w, l16y, 0))
            lu16 = lu16.at[Ru, Cu].set(jnp.where(w, l16u, 0))
            lv16 = lv16.at[Ru, Cu].set(jnp.where(w, l16v, 0))

            return (ry, ru, rv, modes, angles, uvm, ly8, lu8, lv8, cfl,
                    size8, ly16, lu16, lv16)

        (ry, ru, rv, modes, angles, uvm, ly8, lu8, lv8, cfl, size8,
         ly16, lu16, lv16) = jax.lax.fori_loop(
            0, ndiag, body,
            (ry, ru, rv, modes, angles, uvm, ly8, lu8, lv8, cfl, size8,
             ly16, lu16, lv16))
        trim = lambda a: a[:nbh, :nbw]
        trimu = lambda a: a[:nuh, :nuw]
        if not dynamic_q and bd == 8:
            dt_y = Q.level_dtype(qindex, T.TX_16X16)
            dt_c = Q.level_dtype(qindex, T.TX_4X4)
            if dt_y != dt_c:
                dt_y = dt_c = jnp.int16
        else:
            dt_y = dt_c = jnp.int16
        px = jnp.uint8 if bd == 8 else jnp.uint16
        return (trim(modes).astype(jnp.uint8),
                trim(ly8).astype(dt_y), trim(lu8).astype(dt_c),
                trim(lv8).astype(dt_c),
                trim(ry).astype(px), trim(ru).astype(px),
                trim(rv).astype(px),
                trim(angles).astype(jnp.int8),
                trim(uvm).astype(jnp.uint8),
                trim(cfl).astype(jnp.int8),
                trim(size8),
                trimu(ly16).astype(dt_y), trimu(lu16).astype(dt_c),
                trimu(lv16).astype(dt_c))

    return step


@functools.lru_cache(maxsize=8)
@functools.lru_cache(maxsize=8)
def build_frame_encoder(nbh: int, nbw: int, qindex: int, bd: int = 8,
                        rich: bool = False, part16: bool = False,
                        ibc: bool = False):
    """Jit-compiled single-frame encode step (see frame_step)."""
    if ibc:
        return jax.jit(frame_step(nbh, nbw, qindex, bd, rich, ibc=True))
    mk = frame_step16 if part16 else frame_step
    return jax.jit(mk(nbh, nbw, qindex, bd, rich))


@functools.lru_cache(maxsize=4)
def build_frame_encoder_dyn(nbh: int, nbw: int, bd: int = 8,
                            rich: bool = False, part16: bool = False,
                            ibc: bool = False):
    """Dynamic-q variant: fn(sy, su, sv, qindex[, use8, dv_r, dv_c]) —
    one compile serves every qindex (rate control changes q per frame)."""
    mk = frame_step16 if (part16 and not ibc) else frame_step

    def wrapper(sy, su, sv, qindex, *ibc_args):
        # frame_step closes over qindex; the traced scalar flows through
        if ibc:
            return frame_step(nbh, nbw, qindex, bd, rich,
                              ibc=True)(sy, su, sv, *ibc_args)
        return mk(nbh, nbw, qindex, bd, rich)(sy, su, sv)

    return jax.jit(wrapper)


@functools.lru_cache(maxsize=4)
def build_batch_frame_encoder_dyn(nbh: int, nbw: int, bd: int = 8,
                                  rich: bool = False):
    """Dynamic-q batched variant: fn(sy, su, sv, qindex) with a shared
    per-batch q scalar (intra-only VBR)."""
    def wrapper(sy, su, sv, qindex):
        return frame_step(nbh, nbw, qindex, bd, rich)(sy, su, sv)

    return jax.jit(jax.vmap(wrapper, in_axes=(0, 0, 0, None)))


@functools.lru_cache(maxsize=8)
def build_batch_frame_encoder(nbh: int, nbw: int, qindex: int, bd: int = 8,
                              rich: bool = False):
    """Jit-compiled multi-frame encode step: vmap over a leading frame
    axis.  Amortizes per-step fixed cost across independent frames —
    the TPU counterpart of the reference's multi-picture-in-flight
    pooled stages / multi-channel batching (EbAppMain.c:196-215)."""
    return jax.jit(jax.vmap(frame_step(nbh, nbw, qindex, bd, rich)))


def dispatch_batch_device(frames, qindex: int, mi_rows: int, mi_cols: int,
                          bd: int = 8):
    """Asynchronously dispatch a batch of same-geometry frames."""
    import jax.numpy as jnp

    pw, ph = mi_cols * 4, mi_rows * 4
    nbh, nbw = ph // LUMA_BS, pw // LUMA_BS
    sy = np.stack([block_planes(pad_plane(f.y, ph, pw),
                                LUMA_BS) for f in frames])
    su = np.stack([block_planes(
        pad_plane(f.u, ph // 2, pw // 2), CHROMA_BS)
        for f in frames])
    sv = np.stack([block_planes(
        pad_plane(f.v, ph // 2, pw // 2), CHROMA_BS)
        for f in frames])
    fn = build_batch_frame_encoder(nbh, nbw, qindex, bd)
    out = fn(jnp.asarray(sy), jnp.asarray(su), jnp.asarray(sv))
    return out, nbh, nbw


def materialize_batch(out, nbh: int, nbw: int, with_recon: bool = True):
    rich = len(out) > 7
    sel = list(out[: 7 if with_recon else 4]) + list(out[7:])
    arrs = [np.asarray(a) for a in jax.device_get(sel)]
    nrec = 7 if with_recon else 4
    g = arrs[0].shape[0]
    return [
        {
            "modes": arrs[0][i], "levels_y": arrs[1][i],
            "levels_u": arrs[2][i], "levels_v": arrs[3][i],
            "recon_y": unblock_planes(arrs[4][i]) if with_recon else None,
            "recon_u": unblock_planes(arrs[5][i]) if with_recon else None,
            "recon_v": unblock_planes(arrs[6][i]) if with_recon else None,
            "angles": arrs[nrec][i] if rich else None,
            "uv_modes": arrs[nrec + 1][i] if rich else None,
            "cfl": arrs[nrec + 2][i] if rich else None,
            "nbh": nbh, "nbw": nbw,
        }
        for i in range(g)
    ]


def block_planes(plane: np.ndarray, bs: int) -> np.ndarray:
    """[H, W] -> [H/bs, W/bs, bs, bs] block grid."""
    h, w = plane.shape
    assert h % bs == 0 and w % bs == 0, (h, w, bs)
    return (plane.reshape(h // bs, bs, w // bs, bs)
            .transpose(0, 2, 1, 3))


def unblock_planes(blocks: np.ndarray) -> np.ndarray:
    nbh, nbw, bs, _ = blocks.shape
    return blocks.transpose(0, 2, 1, 3).reshape(nbh * bs, nbw * bs)


def pad_plane(plane: np.ndarray, target_h: int, target_w: int) -> np.ndarray:
    """Edge-replicate pad (ref PadPictureToMultipleOfLcuDimensions)."""
    h, w = plane.shape
    return np.pad(plane, ((0, target_h - h), (0, target_w - w)), mode="edge")


def dispatch_frame_device(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                          qindex: int, mi_rows: int, mi_cols: int,
                          bd: int = 8, rich: bool = False,
                          part16: bool = False, ibc=None):
    """Asynchronously dispatch the device encode; returns (jax outputs,
    nbh, nbw).  JAX's async dispatch keeps the device busy while the host
    runs the entropy stage of earlier frames — the TPU equivalent of the
    reference's pipelined process stages.  ibc: optional (use8, dv) maps
    from pipeline.ibc.hash_dv_map (screen content)."""
    import jax.numpy as jnp

    pw, ph = mi_cols * 4, mi_rows * 4
    nbh, nbw = ph // LUMA_BS, pw // LUMA_BS
    sy = block_planes(pad_plane(y, ph, pw), LUMA_BS)
    su = block_planes(pad_plane(u, ph // 2, pw // 2), CHROMA_BS)
    sv = block_planes(pad_plane(v, ph // 2, pw // 2), CHROMA_BS)
    if ibc is not None:
        use8, dv = ibc
        fn = build_frame_encoder(nbh, nbw, qindex, bd, rich, ibc=True)
        out = fn(jnp.asarray(sy), jnp.asarray(su), jnp.asarray(sv),
                 jnp.asarray(use8), jnp.asarray(dv[..., 0]),
                 jnp.asarray(dv[..., 1]))
    else:
        fn = build_frame_encoder(nbh, nbw, qindex, bd, rich, part16)
        out = fn(jnp.asarray(sy), jnp.asarray(su), jnp.asarray(sv))
    return out, nbh, nbw


def materialize_frame(out, nbh: int, nbw: int, arrs=None):
    """out tuple -> host dict.  arrs: optional prefetched {index: np
    array} (the encoder's packed single-transfer fetch); indices absent
    from it materialize as None (e.g. recon when the in-loop-filtered
    planes supersede it)."""
    if arrs is None:
        # one batched fetch: the tunneled link pays RTT per transfer
        arrs = {i: np.asarray(a)
                for i, a in enumerate(jax.device_get(list(out)))}
    g = arrs.get
    ub = lambda a: None if a is None else unblock_planes(a)
    return {
        "modes": g(0), "levels_y": g(1), "levels_u": g(2),
        "levels_v": g(3),
        "recon_y": ub(g(4)), "recon_u": ub(g(5)), "recon_v": ub(g(6)),
        "angles": g(7), "uv_modes": g(8), "cfl": g(9),
        "sizes": g(10), "levels16_y": g(11), "levels16_u": g(12),
        "levels16_v": g(13),
        "nbh": nbh, "nbw": nbw,
    }


def encode_frame_device(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                        qindex: int, mi_rows: int, mi_cols: int):
    """Synchronous convenience wrapper: dispatch + materialize."""
    out, nbh, nbw = dispatch_frame_device(y, u, v, qindex, mi_rows, mi_cols)
    return materialize_frame(out, nbh, nbw)
