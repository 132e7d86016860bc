"""Encoder warped-motion pass (WARPED_CAUSAL selection).

TPU-first structure: the bulk-parallel device step picks partitions,
MVs and residuals with translational MC only (inter_encoder).  Warp
params are *derived from the final motion field* (that is what the
decoder does too — spec 7.10.2), so warp is naturally a POST-pass: once
the step's size/MV maps land on the host, each eligible leaf derives
its projection from its causal neighbors' MVs, re-predicts through the
normative warp filter, re-codes the residual, and flips to
WARPED_CAUSAL when rate-distortion wins.  Flips only touch the block's
own levels/recon — inter blocks have no intra-frame prediction
dependency — so decisions are independent and the patched recon then
runs the deblock/CDEF postproc on device.

ref: warped-motion candidate injection EbModeDecision.c:1143,
warped_motion_parameters EbAdaptiveMotionVectorPrediction.c:1875;
restructured from per-block MD into a host post-pass over the dense
step outputs (the reference derives from the same causal state).
"""

from __future__ import annotations

import numpy as np

from svt_av1_tpu import tables as _tbl
from svt_av1_tpu.entropy import warp_samples as WS
from svt_av1_tpu.entropy.mvp import MiInter
from svt_av1_tpu.ops import quant as Q
from svt_av1_tpu.ops import transforms as T
from svt_av1_tpu.ops import warp as WP
from svt_av1_tpu.pipeline import rdo as RDO

TX_OF = {8: T.TX_8X8, 16: T.TX_16X16, 32: T.TX_32X32, 64: T.TX_64X64}
TX_OF_C = {8: T.TX_4X4, 16: T.TX_8X8, 32: T.TX_16X16, 64: T.TX_32X32}


def _quantize_np(coeff: np.ndarray, qindex: int, tx_size: int,
                 bd: int) -> np.ndarray:
    """Numpy twin of ops.quant.quantize_batch (deadzone 7/16 AC, 1/2
    DC) — levels stay self-consistent with the normative dequant."""
    q, rnd, lvl_max, shift = Q._qgrids(qindex, tx_size, bd)
    q = np.asarray(q, np.int64)
    mag = np.abs(coeff).astype(np.int64) << shift
    lvl = (mag + np.asarray(rnd, np.int64)) // q
    lvl = np.minimum(lvl, np.asarray(lvl_max, np.int64))
    return (np.sign(coeff) * lvl).astype(np.int32)


def _encode_block_np(src, pred, qindex: int, tx_size: int, bd: int):
    """Host residual code: fwd (golden int) -> quant -> dequant -> inv.
    Returns (levels, recon)."""
    resid = (src - pred).astype(np.int32)
    coeff = T.fwd_txfm2d_np(resid, tx_size, T.DCT_DCT, bd)
    lv = _quantize_np(coeff, qindex, tx_size, bd)
    if T.TX_W[tx_size] > 32 or T.TX_H[tx_size] > 32:
        keep = np.zeros_like(lv, bool)
        keep[:32, :32] = True
        lv = np.where(keep, lv, 0)
    dq = Q.dequantize_np(lv, qindex, tx_size, bd)
    rec = T.inv_txfm2d_np(dq, tx_size, T.DCT_DCT, bd)
    return lv, np.clip(pred + rec, 0, (1 << bd) - 1).astype(np.int32)


def _coeff_bits_np(lv: np.ndarray) -> int:
    """Host twin of inter_encoder._coeff_bits (rate proxy)."""
    a = np.abs(lv)
    nb = np.ceil(np.log2(a.astype(np.float64) + 1.0)).astype(np.int64)
    bits = int(np.where(a > 0, 3 + 2 * nb, 0).sum())
    return bits + (4 if (a > 0).any() else 1)


def _motion_mode_bits():
    """(simple_bits, warped_bits) averaged over the 22 bsize rows of the
    default motion_mode cdf."""
    fc = RDO._fc0()
    simple = RDO._avg_over_ctx(fc.motion_mode, 0)
    warped = RDO._avg_over_ctx(fc.motion_mode, 2)
    return simple, warped


def build_mi_maps(sizes: np.ndarray, shapes, mv: np.ndarray,
                  mi_rows: int, mi_cols: int, ref: int = 1) -> MiInter:
    """Full-frame MiInter from the step's per-8x8-cell maps.  Causality
    is implied: warp sampling only ever reads above/left/TL/TR cells,
    all decoded before the current block in z-order, so the completed
    maps equal the writer's causal state at every block."""
    mi = MiInter(mi_rows, mi_cols)
    up = lambda a: np.repeat(np.repeat(a, 2, 0), 2, 1)[:mi_rows, :mi_cols]
    sz = up(sizes.astype(np.int32))
    shp = None if shapes is None else up(shapes.astype(np.int32))
    w4 = sz // 4
    h4 = sz // 4
    if shp is not None:
        w4 = np.where(shp == 1, sz // 4, np.where(shp == 2, sz // 8, w4))
        h4 = np.where(shp == 1, sz // 8, np.where(shp == 2, sz // 4, h4))
    mi.w4[:] = w4
    mi.h4[:] = h4
    mi.is_inter[:] = True
    mi.ref_frame[:] = ref
    mi.mv[:] = up(mv.astype(np.int16))
    return mi


def leaf_origins(sizes: np.ndarray, shapes):
    """Yield (r8, c8, bw8, bh8) leaf origins in raster cell order."""
    nb8h, nb8w = sizes.shape
    seen = np.zeros((nb8h, nb8w), bool)
    for r8 in range(nb8h):
        for c8 in range(nb8w):
            if seen[r8, c8]:
                continue
            ns = int(sizes[r8, c8]) // 8
            shp = 0 if shapes is None else int(shapes[r8, c8])
            bw8 = ns if shp != 2 else ns // 2
            bh8 = ns if shp != 1 else ns // 2
            seen[r8 : r8 + bh8, c8 : c8 + bw8] = True
            yield r8, c8, bw8, bh8


def warp_pass(src_planes, rec_planes, ref_planes, arrs, lay,
              sizes: np.ndarray, mv: np.ndarray, shapes,
              qindex: int, mi_rows: int, mi_cols: int, bd: int = 8,
              txty=None):
    """Flip RD-winning leaves to WARPED_CAUSAL in place.

    src_planes / rec_planes: [y, u, v] host int32, mi-grid dims (luma
    [mi_rows*4, mi_cols*4]); rec is the PRE-FILTER recon and is patched
    in place.  ref_planes: the reference cropped to TRUE frame dims
    (what the decoder's warp clamps against).  arrs/lay: the fetched
    step outputs — the packed level cell tiles are patched in place.
    Returns (warp8 cell map | None, number of flips).
    """
    mi = build_mi_maps(sizes, shapes, mv, mi_rows, mi_cols)
    sb, wb = _motion_mode_bits()
    acq = _tbl.ac_q(qindex, bd)
    lam = float(max(4, (acq * acq) >> 8))
    ly = arrs[lay["ly"]]
    lu = arrs[lay["lu"]]
    lv_ = arrs[lay["lv"]]
    warp8 = np.zeros_like(sizes, np.uint8)
    nflip = 0
    for r8, c8, bw8, bh8 in leaf_origins(sizes, shapes):
        if bw8 != bh8 or bw8 > 4:
            continue          # square 8..32 leaves only (64 skipped:
        #                       half-SB projections rarely validate and
        #                       the host re-code cost quadruples)
        r4, c4 = r8 * 2, c8 * 2
        w4 = h4 = bw8 * 2
        bs = bw8 * 8
        kind, _ns = WS.motion_mode_gate(mi, mi_rows, mi_cols, r4, c4,
                                        w4, h4, 1, False)
        if kind != 2:
            continue
        mv8 = (int(mv[r8, c8, 0]), int(mv[r8, c8, 1]))
        pts1, pts2 = WS.find_samples(mi, mi_rows, mi_cols, r4, c4,
                                     w4, h4, 1)
        pts1, pts2 = WS.select_samples(mv8, pts1, pts2, bs, bs)
        model = WP.derive_warp(pts1, pts2, bs, bs, mv8, r4, c4)
        if model is None:
            continue
        wm, shear = model
        if wm[2] == (1 << 16) and wm[3] == 0 and wm[4] == 0 \
                and wm[5] == (1 << 16):
            continue          # degenerate translation: warp cannot win
        py, px = r8 * 8, c8 * 8
        sy_b = src_planes[0][py : py + bs, px : px + bs]
        pred_w = WP.warp_block(ref_planes[0], wm, shear, px, py, bs, bs,
                               0, 0, bd)
        lv_w, rec_w = _encode_block_np(sy_b, pred_w, qindex, TX_OF[bs], bd)
        d_w = float(((sy_b - rec_w) ** 2).sum())
        r_w = _coeff_bits_np(lv_w) + wb
        cur_rec = rec_planes[0][py : py + bs, px : px + bs]
        d_s = float(((sy_b - cur_rec) ** 2).sum())
        cur_lv = _leaf_levels(ly, r8, c8, bw8, 8)
        r_s = _coeff_bits_np(cur_lv) + sb
        cbs = bs // 2
        chroma = bs >= 16     # sub-8 chroma stays translational
        if chroma:
            cy, cx = py // 2, px // 2
            su_b = src_planes[1][cy : cy + cbs, cx : cx + cbs]
            sv_b = src_planes[2][cy : cy + cbs, cx : cx + cbs]
            pu_w = WP.warp_block(ref_planes[1], wm, shear, cx, cy,
                                 cbs, cbs, 1, 1, bd)
            pv_w = WP.warp_block(ref_planes[2], wm, shear, cx, cy,
                                 cbs, cbs, 1, 1, bd)
            lu_w, ru_w = _encode_block_np(su_b, pu_w, qindex,
                                          TX_OF_C[bs], bd)
            lv2_w, rv_w = _encode_block_np(sv_b, pv_w, qindex,
                                           TX_OF_C[bs], bd)
            d_w += float(((su_b - ru_w) ** 2).sum()
                         + ((sv_b - rv_w) ** 2).sum())
            r_w += _coeff_bits_np(lu_w) + _coeff_bits_np(lv2_w)
            d_s += float(
                ((su_b - rec_planes[1][cy : cy + cbs,
                                       cx : cx + cbs]) ** 2).sum()
                + ((sv_b - rec_planes[2][cy : cy + cbs,
                                         cx : cx + cbs]) ** 2).sum())
            r_s += (_coeff_bits_np(_leaf_levels(lu, r8, c8, bw8, 4))
                    + _coeff_bits_np(_leaf_levels(lv_, r8, c8, bw8, 4)))
        if d_w + lam * r_w >= d_s + lam * r_s:
            continue
        # flip: patch recon, level cell tiles, tx type, warp map
        nflip += 1
        warp8[r8 : r8 + bh8, c8 : c8 + bw8] = WS.WARPED_CAUSAL
        rec_planes[0][py : py + bs, px : px + bs] = rec_w
        _store_leaf_levels(ly, r8, c8, bw8, 8, lv_w)
        if chroma:
            rec_planes[1][cy : cy + cbs, cx : cx + cbs] = ru_w
            rec_planes[2][cy : cy + cbs, cx : cx + cbs] = rv_w
            _store_leaf_levels(lu, r8, c8, bw8, 4, lu_w)
            _store_leaf_levels(lv_, r8, c8, bw8, 4, lv2_w)
        if txty is not None:
            txty[r8 : r8 + bh8, c8 : c8 + bw8] = 0   # host re-code = DCT
    return (warp8 if nflip else None), nflip


def leaf_skip_cells(sizes: np.ndarray, shapes, ly, lu, lv_) -> np.ndarray:
    """Per-8x8-cell skip map with leaf sharing (the skip flag is coded
    per leaf): cell = True when its LEAF codes no coefficients in any
    plane.  Mirrors the skip derivation the P step fuses in-line."""
    cellz = ((ly == 0).all((-1, -2)) & (lu == 0).all((-1, -2))
             & (lv_ == 0).all((-1, -2)))
    out = np.zeros_like(cellz)
    for r8, c8, bw8, bh8 in leaf_origins(sizes, shapes):
        out[r8 : r8 + bh8, c8 : c8 + bw8] = \
            cellz[r8 : r8 + bh8, c8 : c8 + bw8].all()
    return out


def _leaf_levels(pack: np.ndarray, r8: int, c8: int, k: int,
                 t: int) -> np.ndarray:
    """Stitch a leaf's [k*t, k*t] level grid from its packed cell tiles
    (inverse of inter_encoder._tiles8 for one leaf)."""
    out = np.zeros((k * t, k * t), np.int32)
    for i in range(k):
        for j in range(k):
            out[i * t : (i + 1) * t, j * t : (j + 1) * t] = \
                pack[r8 + i, c8 + j]
    return out


def _store_leaf_levels(pack: np.ndarray, r8: int, c8: int, k: int,
                       t: int, lv: np.ndarray) -> None:
    for i in range(k):
        for j in range(k):
            pack[r8 + i, c8 + j] = lv[i * t : (i + 1) * t,
                                      j * t : (j + 1) * t]
