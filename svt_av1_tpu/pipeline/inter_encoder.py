"""Device-side P-frame encoder: batched ME + MC + transform coding.

Unlike intra (wavefront-ordered), inter prediction has NO intra-frame
dependency: every block predicts from the previous reconstructed frame.
The whole P-frame therefore encodes as ONE bulk-parallel device program —
the TPU-native answer to the reference's EncDec wavefront + ME segment
pools (EbEncDecProcess.c:1448, EbMotionEstimationProcess.c:374).

v1 scope: uniform 8x8 luma blocks (4x4 chroma), full-pel NEWMV motion
over one LAST reference, DCT residuals, CQP.  Chroma MVs land on
half-pel positions; those are motion-compensated by gathering from
whole-plane pre-filtered phase planes (ops.mc.halfpel_planes) — dense
convs once per frame, then pure gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from svt_av1_tpu.ops import mc as MC
from svt_av1_tpu.ops import me as ME
from svt_av1_tpu.ops import quant as Q
from svt_av1_tpu.ops import transforms as T

LUMA_BS = 8
CHROMA_BS = 4
SEARCH_RANGE = 16   # full-pel luma search window (+-R)


def _block(plane, bs: int):
    h, w = plane.shape
    return plane.reshape(h // bs, bs, w // bs, bs).transpose(0, 2, 1, 3)


def _unblock(blocks):
    nbh, nbw, bs, _ = blocks.shape
    return blocks.transpose(0, 2, 1, 3).reshape(nbh * bs, nbw * bs)


def _encode_plane(src_blocks, pred_blocks, qindex: int, tx_size: int):
    nbh, nbw, bs, _ = src_blocks.shape
    resid = (src_blocks - pred_blocks).reshape(-1, bs, bs)
    coeff = T.fwd_txfm2d_batch_exact(resid, tx_size, T.DCT_DCT)
    levels = Q.quantize_batch(coeff, qindex, tx_size)
    dq = Q.dequantize_batch(levels, qindex, tx_size)
    rec = T.inv_txfm2d_batch(dq, tx_size, T.DCT_DCT)
    recon = jnp.clip(pred_blocks + rec.reshape(nbh, nbw, bs, bs), 0, 255)
    return levels.reshape(nbh, nbw, bs, bs), recon


def _mc_chroma(ref_plane, mv_luma, cpad: int):
    """Half-pel chroma MC: 4 phase planes + per-block plane-select gather.

    mv_luma is full-pel luma units; the chroma offset is mv/2 with a
    half-pel fraction when mv is odd (spec motion-vector scaling for
    4:2:0; ref av1_convolve subpel_q4 derivation)."""
    planes = MC.halfpel_planes(jnp, MC.pad_for_filter(jnp, ref_plane, cpad))
    phase = (mv_luma[..., 0] & 1) * 2 + (mv_luma[..., 1] & 1)   # [nbh, nbw]
    off_r = mv_luma[..., 0] >> 1
    off_c = mv_luma[..., 1] >> 1
    nbh, nbw = phase.shape
    bs = CHROMA_BS
    base_r = jnp.arange(nbh)[:, None] * bs + cpad + off_r
    base_c = jnp.arange(nbw)[None, :] * bs + cpad + off_c
    rr = base_r[:, :, None, None] + jnp.arange(bs)[None, None, :, None]
    cc = base_c[:, :, None, None] + jnp.arange(bs)[None, None, None, :]
    pp = phase[:, :, None, None]
    return planes[pp, rr, cc]


def p_frame_step(ph: int, pw: int, qindex: int, search: int = SEARCH_RANGE):
    """Build the (unjitted) P-frame encode step for padded geometry.

    fn(src_y [ph,pw], src_u, src_v [ph/2,pw/2], ref_y, ref_u, ref_v)
    -> (mv [nbh,nbw,2] int8 full-pel, levels_y [nbh,nbw,8,8] i16,
        levels_u, levels_v [nbh,nbw,4,4] i16,
        recon_y [ph,pw] u8, recon_u, recon_v)
    """
    cpad = search // 2 + 1

    def step(sy, su, sv, ry, ru, rv):
        sy = sy.astype(jnp.int32)
        su = su.astype(jnp.int32)
        sv = sv.astype(jnp.int32)
        ry = ry.astype(jnp.int32)
        ru = ru.astype(jnp.int32)
        rv = rv.astype(jnp.int32)

        ref_pad = jnp.pad(ry, search, mode="edge")
        mv, _sad = ME.fullpel_search(sy, ref_pad, LUMA_BS, search)
        pred_y = ME.gather_blocks(ref_pad, mv, LUMA_BS, search)
        ly, rec_y = _encode_plane(_block(sy, LUMA_BS), pred_y, qindex,
                                  T.TX_8X8)

        pred_u = _mc_chroma(ru, mv, cpad)
        pred_v = _mc_chroma(rv, mv, cpad)
        lu, rec_u = _encode_plane(_block(su, CHROMA_BS), pred_u, qindex,
                                  T.TX_4X4)
        lv, rec_v = _encode_plane(_block(sv, CHROMA_BS), pred_v, qindex,
                                  T.TX_4X4)

        return (mv.astype(jnp.int8),
                ly.astype(jnp.int16), lu.astype(jnp.int16),
                lv.astype(jnp.int16),
                _unblock(rec_y).astype(jnp.uint8),
                _unblock(rec_u).astype(jnp.uint8),
                _unblock(rec_v).astype(jnp.uint8))

    return step


@functools.lru_cache(maxsize=8)
def build_p_frame_encoder(ph: int, pw: int, qindex: int,
                          search: int = SEARCH_RANGE):
    return jax.jit(p_frame_step(ph, pw, qindex, search))


def mc_chroma_np(ref_plane: np.ndarray, mv_luma: np.ndarray, bs: int = 4
                 ) -> np.ndarray:
    """Numpy twin of _mc_chroma for the mirror decoder (bit-identical)."""
    cpad = SEARCH_RANGE // 2 + 1
    planes = MC.halfpel_planes(np, MC.pad_for_filter(np, ref_plane, cpad))
    nbh, nbw = mv_luma.shape[:2]
    out = np.zeros((nbh, nbw, bs, bs), np.int32)
    for i in range(nbh):
        for j in range(nbw):
            mr, mcol = int(mv_luma[i, j, 0]), int(mv_luma[i, j, 1])
            ph_idx = (mr & 1) * 2 + (mcol & 1)
            r0 = i * bs + cpad + (mr >> 1)
            c0 = j * bs + cpad + (mcol >> 1)
            out[i, j] = planes[ph_idx][r0 : r0 + bs, c0 : c0 + bs]
    return out
