"""Device-side P-frame encoder: batched ME + MC + transform coding.

Unlike intra (wavefront-ordered), inter prediction has NO intra-frame
dependency: every block predicts from the previous reconstructed frame.
The whole P-frame therefore encodes as ONE bulk-parallel device program —
the TPU-native answer to the reference's EncDec wavefront + ME segment
pools (EbEncDecProcess.c:1448, EbMotionEstimationProcess.c:374).

Motion is quarter-pel (AV1 low-precision MVs): exhaustive full-pel SAD
search, then half- and quarter-pel refinement against subpel-phase plane
banks (ops.mc.phase_bank) — whole-plane 8-tap convs once per frame
(XLA CSE shares the horizontal intermediates), then per-block gathers.
This replaces the reference's per-block HalfPelSearch_LCU /
QuarterPelSearch_LCU (EbMotionEstimation.c:3829/:4746) with dense
tensor ops.  Chroma (1/8-pel positions under quarter-pel luma MVs) uses
an eighth-pel bank.

v1 scope: uniform 8x8 luma blocks (4x4 chroma), NEWMV over one LAST
reference, DCT residuals, CQP.
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
PAD = SEARCH_RANGE + 1  # +1: subpel refinement can cross one more pel


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


def _gather_bank(bank, py_idx, px_idx, off_r, off_c, bs: int, pad: int):
    """Per-block gather from a phase bank [n,n,H+2p,W+2p]."""
    nbh, nbw = off_r.shape
    base_r = jnp.arange(nbh)[:, None] * bs + pad + off_r
    base_c = jnp.arange(nbw)[None, :] * bs + pad + off_c
    rr = base_r[:, :, None, None] + jnp.arange(bs)[None, None, :, None]
    cc = base_c[:, :, None, None] + jnp.arange(bs)[None, None, None, :]
    return bank[py_idx[:, :, None, None], px_idx[:, :, None, None], rr, cc]


def _mc_luma(bank, mv8, pad: int):
    """Quarter-pel luma MC from the 4x4 phase bank; mv8 in 1/8 pel (even)."""
    frac16_r = (mv8[..., 0] * 2) & 15
    frac16_c = (mv8[..., 1] * 2) & 15
    return _gather_bank(bank, frac16_r >> 2, frac16_c >> 2,
                        mv8[..., 0] >> 3, mv8[..., 1] >> 3, LUMA_BS, pad)


def _mc_chroma(bank, mv8, pad: int):
    """Eighth-pel chroma MC; chroma 1/16-pel frac == mv8 & 15 (4:2:0)."""
    frac_r = mv8[..., 0] & 15
    frac_c = mv8[..., 1] & 15
    return _gather_bank(bank, frac_r >> 1, frac_c >> 1,
                        mv8[..., 0] >> 4, mv8[..., 1] >> 4, CHROMA_BS, pad)


def _subpel_refine(src_blocks, bank, mv8, sad, pad: int):
    """Half- then quarter-pel 8-neighbor refinement (ref
    HalfPelSearch_LCU / QuarterPelSearch_LCU, batched over all blocks)."""
    for step in (4, 2):
        base = mv8  # neighbors of the step-start best (bounds total drift)
        for dy in (-step, 0, step):
            for dx in (-step, 0, step):
                if dy == 0 and dx == 0:
                    continue
                cand = base + jnp.array([dy, dx], jnp.int32)
                pred = _mc_luma(bank, cand, pad)
                s = jnp.abs(src_blocks - pred).sum((-1, -2))
                better = s < sad
                sad = jnp.where(better, s, sad)
                mv8 = jnp.where(better[..., None], cand, mv8)
    return mv8, sad


def p_frame_step(ph: int, pw: int, qindex: int, search: int = SEARCH_RANGE):
    """Build the (unjitted) P-frame encode step for padded geometry.

    fn(src_y [ph,pw], src_u, src_v [ph/2,pw/2], ref_y, ref_u, ref_v)
    -> (mv8 [nbh,nbw,2] int16 1/8-pel (quarter-pel granularity),
        levels_y [nbh,nbw,8,8] i16, levels_u, levels_v [nbh,nbw,4,4] i16,
        recon_y [ph,pw] u8, recon_u, recon_v)
    """
    pad = search + 1

    def step(sy, su, sv, ry, ru, rv):
        sy = sy.astype(jnp.int32)
        su = su.astype(jnp.int32)
        sv = sv.astype(jnp.int32)
        ry = ry.astype(jnp.int32)
        ru = ru.astype(jnp.int32)
        rv = rv.astype(jnp.int32)

        # full-pel exhaustive SAD
        ref_pad = jnp.pad(ry, search, mode="edge")
        mv_fp, sad = ME.fullpel_search(sy, ref_pad, LUMA_BS, search)

        # subpel refinement on the quarter-pel bank
        bank_y = MC.phase_bank(jnp, MC.pad_for_filter(jnp, ry, pad), 4)
        src_y_blocks = _block(sy, LUMA_BS)
        mv8, _ = _subpel_refine(src_y_blocks, bank_y, mv_fp * 8, sad, pad)

        pred_y = _mc_luma(bank_y, mv8, pad)
        ly, rec_y = _encode_plane(src_y_blocks, pred_y, qindex, T.TX_8X8)

        cpad = pad // 2 + 1
        bank_u = MC.phase_bank(jnp, MC.pad_for_filter(jnp, ru, cpad), 2)
        bank_v = MC.phase_bank(jnp, MC.pad_for_filter(jnp, rv, cpad), 2)
        lu, rec_u = _encode_plane(_block(su, CHROMA_BS),
                                  _mc_chroma(bank_u, mv8, cpad), qindex,
                                  T.TX_4X4)
        lv, rec_v = _encode_plane(_block(sv, CHROMA_BS),
                                  _mc_chroma(bank_v, mv8, cpad), qindex,
                                  T.TX_4X4)

        return (mv8.astype(jnp.int16),
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
