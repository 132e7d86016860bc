"""Intra prediction — batched JAX (encoder) + numpy twin (mirror decoder).

v1 mode set: DC, V, H, SMOOTH, PAETH (spec §7.11.2).  Edge preparation
follows the spec fill rules: missing above row -> left[0] (or base-1 if no
left), missing left col -> above[0] (or base+1), corner fallbacks.

TPU shape: predictions for a whole wavefront batch of same-size blocks are
computed for ALL candidate modes at once ([B, M, H, W]) and selected by
distortion — the reference's per-candidate fast loop
(perform_fast_loop, EbProductCodingLoop.c:1152) becomes one fused tensor
program.  Ref parity: EbIntraPrediction.c:132-142 (mode table), smooth
weights (spec data, also ASM_AVX2/EbIntraPrediction_AVX2.h:19).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# spec Sm_Weights_Tx (indexed by block dim)
SM_WEIGHTS = {
    4: np.array([255, 149, 85, 64], np.int32),
    8: np.array([255, 197, 146, 105, 73, 50, 37, 32], np.int32),
    16: np.array([255, 225, 196, 170, 145, 123, 102, 84, 68, 54, 43, 33,
                  26, 20, 17, 16], np.int32),
    32: np.array([255, 240, 225, 210, 196, 182, 169, 157, 145, 133, 122, 111,
                  101, 92, 83, 74, 66, 59, 52, 45, 39, 34, 29, 25, 21, 17, 14,
                  12, 10, 9, 8, 8], np.int32),
    64: np.array([255, 248, 240, 233, 225, 218, 210, 203, 196, 189, 182, 176,
                  169, 163, 156, 150, 144, 138, 133, 127, 121, 116, 111, 106,
                  101, 96, 91, 86, 82, 77, 73, 69, 65, 61, 57, 54, 50, 47, 44,
                  41, 38, 35, 32, 29, 27, 25, 22, 20, 18, 16, 15, 13, 12, 10,
                  9, 8, 7, 6, 6, 5, 5, 4, 4, 4], np.int32),
}

# mode ids (must match entropy.syntax enum)
DC, V, H, SMOOTH, PAETH = 0, 1, 2, 9, 12
V1_MODES = (DC, V, H, SMOOTH, PAETH)


def prepare_edges(above, left, topleft, have_above, have_left, bd: int = 8):
    """Spec edge fill for batched blocks.

    above: [B, W], left: [B, H], topleft: [B], have_*: [B] bool.
    Returns filled (above, left, topleft) int32.
    """
    xp = np if isinstance(above, np.ndarray) else jnp
    base = 1 << (bd - 1)
    ha = have_above[:, None]
    hl = have_left[:, None]
    above_f = xp.where(ha, above,
                       xp.where(hl, left[:, :1], base - 1))
    left_f = xp.where(hl, left,
                      xp.where(ha, above[:, :1], base + 1))
    tl = xp.where(have_above & have_left, topleft,
                  xp.where(have_above, above[:, 0],
                           xp.where(have_left, left[:, 0], base)))
    return above_f, left_f, tl


def predict_all_modes(above, left, topleft, have_above, have_left,
                      h: int, w: int, bd: int = 8):
    """All v1 mode predictions for a batch: returns [B, 5, h, w] int32.

    Order matches V1_MODES.
    """
    xp = np if isinstance(above, np.ndarray) else jnp
    B = above.shape[0]
    above, left, tl = prepare_edges(above, left, topleft,
                                    have_above, have_left, bd)
    a = above[:, None, :]          # [B, 1, W]
    l = left[:, :, None]           # [B, H, 1]
    ones = xp.ones((B, h, w), jnp.int32 if xp is jnp else np.int32)

    # DC (spec: sums over available edges only)
    s_a = above.sum(axis=1)
    s_l = left.sum(axis=1)
    both = have_above & have_left
    dc = xp.where(
        both, (s_a + s_l + ((w + h) >> 1)) // (w + h),
        xp.where(have_above, (s_a + (w >> 1)) >> int(np.log2(w)),
                 xp.where(have_left, (s_l + (h >> 1)) >> int(np.log2(h)),
                          1 << (bd - 1))))
    dc_pred = dc[:, None, None] * ones

    v_pred = a * ones
    h_pred = l * ones

    # SMOOTH
    wy = SM_WEIGHTS[h][None, :, None]   # [1, H, 1]
    wx = SM_WEIGHTS[w][None, None, :]   # [1, 1, W]
    below = left[:, -1][:, None, None]
    right = above[:, -1][:, None, None]
    sm = (wy * a + (256 - wy) * below + wx * l + (256 - wx) * right + 256) >> 9

    # PAETH
    base = a + l - tl[:, None, None]
    pa = abs(base - a)
    pl = abs(base - l)
    ptl = abs(base - tl[:, None, None])
    paeth = xp.where((pl <= pa) & (pl <= ptl), l * ones,
                     xp.where(pa <= ptl, a * ones,
                              tl[:, None, None] * ones))

    return xp.stack([dc_pred, v_pred, h_pred, sm, paeth], axis=1)


def predict_block_np(mode: int, above: np.ndarray, left: np.ndarray,
                     topleft: int, have_above: bool, have_left: bool,
                     h: int, w: int, bd: int = 8) -> np.ndarray:
    """Single-block numpy prediction (mirror decoder)."""
    preds = predict_all_modes(
        above[None].astype(np.int32), left[None].astype(np.int32),
        np.array([topleft], np.int32), np.array([have_above]),
        np.array([have_left]), h, w, bd)
    idx = {DC: 0, V: 1, H: 2, SMOOTH: 3, PAETH: 4}[mode]
    return preds[0, idx]
