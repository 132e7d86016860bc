"""Warped motion (local warp / WARPED_CAUSAL): parameter derivation and
the normative warp filter.

AV1's local warp codes NO parameters: the decoder re-derives a per-block
affine model from the causal neighbors' motion field (spec 7.10.2
find_warp_samples + warpEstimation), validates it against the shear
limits (setup_shear), and predicts through the two-stage 8-tap warp
filter (spec 7.11.3.2-7.11.3.7).  Encoder and decoder must therefore run
the exact same integer algorithm; this module is that single
implementation, in numpy (the derivation is a tiny per-block 2x2 integer
least-squares — host work — and warped blocks are rare enough that the
prediction itself also runs host-side, like the loop-restoration
searches).

Reference parity (behavioral, clean-room): find_affine_int /
get_shear_params /root/reference/Source/Lib/Common/Codec/EbWarpedMotion.c:1066/:344,
av1_warp_affine_c :672, sample collection
EbAdaptiveMotionVectorPrediction.c:1490-1715 (av1_find_samples).
Normative tables (spec Warp_Filter 7.11.3.7 + Division lut) are
extracted as data by tools/extract_av1_tables.py.
"""

from __future__ import annotations

import numpy as np

from svt_av1_tpu import tables as _tbl

WARPEDMODEL_PREC_BITS = 16
WARPEDDIFF_PREC_BITS = 10
WARPEDPIXEL_PREC_SHIFTS = 64
WARP_PARAM_REDUCE_BITS = 6
WARPEDMODEL_TRANS_CLAMP = 1 << 23
WARPEDMODEL_NONDIAGAFFINE_CLAMP = 1 << 13
DIV_LUT_BITS = 8
DIV_LUT_PREC_BITS = 14
LEAST_SQUARES_SAMPLES_MAX = 8
LS_MV_MAX = 256
LS_STEP = 8
# identity model (spec default_warp_params)
IDENTITY = (0, 0, 1 << WARPEDMODEL_PREC_BITS, 0, 0,
            1 << WARPEDMODEL_PREC_BITS, 0, 0)


def _round2s(x: int, n: int) -> int:
    """ROUND_POWER_OF_TWO_SIGNED (python ints: exact at any width)."""
    if n == 0:
        return x
    return -((-x + (1 << (n - 1))) >> n) if x < 0 else \
        (x + (1 << (n - 1))) >> n


def _resolve_divisor(d: int) -> tuple[int, int]:
    """spec Division lut: |d| -> (multiplier, shift)."""
    lut = _tbl.spec_tables()["warp_div_lut"]
    shift = d.bit_length() - 1
    e = d - (1 << shift)
    if shift > DIV_LUT_BITS:
        f = _round2s(e, shift - DIV_LUT_BITS)
    else:
        f = e << (DIV_LUT_BITS - shift)
    return int(lut[f]), shift + DIV_LUT_PREC_BITS


def _ls_square(a: int) -> int:
    return (a * a * 4 + a * 4 * LS_STEP + LS_STEP * LS_STEP * 2) >> 4


def _ls_product1(a: int, b: int) -> int:
    return (a * b * 4 + (a + b) * 2 * LS_STEP + LS_STEP * LS_STEP) >> 4


def _ls_product2(a: int, b: int) -> int:
    return (a * b * 4 + (a + b) * 2 * LS_STEP + LS_STEP * LS_STEP * 2) >> 4


def _mult_shift(px: int, idet: int, shift: int, diag: bool) -> int:
    v = _round2s(px * idet, shift)
    if diag:
        lo = (1 << WARPEDMODEL_PREC_BITS) - WARPEDMODEL_NONDIAGAFFINE_CLAMP + 1
        hi = (1 << WARPEDMODEL_PREC_BITS) + WARPEDMODEL_NONDIAGAFFINE_CLAMP - 1
    else:
        lo = -WARPEDMODEL_NONDIAGAFFINE_CLAMP + 1
        hi = WARPEDMODEL_NONDIAGAFFINE_CLAMP - 1
    return max(lo, min(hi, v))


def find_affine_int(pts1, pts2, bw: int, bh: int, mv8, mi_r4: int,
                    mi_c4: int):
    """Integer least-squares affine fit (spec warpEstimation).

    pts1/pts2: [np, 2] int sample pairs in 1/8-pel (source, in-ref);
    bw/bh: block dims in pixels; mv8: (row, col) block MV 1/8-pel;
    mi_r4/mi_c4: block mi position.  Returns wmmat[8] or None.
    """
    mvy, mvx = int(mv8[0]), int(mv8[1])
    a00 = a01 = a11 = bx0 = bx1 = by0 = by1 = 0
    rsuy = max(bh, 8) // 2 - 1
    rsux = max(bw, 8) // 2 - 1
    suy, sux = rsuy * 8, rsux * 8
    duy, dux = suy + mvy, sux + mvx
    isuy = mi_r4 * 4 + rsuy
    isux = mi_c4 * 4 + rsux
    for i in range(len(pts1)):
        dx = int(pts2[i][0]) - dux
        dy = int(pts2[i][1]) - duy
        sx = int(pts1[i][0]) - sux
        sy = int(pts1[i][1]) - suy
        if abs(sx - dx) < LS_MV_MAX and abs(sy - dy) < LS_MV_MAX:
            a00 += _ls_square(sx)
            a01 += _ls_product1(sx, sy)
            a11 += _ls_square(sy)
            bx0 += _ls_product2(sx, dx)
            bx1 += _ls_product1(sy, dx)
            by0 += _ls_product1(sx, dy)
            by1 += _ls_product2(sy, dy)
    det = a00 * a11 - a01 * a01
    if det == 0:
        return None
    idet, shift = _resolve_divisor(abs(det))
    idet *= -1 if det < 0 else 1
    shift -= WARPEDMODEL_PREC_BITS
    if shift < 0:
        idet <<= -shift
        shift = 0
    px0 = a11 * bx0 - a01 * bx1
    px1 = -a01 * bx0 + a00 * bx1
    py0 = a11 * by0 - a01 * by1
    py1 = -a01 * by0 + a00 * by1
    m2 = _mult_shift(px0, idet, shift, True)
    m3 = _mult_shift(px1, idet, shift, False)
    m4 = _mult_shift(py0, idet, shift, False)
    m5 = _mult_shift(py1, idet, shift, True)
    vx = (mvx * (1 << (WARPEDMODEL_PREC_BITS - 3))
          - (isux * (m2 - (1 << WARPEDMODEL_PREC_BITS)) + isuy * m3))
    vy = (mvy * (1 << (WARPEDMODEL_PREC_BITS - 3))
          - (isux * m4 + isuy * (m5 - (1 << WARPEDMODEL_PREC_BITS))))
    m0 = max(-WARPEDMODEL_TRANS_CLAMP, min(WARPEDMODEL_TRANS_CLAMP - 1, vx))
    m1 = max(-WARPEDMODEL_TRANS_CLAMP, min(WARPEDMODEL_TRANS_CLAMP - 1, vy))
    return (m0, m1, m2, m3, m4, m5, 0, 0)


def get_shear_params(wmmat):
    """spec setup_shear: wmmat -> (alpha, beta, gamma, delta) or None."""
    m = wmmat
    if m[2] <= 0:
        return None

    def clamp16(x):
        return max(-32768, min(32767, x))

    alpha = clamp16(m[2] - (1 << WARPEDMODEL_PREC_BITS))
    beta = clamp16(m[3])
    y, shift = _resolve_divisor(abs(m[2]))
    y *= -1 if m[2] < 0 else 1
    v = (m[4] << WARPEDMODEL_PREC_BITS) * y
    gamma = clamp16(_round2s(v, shift))
    v = (m[3] * m[4]) * y
    delta = clamp16(m[5] - _round2s(v, shift)
                    - (1 << WARPEDMODEL_PREC_BITS))
    out = tuple(_round2s(x, WARP_PARAM_REDUCE_BITS)
                * (1 << WARP_PARAM_REDUCE_BITS)
                for x in (alpha, beta, gamma, delta))
    alpha, beta, gamma, delta = out
    if (4 * abs(alpha) + 7 * abs(beta) >= (1 << WARPEDMODEL_PREC_BITS) or
            4 * abs(gamma) + 4 * abs(delta) >= (1 << WARPEDMODEL_PREC_BITS)):
        return None
    return out


def derive_warp(pts1, pts2, bw: int, bh: int, mv8, mi_r4: int, mi_c4: int):
    """find_projection: LS fit + shear validation.  Returns
    (wmmat, shear) or None (fall back to SIMPLE_TRANSLATION)."""
    wm = find_affine_int(pts1, pts2, bw, bh, mv8, mi_r4, mi_c4)
    if wm is None:
        return None
    sh = get_shear_params(wm)
    if sh is None:
        return None
    return wm, sh


def warp_block(ref: np.ndarray, wmmat, shear, px0: int, py0: int,
               w: int, h: int, ss_x: int, ss_y: int, bd: int = 8
               ) -> np.ndarray:
    """Normative warp prediction (spec 7.11.3.2-7.11.3.5, non-compound).

    ref: the full reference PLANE (this plane's subsampling), unpadded —
    the filter clamps coordinates to its edges (spec uses frame-edge
    clamping, not edge padding).  (px0, py0): block origin in THIS
    plane's pixels; w, h: block dims here (multiples of 8).
    Returns [h, w] int32 prediction.
    """
    filt = _tbl.spec_tables()["warped_filter"]
    alpha, beta, gamma, delta = shear
    height, width = ref.shape
    refi = ref.astype(np.int64)
    pred = np.zeros((h, w), np.int32)
    round0 = 3
    reduce_bits_horiz = round0 + max(bd + 7 - round0 - 14, 0)
    reduce_bits_vert = 2 * 7 - reduce_bits_horiz
    offset_bits_horiz = bd + 7 - 1
    offset_bits_vert = bd + 2 * 7 - reduce_bits_horiz
    sub = (1 << (bd - 1)) + (1 << bd)
    hi = (1 << bd) - 1
    ks = np.arange(-7, 8)
    for bi in range(0, h, 8):
        for bj in range(0, w, 8):
            i, j = py0 + bi, px0 + bj
            src_x = (j + 4) << ss_x
            src_y = (i + 4) << ss_y
            dst_x = wmmat[2] * src_x + wmmat[3] * src_y + wmmat[0]
            dst_y = wmmat[4] * src_x + wmmat[5] * src_y + wmmat[1]
            x4 = dst_x >> ss_x
            y4 = dst_y >> ss_y
            ix4 = x4 >> WARPEDMODEL_PREC_BITS
            sx4 = x4 & ((1 << WARPEDMODEL_PREC_BITS) - 1)
            iy4 = y4 >> WARPEDMODEL_PREC_BITS
            sy4 = y4 & ((1 << WARPEDMODEL_PREC_BITS) - 1)
            sx4 += alpha * (-4) + beta * (-4)
            sy4 += gamma * (-4) + delta * (-4)
            sx4 &= ~((1 << WARP_PARAM_REDUCE_BITS) - 1)
            sy4 &= ~((1 << WARP_PARAM_REDUCE_BITS) - 1)
            # horizontal pass -> tmp[15, 8]
            iy = np.clip(iy4 + ks, 0, height - 1)            # [15]
            ls = np.arange(-4, 4)
            sx = sx4 + beta * (ks + 4)[:, None] + alpha * (ls + 4)[None, :]
            offs = ((sx + (1 << (WARPEDDIFF_PREC_BITS - 1)))
                    >> WARPEDDIFF_PREC_BITS) + WARPEDPIXEL_PREC_SHIFTS
            coeff = filt[offs]                               # [15, 8, 8taps]
            ix = ix4 + ls[None, :, None] - 3 + np.arange(8)[None, None, :]
            sample_x = np.clip(ix, 0, width - 1)             # [1, 8, 8]
            rows = refi[iy[:, None, None], sample_x]         # [15, 8, 8]
            tmp = (rows * coeff).sum(-1) + (1 << offset_bits_horiz)
            tmp = (tmp + (1 << (reduce_bits_horiz - 1))) >> reduce_bits_horiz
            # vertical pass
            ks4 = np.arange(-4, 4)
            sy = sy4 + delta * (ks4 + 4)[:, None] + gamma * (ls + 4)[None, :]
            offs = ((sy + (1 << (WARPEDDIFF_PREC_BITS - 1)))
                    >> WARPEDDIFF_PREC_BITS) + WARPEDPIXEL_PREC_SHIFTS
            coeffv = filt[offs]                              # [8, 8, 8taps]
            # tmp window per (k, l): rows k+m+4, col l+4
            win = np.stack([tmp[m : m + 8] for m in range(8)], -1)  # [8,8,8]
            s = (win * coeffv).sum(-1) + (1 << offset_bits_vert)
            s = (s + (1 << (reduce_bits_vert - 1))) >> reduce_bits_vert
            pred[bi : bi + 8, bj : bj + 8] = np.clip(s - sub, 0, hi)
    return pred
