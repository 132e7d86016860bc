"""Film grain synthesis (spec 7.18.3; ref grainSynthesis.c).

Display-side only: grain is added to the OUTPUT picture, never to the
prediction loop, so coding recon stays grain-free.  Both the decoder's
output stage and tests share this one implementation.

Synthesis of the grain templates, scaling LUTs, the coupled chroma AR
process, stripe/block noise-image assembly with overlap blending
(spec 7.18.3.9/7.18.3.10), and the scaling application are spec-exact.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from svt_av1_tpu import tables

GAUSS_BITS = 11


@dataclass
class FilmGrainParams:
    """spec film_grain_params(); ref aom_film_grain_t."""
    apply_grain: bool = False
    random_seed: int = 0
    num_y_points: int = 0
    scaling_points_y: tuple = ()     # ((x, scale), ...)
    chroma_scaling_from_luma: bool = False
    num_cb_points: int = 0
    scaling_points_cb: tuple = ()
    num_cr_points: int = 0
    scaling_points_cr: tuple = ()
    scaling_shift: int = 8           # 8..11
    ar_coeff_lag: int = 0            # 0..3
    ar_coeffs_y: tuple = ()          # signed, 2*lag*(lag+1)
    ar_coeffs_cb: tuple = ()         # + 1 luma-coupling tap when y points
    ar_coeffs_cr: tuple = ()
    ar_coeff_shift: int = 6          # 6..9
    grain_scale_shift: int = 0
    cb_mult: int = 128
    cb_luma_mult: int = 192
    cb_offset: int = 256
    cr_mult: int = 128
    cr_luma_mult: int = 192
    cr_offset: int = 256
    overlap_flag: bool = False
    clip_to_restricted_range: bool = False


class _Lfsr:
    """16-bit LFSR (ref get_random_number / init_random_generator)."""

    def __init__(self, seed: int) -> None:
        self.reg = seed & 0xFFFF

    def reseed_line(self, luma_line: int, seed: int) -> None:
        self.reg = seed & 0xFFFF
        luma_num = luma_line >> 5
        self.reg ^= ((luma_num * 37 + 178) & 255) << 8
        self.reg ^= (luma_num * 173 + 105) & 255

    def bits(self, n: int) -> int:
        r = self.reg
        bit = ((r >> 0) ^ (r >> 1) ^ (r >> 3) ^ (r >> 12)) & 1
        self.reg = ((r >> 1) | (bit << 15)) & 0xFFFF
        return (self.reg >> (16 - n)) & ((1 << n) - 1)


def _pred_pos(lag: int):
    pos = []
    for row in range(-lag, 0):
        for col in range(-lag, lag + 1):
            pos.append((row, col, 0))
    for col in range(-lag, 0):
        pos.append((0, col, 0))
    return pos


def _gen_grain(params: FilmGrainParams, bit_depth: int = 8):
    """Returns (luma_block, cb_block, cr_block) int32 template arrays
    (luma 73x82; chroma 44x44 at 4:2:0) with their strides implicit."""
    g = tables.spec_tables()["gaussian_sequence"]
    lag = params.ar_coeff_lag
    gss = 12 - bit_depth + params.grain_scale_shift
    half = (1 << gss) >> 1
    grain_min = -(128 << (bit_depth - 8))
    grain_max = (256 << (bit_depth - 8)) - 1 - (128 << (bit_depth - 8))
    top = left = 3
    ar_pad = 3
    ly = top + 2 * ar_pad + 64                    # 73
    lx = left + 2 * ar_pad + 64 + 2 * ar_pad + 3  # 82
    cy = top + ar_pad + 32                        # 38
    cx = left + ar_pad + 32 + ar_pad + 3          # 44
    rnd = _Lfsr(params.random_seed)
    pos = _pred_pos(lag)
    rnd_off = 1 << (params.ar_coeff_shift - 1)

    luma = np.zeros((ly, lx), np.int32)
    if params.num_y_points > 0:
        for i in range(ly):
            for j in range(lx):
                luma[i, j] = (g[rnd.bits(GAUSS_BITS)] + half) >> gss
        for i in range(top, ly):
            for j in range(left, lx - 3):
                w = 0
                for (dr, dc, _) in pos:
                    w += params.ar_coeffs_y[pos.index((dr, dc, 0))] * \
                        luma[i + dr, j + dc]
                luma[i, j] = np.clip(
                    luma[i, j] + ((w + rnd_off) >> params.ar_coeff_shift),
                    grain_min, grain_max)

    cb = np.zeros((cy, cx), np.int32)
    cr = np.zeros((cy, cx), np.int32)
    do_cb = params.num_cb_points or params.chroma_scaling_from_luma
    do_cr = params.num_cr_points or params.chroma_scaling_from_luma
    if do_cb:
        rnd.reseed_line(7 << 5, params.random_seed)
        for i in range(cy):
            for j in range(cx):
                cb[i, j] = (g[rnd.bits(GAUSS_BITS)] + half) >> gss
    if do_cr:
        rnd.reseed_line(11 << 5, params.random_seed)
        for i in range(cy):
            for j in range(cx):
                cr[i, j] = (g[rnd.bits(GAUSS_BITS)] + half) >> gss
    if do_cb or do_cr:
        for i in range(top, cy):
            for j in range(left, cx - 3):
                wcb = wcr = 0
                for k, (dr, dc, _) in enumerate(pos):
                    if do_cb:
                        wcb += params.ar_coeffs_cb[k] * cb[i + dr, j + dc]
                    if do_cr:
                        wcr += params.ar_coeffs_cr[k] * cr[i + dr, j + dc]
                if params.num_y_points > 0:
                    yly = ((i - top) << 1) + top
                    ylx = ((j - left) << 1) + left
                    av = (int(luma[yly : yly + 2, ylx : ylx + 2].sum())
                          + 2) >> 2
                    if do_cb:
                        wcb += params.ar_coeffs_cb[len(pos)] * av
                    if do_cr:
                        wcr += params.ar_coeffs_cr[len(pos)] * av
                if do_cb:
                    cb[i, j] = np.clip(
                        cb[i, j] + ((wcb + rnd_off)
                                    >> params.ar_coeff_shift),
                        grain_min, grain_max)
                if do_cr:
                    cr[i, j] = np.clip(
                        cr[i, j] + ((wcr + rnd_off)
                                    >> params.ar_coeff_shift),
                        grain_min, grain_max)
    return luma, cb, cr


def _scaling_lut(points, num: int) -> np.ndarray:
    lut = np.zeros(256, np.int32)
    if num == 0:
        return lut
    lut[: points[0][0]] = points[0][1]
    for p in range(num - 1):
        dy = points[p + 1][1] - points[p][1]
        dx = points[p + 1][0] - points[p][0]
        delta = dy * ((65536 + (dx >> 1)) // dx)
        for x in range(dx):
            lut[points[p][0] + x] = points[p][1] + ((x * delta + 32768)
                                                    >> 16)
    lut[points[num - 1][0] :] = points[num - 1][1]
    return lut


def _noise_planes(params: FilmGrainParams, h: int, w: int,
                  bit_depth: int = 8):
    """Synthesize the per-plane noise images (spec 7.18.3.9 noise
    stripes + 7.18.3.10 noise image, incl. overlap blending).

    Stripes are 34 luma rows tall advancing 32 (17/16 chroma at 4:2:0);
    blocks 34 luma cols wide advancing 32.  With overlap_flag the 2
    shared luma cols/rows (1 chroma) blend old/new with 27/17 + 17/27
    (23/22 chroma) weights at >>5 (ref grainSynthesis.c).  Without
    overlap later writes simply win — identical to disjoint 32x32
    blocks.  Returns (ny [h,w], ncb, ncr [h/2,w/2]) int32.
    """
    luma_g, cb_g, cr_g = _gen_grain(params, bit_depth)
    gmin = -(128 << (bit_depth - 8))
    gmax = (256 << (bit_depth - 8)) - 1 - (128 << (bit_depth - 8))
    hc, wc = (h + 1) // 2, (w + 1) // 2
    do_y = params.num_y_points > 0
    do_cb = bool(params.num_cb_points or params.chroma_scaling_from_luma)
    do_cr = bool(params.num_cr_points or params.chroma_scaling_from_luma)
    ny = np.zeros((h, w), np.int32)
    ncb = np.zeros((hc, wc), np.int32)
    ncr = np.zeros((hc, wc), np.int32)
    rnd = _Lfsr(params.random_seed)
    ov = params.overlap_flag

    def hblend(stripe, x0, new, cols, w_old, w_new):
        """Blend `cols` leading columns of `new` into stripe at x0."""
        for j in range(cols):
            if j >= new.shape[1]:
                return
            old = stripe[: new.shape[0], x0 + j]
            new[:, j] = np.clip((old * w_old[j] + new[:, j] * w_new[j]
                                 + 16) >> 5, gmin, gmax)

    for by in range(0, h, 32):
        rnd.reseed_line(by, params.random_seed)
        st_y = np.zeros((34, w), np.int32)
        st_cb = np.zeros((17, wc), np.int32)
        st_cr = np.zeros((17, wc), np.int32)
        for bx in range(0, w, 32):
            off = rnd.bits(8)
            ox = (off >> 4) & 15
            oy = off & 15
            if do_y:
                jn = min(34, w - bx)
                g = luma_g[9 + 2 * oy : 9 + 2 * oy + 34,
                           9 + 2 * ox : 9 + 2 * ox + jn].copy()
                if ov and bx > 0:
                    hblend(st_y, bx, g, 2, (27, 17), (17, 27))
                st_y[:, bx : bx + jn] = g
            if do_cb or do_cr:
                bxc = bx // 2
                jn = min(17, wc - bxc)
                for do, tmpl, st in ((do_cb, cb_g, st_cb),
                                     (do_cr, cr_g, st_cr)):
                    if not do:
                        continue
                    g = tmpl[6 + oy : 6 + oy + 17,
                             6 + ox : 6 + ox + jn].copy()
                    if ov and bxc > 0:
                        hblend(st, bxc, g, 1, (23,), (22,))
                    st[:, bxc : bxc + jn] = g
        # merge the stripe into the noise image (vertical overlap rows)
        rows = min(34, h - by)
        for i in range(rows):
            if ov and by > 0 and i < 2:
                wo, wn = ((27, 17), (17, 27))[i]
                ny[by + i] = np.clip(
                    (ny[by + i] * wo + st_y[i] * wn + 16) >> 5, gmin, gmax)
            elif do_y:
                ny[by + i] = st_y[i]
        byc = by // 2
        rows_c = min(17, hc - byc)
        for i in range(rows_c):
            if ov and byc > 0 and i < 1:
                for do, st, im in ((do_cb, st_cb, ncb), (do_cr, st_cr,
                                                         ncr)):
                    if do:
                        im[byc + i] = np.clip(
                            (im[byc + i] * 23 + st[i] * 22 + 16) >> 5,
                            gmin, gmax)
            else:
                if do_cb:
                    ncb[byc + i] = st_cb[i]
                if do_cr:
                    ncr[byc + i] = st_cr[i]
    return ny, ncb, ncr


def _scale_lut_vals(lut: np.ndarray, idx: np.ndarray, bit_depth: int):
    """spec 7.18.3.5 scale_lut: direct lookup at 8-bit; at 10-bit the
    256-entry LUT is indexed at idx>>2 with Round2 interpolation on the
    2-bit remainder (x == 255 pins to the last entry)."""
    if bit_depth == 8:
        return lut[idx]
    shift = bit_depth - 8
    x = idx >> shift
    rem = idx - (x << shift)
    base = lut[x]
    nxt = lut[np.minimum(x + 1, 255)]
    interp = base + (((nxt - base) * rem + (1 << (shift - 1))) >> shift)
    return np.where(x == 255, base, interp)


def apply_grain(params: FilmGrainParams, y: np.ndarray, u: np.ndarray,
                v: np.ndarray, bit_depth: int = 8):
    """Add grain to an 8/10-bit 4:2:0 output picture (spec 7.18.3, incl.
    overlap blending).  Returns new (y, u, v) uint8/uint16 arrays."""
    if not params.apply_grain:
        return y, u, v
    h, w = y.shape
    ny, ncb, ncr = _noise_planes(params, h, w, bit_depth)
    lut_y = _scaling_lut(params.scaling_points_y, params.num_y_points)
    if params.chroma_scaling_from_luma:
        lut_cb = lut_cr = lut_y
    else:
        lut_cb = _scaling_lut(params.scaling_points_cb,
                              params.num_cb_points)
        lut_cr = _scaling_lut(params.scaling_points_cr,
                              params.num_cr_points)
    yy = y.astype(np.int32)
    uu = u.astype(np.int32).copy()
    vv = v.astype(np.int32).copy()

    cb_mult = params.cb_mult - 128
    cb_lmult = params.cb_luma_mult - 128
    cb_off = params.cb_offset - 256
    cr_mult = params.cr_mult - 128
    cr_lmult = params.cr_luma_mult - 128
    cr_off = params.cr_offset - 256
    if params.chroma_scaling_from_luma:
        cb_mult, cb_lmult, cb_off = 0, 64, 0
        cr_mult, cr_lmult, cr_off = 0, 64, 0
    r_off = 1 << (params.scaling_shift - 1)
    up = bit_depth - 8
    if params.clip_to_restricted_range:
        lmin, lmax = 16 << up, 235 << up
        cmin, cmax = 16 << up, 240 << up
    else:
        lmin = cmin = 0
        lmax = cmax = (1 << bit_depth) - 1

    # chroma scaling indexes the UN-grained luma (spec add_noise block
    # order; advisor round-1 fix) — the two-pass structure reads the
    # original ``yy`` throughout
    if params.num_cb_points or params.num_cr_points \
            or params.chroma_scaling_from_luma:
        ly = yy[: (h & ~1), : (w & ~1)]
        avg = (ly[::2, ::2] + ly[::2, 1::2] + 1) >> 1
        for pl, lut, nz, m, lm, o, do in (
                (uu, lut_cb, ncb, cb_mult, cb_lmult, cb_off,
                 params.num_cb_points or params.chroma_scaling_from_luma),
                (vv, lut_cr, ncr, cr_mult, cr_lmult, cr_off,
                 params.num_cr_points or params.chroma_scaling_from_luma)):
            if not do:
                continue
            hc, wc = avg.shape
            pc = pl[:hc, :wc]
            idx = np.clip(((avg * lm + m * pc) >> 6) + (o << up),
                          0, (256 << up) - 1)
            pl[:hc, :wc] = np.clip(
                pc + ((_scale_lut_vals(lut, idx, bit_depth) * nz[:hc, :wc]
                       + r_off) >> params.scaling_shift), cmin, cmax)
    if params.num_y_points:
        yy = np.clip(yy + ((_scale_lut_vals(lut_y, yy, bit_depth) * ny
                            + r_off) >> params.scaling_shift), lmin, lmax)
    dt = np.uint8 if bit_depth == 8 else np.uint16
    return (yy.astype(dt), uu.astype(dt), vv.astype(dt))


def preset_params(level: int, seed: int = 7391) -> FilmGrainParams:
    """Built-in grain preset scaled by level 1..50 (the reference's
    film-grain-denoise path estimates these from source; the TPU build
    ships a parameterized table until the estimator lands)."""
    s = max(1, min(int(level), 50))
    pk = min(255, 4 + s * 2)
    return FilmGrainParams(
        apply_grain=True, random_seed=seed,
        num_y_points=2, scaling_points_y=((0, pk), (255, max(2, pk // 2))),
        num_cb_points=2,
        scaling_points_cb=((0, pk // 2), (255, max(1, pk // 4))),
        num_cr_points=2,
        scaling_points_cr=((0, pk // 2), (255, max(1, pk // 4))),
        scaling_shift=8 + (s > 32),
        ar_coeff_lag=1,
        ar_coeffs_y=(6, 12, 6, 24),
        ar_coeffs_cb=(4, 8, 4, 16, 6),
        ar_coeffs_cr=(4, 8, 4, 16, -6),
        ar_coeff_shift=7, overlap_flag=True)


def estimate_params(y: np.ndarray, seed: int = 7391,
                    max_points: int = 8) -> FilmGrainParams:
    """Estimate film-grain parameters from a source luma plane.

    The reference estimates a full AR noise model from flat blocks
    (aom_noise_model_init / flat-block detection, noise_model.c:705 /
    :582-696) on the denoise path.  This estimator keeps the same
    structure at frame granularity:
      1. find FLAT 16x16 blocks (low gradient energy — texture would
         contaminate the noise measurement),
      2. high-pass each flat block (3x3 laplacian) and measure noise
         std per luma-intensity bin,
      3. fit the piecewise-linear scaling function the bitstream codes
         (scaling_points_y) from those per-bin stds; chroma points are
         scaled from luma (flat chroma statistics are too sparse per
         frame), AR shape from the preset template.

    Returns apply_grain=False when the plane is essentially noise-free.
    """
    y32 = y.astype(np.int32)
    h, w = y32.shape
    bh, bw = h // 16, w // 16
    if bh == 0 or bw == 0:
        return FilmGrainParams(apply_grain=False)
    blocks = y32[: bh * 16, : bw * 16].reshape(bh, 16, bw, 16)
    blocks = blocks.transpose(0, 2, 1, 3).reshape(-1, 16, 16)
    # gradient energy (texture measure) and laplacian noise per block
    gx = np.abs(np.diff(blocks, axis=2)).mean((1, 2))
    gy = np.abs(np.diff(blocks, axis=1)).mean((1, 2))
    lap = (4 * blocks[:, 1:-1, 1:-1]
           - blocks[:, :-2, 1:-1] - blocks[:, 2:, 1:-1]
           - blocks[:, 1:-1, :-2] - blocks[:, 1:-1, 2:])
    sig = lap.std(axis=(1, 2)) / np.sqrt(20.0)   # laplacian variance gain
    grad = np.maximum(gx, gy)
    flat = grad < max(2.0, np.percentile(grad, 25) * 1.5)
    if flat.sum() < 4:
        return FilmGrainParams(apply_grain=False)
    means = blocks.mean((1, 2))
    # per-intensity-bin noise std over flat blocks
    pts = []
    for lo in range(0, 256, 64):
        m = flat & (means >= lo) & (means < lo + 64)
        if m.sum() >= 2:
            pts.append((min(255, lo + 32), float(np.median(sig[m]))))
    if not pts:
        return FilmGrainParams(apply_grain=False)
    med = float(np.median([s for _, s in pts]))
    if med < 0.8:                      # essentially clean source
        return FilmGrainParams(apply_grain=False)
    # scaling value: grain LUT unit is ~1/2^scaling_shift of pixel range;
    # AR synthesis with the template has ~unit std, so scale ~ sigma<<shift/64
    shift = 8
    mk = lambda s: int(np.clip(round(s * (1 << shift) / 32.0), 1, 255))
    pts = pts[:max_points]
    if len(pts) == 1:
        pts = [(0, pts[0][1]), (255, pts[0][1])]
    spts = tuple((x, mk(s)) for x, s in pts)
    return FilmGrainParams(
        apply_grain=True, random_seed=seed,
        num_y_points=len(spts), scaling_points_y=spts,
        num_cb_points=2,
        scaling_points_cb=((0, max(1, mk(med) // 2)),
                           (255, max(1, mk(med) // 2))),
        num_cr_points=2,
        scaling_points_cr=((0, max(1, mk(med) // 2)),
                           (255, max(1, mk(med) // 2))),
        scaling_shift=shift,
        ar_coeff_lag=1,
        ar_coeffs_y=(6, 12, 6, 24),
        ar_coeffs_cb=(4, 8, 4, 16, 6),
        ar_coeffs_cr=(4, 8, 4, 16, -6),
        ar_coeff_shift=7, overlap_flag=True)
