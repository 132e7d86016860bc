"""Inter prediction / motion compensation (AV1 convolve semantics).

Implements the normative single-reference convolve paths
(ref av1_convolve_2d_sr_c / av1_convolve_x_sr_c / av1_convolve_y_sr_c /
av1_convolve_2d_copy_sr_c, EbInterPrediction.c:131-260) with
EIGHTTAP_REGULAR kernels (sub_pel_filters_8, EbInterPrediction.c:107) and
8-bit conv params round_0=3, round_1=11.

TPU-first formulation: instead of per-block subpel filtering (the
reference filters each block at its own phase), we pre-filter the WHOLE
reference plane once per needed subpel phase and then motion compensation
becomes a pure gather — ideal for XLA (dense convs + static-shape
gathers, no per-block control flow).  With full-pel luma MVs the luma
needs only phase 0 (copy); chroma needs phases {0, 8}^2 (half-pel), i.e.
4 filtered planes.

All functions are written against a generic array module ``xp`` (numpy
for the mirror decoder, jax.numpy for the device encoder) so encoder and
decoder share one arithmetic definition.
"""

from __future__ import annotations

import functools

import numpy as np

from svt_av1_tpu import tables

FILTER_BITS = 7
ROUND0, ROUND1 = 3, 11  # 8-bit conv params (ref get_conv_params)
BD = 8


# frame-level interpolation_filter enum (spec 6.8.9 / ref EbDefinitions.h
# InterpFilter): 0=EIGHTTAP_REGULAR, 1=EIGHTTAP_SMOOTH, 2=EIGHTTAP_SHARP
FILTER_TABLES = ("subpel_filters_regular", "subpel_filters_smooth",
                 "subpel_filters_sharp")


@functools.lru_cache(maxsize=None)
def kernel(phase: int, filt: int = 0) -> tuple:
    """8-tap kernel for subpel phase 0..15 of one interp filter (spec
    Subpel_Filters; ref sub_pel_filters_8/8smooth/8sharp,
    EbInterPrediction.c:867-903)."""
    k = tables.spec_tables()[FILTER_TABLES[filt]][phase]
    return tuple(int(v) for v in k)


def regular_kernel(phase: int) -> tuple:
    """8-tap EIGHTTAP_REGULAR kernel for subpel phase 0..15."""
    return kernel(phase, 0)


def _conv_h(xp, src, kernel):
    """Horizontal 8-tap over an int32 plane; taps span [x-3, x+4]."""
    out = None
    for k, c in enumerate(kernel):
        term = c * src[:, k : src.shape[1] - 7 + k]
        out = term if out is None else out + term
    return out


def _conv_v(xp, src, kernel):
    out = None
    for k, c in enumerate(kernel):
        term = c * src[k : src.shape[0] - 7 + k, :]
        out = term if out is None else out + term
    return out


def _round_shift(x, n: int):
    return (x + (1 << (n - 1))) >> n


def filter_plane(xp, plane, phase_x: int, phase_y: int, bd: int = 8,
                 filt: int = 0):
    """Filter a whole (already padded) plane at one subpel phase.

    ``plane`` is int32 [H+7, W+7]: the caller pads with a 3-pixel
    top/left and 4-pixel bottom/right halo (filter taps span [-3, 4]).
    Returns pixel-range int32 [H, W] matching the reference convolve
    (av1_[highbd_]convolve_*_sr_c; 10-bit keeps round_0=3/round_1=11).
    """
    hi = (1 << bd) - 1
    if phase_x == 0 and phase_y == 0:
        return plane[3 : plane.shape[0] - 4, 3 : plane.shape[1] - 4]
    if phase_y == 0:
        # ref av1_convolve_x_sr_c: res>>round_0 then >>(FILTER_BITS-round_0)
        src = plane[3 : plane.shape[0] - 4, :]
        res = _conv_h(xp, src, kernel(phase_x, filt))
        res = _round_shift(res, ROUND0)
        res = _round_shift(res, FILTER_BITS - ROUND0)
        return xp.clip(res, 0, hi)
    if phase_x == 0:
        # ref av1_convolve_y_sr_c: single >>FILTER_BITS
        src = plane[:, 3 : plane.shape[1] - 4]
        res = _conv_v(xp, src, kernel(phase_y, filt))
        res = _round_shift(res, FILTER_BITS)
        return xp.clip(res, 0, hi)
    # ref av1_convolve_2d_sr_c
    offset0 = 1 << (bd + FILTER_BITS - 1)
    im = _round_shift(_conv_h(xp, plane, kernel(phase_x, filt)) + offset0,
                      ROUND0)
    offset_bits = bd + 2 * FILTER_BITS - ROUND0
    res = _round_shift(_conv_v(xp, im, kernel(phase_y, filt))
                       + (1 << offset_bits), ROUND1)
    res = res - ((1 << (bd - 1)) + (1 << (bd - 2)))  # offset removal
    # bits = 2*FILTER_BITS - ROUND0 - ROUND1 == 0: no final shift
    return xp.clip(res, 0, hi)


def halfpel_planes(xp, plane_padded):
    """The 4 {0,8}x{0,8}-phase filtered planes of one padded plane.

    Returns [4, H, W] indexed by (phase_y//8)*2 + (phase_x//8) — all the
    phases reachable by chroma when luma MVs are full-pel.
    """
    return xp.stack([
        filter_plane(xp, plane_padded, 0, 0),
        filter_plane(xp, plane_padded, 8, 0),
        filter_plane(xp, plane_padded, 0, 8),
        filter_plane(xp, plane_padded, 8, 8),
    ])


def phase_bank(xp, plane_padded, step: int, bd: int = 8, filt: int = 0):
    """All (16/step)^2 subpel-phase planes of one padded plane.

    step=4: quarter-pel bank (luma with allow_high_precision_mv=0);
    step=2: eighth-pel bank (chroma under quarter-pel luma MVs).
    Returns [n, n, H, W] with n = 16 // step, indexed [py//step, px//step].
    Shares the horizontal intermediate across vertical phases (the 2-D
    convolve is separable with the intermediate round_0 applied once,
    exactly as the reference's im_block; EbInterPrediction.c:131-181).
    """
    n = 16 // step
    rows = []
    for iy in range(n):
        row = []
        for ix in range(n):
            row.append(filter_plane(xp, plane_padded, ix * step, iy * step,
                                    bd, filt))
        rows.append(xp.stack(row))
    return xp.stack(rows)


# ---- compound (jnt) convolve: round_1 = 7, CONV_BUF intermediate ------
# ref av1_jnt_convolve_2d_c (EbInterPrediction.c:267): im and res keep
# the compound offsets; the average path removes them.  The 2-D form
# with phase-0 kernels reproduces the x/y/copy jnt variants exactly
# (pure integer algebra: 128-weight taps shift out of the rounds), so
# ONE formula serves every phase — no per-variant control flow on TPU.
JNT_ROUND1 = 7
JNT_OFFSET_BITS = BD + 2 * FILTER_BITS - ROUND0          # 19
JNT_ROUND_OFFSET = ((1 << (JNT_OFFSET_BITS - JNT_ROUND1))
                    + (1 << (JNT_OFFSET_BITS - JNT_ROUND1 - 1)))  # 6144
JNT_ROUND_BITS = 2 * FILTER_BITS - ROUND0 - JNT_ROUND1   # 4


def jnt_block(xp, patch, kx, ky, bd: int = 8):
    """One block's compound-domain prediction.

    patch: int32 [bh+7, bw+7] full-pel window (top-left at fullpel
    position - 3); kx, ky: 8-tap kernels.  Returns CONV_BUF int32
    [bh, bw] (ref av1_jnt_convolve_2d_c non-averaging pass).
    """
    bh, bw = patch.shape[0] - 7, patch.shape[1] - 7
    offset0 = 1 << (bd + FILTER_BITS - 1)
    offset_bits = bd + 2 * FILTER_BITS - ROUND0
    im = None
    for k in range(8):
        term = kx[k] * patch[:, k : k + bw]
        im = term if im is None else im + term
    im = _round_shift(im + offset0, ROUND0)
    res = None
    for k in range(8):
        term = ky[k] * im[k : k + bh, :]
        res = term if res is None else res + term
    return _round_shift(res + (1 << offset_bits), JNT_ROUND1)


def jnt_filter_plane(xp, plane_padded, phase_x: int, phase_y: int,
                     bd: int = 8, filt: int = 0):
    """Whole-plane CONV_BUF-domain jnt convolve at one subpel phase.

    ref av1_jnt_convolve_2d_c non-averaging pass (EbInterPrediction.c:267);
    the 2-D formula with phase-0 kernels reproduces the x/y/copy jnt
    variants exactly (128-weight taps shift out of the rounds), so one
    formula serves every phase.  Same halo convention as filter_plane.
    """
    offset0 = 1 << (bd + FILTER_BITS - 1)
    offset_bits = bd + 2 * FILTER_BITS - ROUND0
    im = _round_shift(_conv_h(xp, plane_padded, kernel(phase_x, filt))
                      + offset0, ROUND0)
    return _round_shift(_conv_v(xp, im, kernel(phase_y, filt))
                        + (1 << offset_bits), JNT_ROUND1)


def jnt_phase_bank(xp, plane_padded, step: int, bd: int = 8,
                   filt: int = 0):
    """All (16/step)^2 CONV_BUF-domain phase planes of one padded plane
    (compound analog of phase_bank): whole-plane dense convs once, then
    compound MC is a pure per-block gather — this replaced per-block
    patch-gather+conv (_jnt_pred_grid) that dominated the B step."""
    n = 16 // step
    return xp.stack([
        xp.stack([jnt_filter_plane(xp, plane_padded, ix * step, iy * step,
                                   bd, filt) for ix in range(n)])
        for iy in range(n)])


def jnt_round_offset(bd: int = 8) -> int:
    ob = bd + 2 * FILTER_BITS - ROUND0
    return (1 << (ob - JNT_ROUND1)) + (1 << (ob - JNT_ROUND1 - 1))


def jnt_average(xp, res0, res1, bd: int = 8):
    """COMPOUND_AVERAGE of two CONV_BUF blocks -> pixels (ref
    av1_jnt_convolve_*_c do_average path, use_jnt_comp_avg=0)."""
    tmp = ((res0 + res1) >> 1) - jnt_round_offset(bd)
    return xp.clip(_round_shift(tmp, JNT_ROUND_BITS), 0, (1 << bd) - 1)


def jnt_pred_np(plane_pad, py: int, px: int, mv8: tuple, bs,
                pad: int, chroma: bool, bd: int = 8, filt: int = 0):
    """Decoder-side per-block compound-domain prediction (numpy twin of
    the device path).  plane_pad is pad_for_filter(np, plane, pad).
    bs: block size (int = square, (bh, bw) = rect)."""
    bh, bw = (bs, bs) if isinstance(bs, int) else bs
    if chroma:
        fy, fx = mv8[0] >> 4, mv8[1] >> 4
        phy, phx = mv8[0] & 15, mv8[1] & 15
    else:
        fy, fx = mv8[0] >> 3, mv8[1] >> 3
        phy, phx = (mv8[0] * 2) & 15, (mv8[1] * 2) & 15
    r0 = py + fy + pad
    c0 = px + fx + pad
    patch = plane_pad[r0 : r0 + bh + 7, c0 : c0 + bw + 7]
    return jnt_block(np, patch, kernel(phx, filt), kernel(phy, filt),
                     bd)


def pad_for_filter(xp, plane, pad: int):
    """Edge-replicate pad by (pad+3) left/top and (pad+4) right/bottom.

    ``pad`` is the motion search range in pixels; +3/+4 is the 8-tap
    halo.  Gathers into the result at [y+pad+3, x+pad+3] + mv stay in
    bounds for |mv| <= pad.  Mirrors the reference's reference-picture
    border extension (ref EbPictureBufferDesc padding + clamp_mv_ref).
    """
    if xp is np:
        return np.pad(plane.astype(np.int32),
                      ((pad + 3, pad + 4), (pad + 3, pad + 4)), mode="edge")
    import jax.numpy as jnp
    return jnp.pad(plane.astype(jnp.int32),
                   ((pad + 3, pad + 4), (pad + 3, pad + 4)), mode="edge")
