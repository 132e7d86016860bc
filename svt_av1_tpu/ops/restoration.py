"""Loop restoration: Wiener filter apply + per-RU search (host stage).

Spec 7.17; ref EbRestoration.c (av1_wiener_convolve_add_src_c,
setup_processing_stripe_boundary, save_deblock_boundary_lines) and
EbPickRestoration.c (search_wiener).  One numpy implementation is shared
by the encoder and the mirror decoder, so restored references cannot
diverge.  Like the entropy stage, restoration runs on the host in round
1 (it is a small fraction of frame time); a fused device kernel is a
round-2 item.

Stripe rule: filtering proceeds in 64-row stripes (offset 8; chroma 32
offset 4).  The 3 context rows above/below each interior stripe edge are
the DEBLOCKED (pre-CDEF) rows at that edge, expanded [a0 a0 a1] above
and [b0 b1 b1] below; frame edges replicate.
"""

from __future__ import annotations

import numpy as np

WIENER_TAPS_MID = (3, -7, 15)
WIENER_TAPS_MIN = (-5, -23, -17)
WIENER_TAPS_MAX = (10, 8, 46)
WIENER_SUBEXP_K = (1, 2, 3)
ROUND0, ROUND1 = 3, 11      # 8-bit wiener conv params
CLAMP_LIMIT = 1 << 13       # WIENER_CLAMP_LIMIT(3, 8)
STRIPE = 64
STRIPE_OFF = 8
BORDER = 3


def wiener_kernel(taps) -> np.ndarray:
    """[w0 w1 w2 -2*(w0+w1+w2) w2 w1 w0] + implicit 128 center add-src."""
    w0, w1, w2 = (int(t) for t in taps)
    return np.array([w0, w1, w2, -2 * (w0 + w1 + w2), w2, w1, w0],
                    np.int32)


def _conv7_h(x: np.ndarray, k: np.ndarray) -> np.ndarray:
    out = None
    for i in range(7):
        t = k[i] * x[:, i : x.shape[1] - 6 + i]
        out = t if out is None else out + t
    return out


def _conv7_v(x: np.ndarray, k: np.ndarray) -> np.ndarray:
    out = None
    for i in range(7):
        t = k[i] * x[i : x.shape[0] - 6 + i, :]
        out = t if out is None else out + t
    return out


def wiener_block(ext: np.ndarray, taps_h, taps_v) -> np.ndarray:
    """Filter one extended block: ext is int32 [h+6, w+6] (3-pixel halo
    already holds the correct stripe/frame context).  Returns [h, w]
    pixels (ref av1_wiener_convolve_add_src_c, 8-bit)."""
    kx = wiener_kernel(taps_h)
    ky = wiener_kernel(taps_v)
    # horizontal: add-src (center << 7) + offset, clamp to 13 bits
    center = ext[:, 3 : ext.shape[1] - 3]
    s = _conv7_h(ext, kx) + (center << 7) + (1 << 14)
    im = np.clip((s + (1 << (ROUND0 - 1))) >> ROUND0, 0, CLAMP_LIMIT - 1)
    # vertical: add-src - offset, clip to pixel range
    vcen = im[3 : im.shape[0] - 3, :]
    s = _conv7_v(im, ky) + (vcen << 7) - (1 << 18)
    return np.clip((s + (1 << (ROUND1 - 1))) >> ROUND1, 0, 255)


def _stripe_spans(h: int, ss_y: int):
    """[(y0, y1)] stripe rows for a plane of height h."""
    sh = STRIPE >> ss_y
    off = STRIPE_OFF >> ss_y
    spans = []
    y1 = 0
    s = 0
    while y1 < h:
        y0 = max(0, s * sh - off)
        y1 = min((s + 1) * sh - off, h)
        spans.append((y0, y1))
        s += 1
    return spans


def _extend_stripe(cdef: np.ndarray, deblock: np.ndarray, y0: int,
                   y1: int) -> np.ndarray:
    """Extended stripe [y1-y0+6, w+6]: CDEF pixels inside, deblocked
    context rows at interior stripe edges ([a0 a0 a1] above,
    [b0 b1 b1] below), frame edges replicated; 3-col edge padding."""
    h, w = cdef.shape
    rows = [None] * 3
    if y0 == 0:
        rows = [cdef[0], cdef[0], cdef[0]]
    else:
        a0, a1 = deblock[y0 - 2], deblock[y0 - 1]
        rows = [a0, a0, a1]
    below = [None] * 3
    if y1 >= h:
        below = [cdef[h - 1]] * 3
    else:
        b0 = deblock[y1]
        b1 = deblock[min(y1 + 1, h - 1)]
        below = [b0, b1, b1]
    core = np.concatenate([np.stack(rows), cdef[y0:y1], np.stack(below)])
    return np.pad(core, ((0, 0), (3, 3)), mode="edge").astype(np.int32)


def ru_grid(size: int, unit: int):
    """count_units_in_tile: round-to-nearest RU count (last RU may
    stretch to 150%)."""
    n = max((size + (unit >> 1)) // unit, 1)
    starts = [i * unit for i in range(n)]
    ends = [starts[i + 1] if i + 1 < n else size for i in range(n)]
    return list(zip(starts, ends))


def apply_wiener_plane(cdef: np.ndarray, deblock: np.ndarray,
                       unit: int, ss_y: int,
                       ru_use: np.ndarray, ru_taps: np.ndarray
                       ) -> np.ndarray:
    """Apply per-RU Wiener filters over a full plane (stripe-aware).

    ru_use:  [nrow, ncol] bool — RESTORE unit on/off
    ru_taps: [nrow, ncol, 6]   — (h0 h1 h2 v0 v1 v2)
    """
    h, w = cdef.shape
    out = cdef.astype(np.int32).copy()
    rows = ru_grid(h, unit)
    cols = ru_grid(w, unit)
    for y0s, y1s in _stripe_spans(h, ss_y):
        ext = _extend_stripe(cdef, deblock, y0s, y1s)
        for ri, (ry0, ry1) in enumerate(rows):
            iy0, iy1 = max(ry0, y0s), min(ry1, y1s)
            if iy0 >= iy1:
                continue
            for ci, (cx0, cx1) in enumerate(cols):
                if not ru_use[ri, ci]:
                    continue
                t = ru_taps[ri, ci]
                blk = ext[iy0 - y0s : iy1 - y0s + 6, cx0 : cx1 + 6]
                out[iy0:iy1, cx0:cx1] = wiener_block(blk, t[:3], t[3:])
    return out


def search_wiener_plane(src: np.ndarray, cdef: np.ndarray,
                        deblock: np.ndarray, unit: int, ss_y: int):
    """Per-RU Wiener search: separable normal-equation fit (the
    reference's search_wiener compute_stats + wiener_decompose), taps
    quantized to the coded ranges, kept only when SSE improves.

    Returns (ru_use [nr,nc] bool, ru_taps [nr,nc,6] int32).
    """
    h, w = cdef.shape
    rows = ru_grid(h, unit)
    cols = ru_grid(w, unit)
    use = np.zeros((len(rows), len(cols)), bool)
    taps = np.zeros((len(rows), len(cols), 6), np.int32)
    for ri, (ry0, ry1) in enumerate(rows):
        for ci, (cx0, cx1) in enumerate(cols):
            s = src[ry0:ry1, cx0:cx1].astype(np.float64)
            d = np.pad(cdef[ry0:ry1, cx0:cx1].astype(np.float64),
                       3, mode="edge")
            t = _fit_separable(s, d)
            if t is None:
                continue
            cand = np.array(t, np.int32)
            ru_use = np.zeros((len(rows), len(cols)), bool)
            ru_use[ri, ci] = True
            ru_t = np.zeros((len(rows), len(cols), 6), np.int32)
            ru_t[ri, ci] = cand
            got = apply_wiener_plane(cdef, deblock, unit, ss_y, ru_use,
                                     ru_t)
            a = src[ry0:ry1, cx0:cx1].astype(np.int64)
            sse_new = ((got[ry0:ry1, cx0:cx1] - a) ** 2).sum()
            sse_old = ((cdef[ry0:ry1, cx0:cx1].astype(np.int64) - a)
                       ** 2).sum()
            if sse_new < sse_old:
                use[ri, ci] = True
                taps[ri, ci] = cand
    return use, taps


def _fit_separable(src: np.ndarray, dgd_pad: np.ndarray):
    """Least-squares symmetric 7-tap fit, one pass per axis, quantized
    to (MIN..MAX) with the 128-sum constraint."""
    h, w = src.shape

    def fit_axis(vertical: bool):
        # design matrix columns: symmetric tap pairs at offsets 3,2,1
        feats = []
        for off in (3, 2, 1):
            if vertical:
                a = dgd_pad[3 - off : 3 - off + h, 3 : 3 + w]
                b = dgd_pad[3 + off : 3 + off + h, 3 : 3 + w]
            else:
                a = dgd_pad[3 : 3 + h, 3 - off : 3 - off + w]
                b = dgd_pad[3 : 3 + h, 3 + off : 3 + off + w]
            feats.append((a + b).ravel())
        center = dgd_pad[3 : 3 + h, 3 : 3 + w].ravel()
        target = src.ravel() - center
        A = np.stack(feats, 1)
        # out = center + (1/128) * sum_i tap_i * (pair_i - 2*center)
        M = A - 2 * center[:, None]
        try:
            x, *_ = np.linalg.lstsq(M, target, rcond=None)
        except np.linalg.LinAlgError:
            return None
        q = []
        for i in range(3):
            qi = int(round(float(x[i]) * 128.0))
            qi = max(WIENER_TAPS_MIN[i], min(WIENER_TAPS_MAX[i], qi))
            q.append(qi)
        return q

    fh = fit_axis(False)
    fv = fit_axis(True)
    if fh is None or fv is None:
        return None
    return fh + fv
