"""Warp sample collection + motion-mode gating — shared by the tile
writer, the mirror decoder and the encoder's warp pass (one
implementation guarantees the three agree, which the bitstream requires:
the motion_mode symbol's PRESENCE and cdf both depend on the causal
neighborhood).

Behavioral parity (clean-room): av1_find_samples / record_samples /
select_samples, /root/reference/Source/Lib/Common/Codec/
EbAdaptiveMotionVectorPrediction.c:1490-1715; motion_mode_allowed,
EbEntropyCoding.c:1295.  Coordinates follow the reference: pts are
(x, y) 1/8-pel positions of neighbor block centers relative to the
current block's top-left pixel; pts_inref adds the neighbor's MV.
"""

from __future__ import annotations

from svt_av1_tpu.entropy.mvp import NONE_FRAME, _has_top_right

LEAST_SQUARES_SAMPLES_MAX = 8
SB_MI = 16

# motion modes (spec)
SIMPLE_TRANSLATION = 0
OBMC_CAUSAL = 1
WARPED_CAUSAL = 2


def _record(mi, nr: int, nc: int, row_off: int, sign_r: int,
            col_off: int, sign_c: int):
    """record_samples: neighbor at mi cell (nr, nc) — uses ITS block
    dims; offsets are mi units relative to the current block."""
    bw = int(mi.w4[nr, nc]) * 4
    bh = int(mi.h4[nr, nc]) * 4
    x = col_off * 4 + sign_c * max(bw, 4) // 2 - 1
    y = row_off * 4 + sign_r * max(bh, 4) // 2 - 1
    mv_r = int(mi.mv[nr, nc, 0])
    mv_c = int(mi.mv[nr, nc, 1])
    return (x * 8, y * 8), (x * 8 + mv_c, y * 8 + mv_r)


def _single_ref_match(mi, nr: int, nc: int, ref: int) -> bool:
    return (bool(mi.is_inter[nr, nc])
            and int(mi.ref_frame[nr, nc]) == ref
            and int(mi.ref_frame2[nr, nc]) == NONE_FRAME)


def find_samples(mi, mi_rows: int, mi_cols: int, r4: int, c4: int,
                 w4: int, h4: int, ref: int):
    """av1_find_samples on the tile's MI state.  Returns (pts1, pts2)
    lists of (x, y) 1/8-pel pairs, capped at 8."""
    pts1: list = []
    pts2: list = []
    up = r4 > 0
    left = c4 > 0
    do_tl = True
    do_tr = True

    def add(nr, nc, row_off, sign_r, col_off, sign_c) -> bool:
        p1, p2 = _record(mi, nr, nc, row_off, sign_r, col_off, sign_c)
        pts1.append(p1)
        pts2.append(p2)
        return len(pts1) >= LEAST_SQUARES_SAMPLES_MAX

    if up:
        nr = r4 - 1
        n4w = int(mi.w4[nr, c4])
        if w4 <= n4w:
            col_off = -(c4 % n4w) if c4 % n4w else 0
            if col_off < 0:
                do_tl = False
            if col_off + n4w > w4:
                do_tr = False
            if _single_ref_match(mi, nr, c4, ref):
                if add(nr, c4, 0, -1, col_off, 1):
                    return pts1, pts2
        else:
            i = 0
            while i < min(w4, mi_cols - c4):
                nc = c4 + i
                n4w = int(mi.w4[nr, nc])
                step = min(w4, max(n4w, 1))
                if _single_ref_match(mi, nr, nc, ref):
                    if add(nr, nc, 0, -1, i, 1):
                        return pts1, pts2
                i += step
    if left:
        nc = c4 - 1
        n4h = int(mi.h4[r4, nc])
        if h4 <= n4h:
            row_off = -(r4 % n4h) if r4 % n4h else 0
            if row_off < 0:
                do_tl = False
            if _single_ref_match(mi, r4, nc, ref):
                if add(r4, nc, row_off, 1, 0, -1):
                    return pts1, pts2
        else:
            i = 0
            while i < min(h4, mi_rows - r4):
                nr = r4 + i
                n4h = int(mi.h4[nr, nc])
                step = min(h4, max(n4h, 1))
                if _single_ref_match(mi, nr, nc, ref):
                    if add(nr, nc, i, 1, 0, -1):
                        return pts1, pts2
                i += step
    if do_tl and left and up:
        if _single_ref_match(mi, r4 - 1, c4 - 1, ref):
            if add(r4 - 1, c4 - 1, 0, -1, 0, -1):
                return pts1, pts2
    if (do_tr and up
            and _has_top_right(SB_MI, r4, c4, w4, h4, max(w4, h4))
            and r4 - 1 >= 0 and c4 + w4 < mi_cols):
        if _single_ref_match(mi, r4 - 1, c4 + w4, ref):
            add(r4 - 1, c4 + w4, 0, -1, w4, 1)
    return pts1, pts2


def select_samples(mv8, pts1, pts2, bw: int, bh: int):
    """Trim samples by MV difference (ref select_samples): keep those
    whose implied motion is within thresh of the block MV; always keep
    at least the first.  mv8 = (row, col)."""
    thresh = min(max(max(bw, bh), 16), 112)
    kept1, kept2 = [], []
    for p1, p2 in zip(pts1, pts2):
        mvd = (abs(p2[0] - p1[0] - mv8[1])
               + abs(p2[1] - p1[1] - mv8[0]))
        if mvd <= thresh:
            kept1.append(p1)
            kept2.append(p2)
    if not kept1:
        return pts1[:1], pts2[:1]
    return kept1, kept2


def has_overlappable(mi, r4: int, c4: int, w4: int, h4: int,
                     mi_rows: int, mi_cols: int) -> bool:
    """Any overlappable (inter) neighbor in the above row / left column,
    walking neighbor-block strides (ref count_overlappable_nb_above/
    _left; every block here is >= 8x8 so the width-4 pairing rule never
    triggers)."""
    if r4 > 0:
        c = c4
        end = min(c4 + w4, mi_cols)
        while c < end:
            if mi.is_inter[r4 - 1, c]:
                return True
            c += min(max(int(mi.w4[r4 - 1, c]), 2), 16)
    if c4 > 0:
        r = r4
        end = min(r4 + h4, mi_rows)
        while r < end:
            if mi.is_inter[r, c4 - 1]:
                return True
            r += min(max(int(mi.h4[r, c4 - 1]), 2), 16)
    return False


def motion_mode_gate(mi, mi_rows: int, mi_cols: int, r4: int, c4: int,
                     w4: int, h4: int, ref: int, is_comp: bool,
                     mode_is_global_trans: bool = False):
    """Which motion-mode syntax this block parses (spec read_motion_mode
    up to the symbol choice).  Returns (kind, nsamples):
      kind 0 -> no symbol (SIMPLE forced)
      kind 1 -> obmc_cdf 2-symbol (warp not derivable here)
      kind 2 -> motion_mode_cdf 3-symbol (warp allowed)
    nsamples = warp sample count (kind 2 only).
    Caller preconditions: allow_warped_motion frame flag is ON and the
    block is inter (the gate for GLOBALMV-with-non-translation gm is
    folded into mode_is_global_trans=False for our TRANSLATION-only gm).
    """
    if min(w4, h4) < 2:          # min(bw, bh) < 8 px
        return 0, 0
    if is_comp:
        return 0, 0
    if not has_overlappable(mi, r4, c4, w4, h4, mi_rows, mi_cols):
        return 0, 0
    pts1, pts2 = find_samples(mi, mi_rows, mi_cols, r4, c4, w4, h4, ref)
    if len(pts1) == 0:
        return 1, 0
    return 2, len(pts1)
