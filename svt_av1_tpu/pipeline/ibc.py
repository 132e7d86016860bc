"""Intra block copy (screen content): hash ME + DV validity.

The reference searches IBC candidates per block inside mode decision
(inject_intra_bc_candidates, EbModeDecision.c:2301) against a CRC hash
table of the source (hash_motion.c) and validates displacement vectors
with av1_is_dv_valid (EbAdaptiveMotionVectorPrediction.c:2065).

TPU-first restructure: IBC is decided AHEAD of the device wavefront as
a dense host pass — a rolling hash over every even pixel position of
the source finds, for each aligned 8x8 block, an earlier exact
duplicate; the device wavefront then *reconstructs* the chosen blocks
by gathering the prediction from its own evolving recon state (the
bit-exact part), so the hot loop stays a fixed tensor program with a
per-block (use, dv) input instead of a data-dependent search.

Encoder restrictions (all spec-legal; they narrow the search, not the
syntax): full-pel even DVs (chroma lands on integer pel; prediction is
a pure copy — the spec's forced-bilinear subpel path is never needed),
8x8 leaves, single tile.
"""

from __future__ import annotations

import numpy as np

# spec 7.11.3 / ref EbAdaptiveMotionVectorPrediction.c:2045
INTRABC_DELAY_PIXELS = 256
INTRABC_DELAY_SB64 = INTRABC_DELAY_PIXELS // 64

_A = np.uint64(0x9E3779B97F4A7C15)   # row mix multiplier
_B = np.uint64(0x100000001B3)        # col mix multiplier (FNV prime)


def _window_hashes(y: np.ndarray, n: int = 8) -> np.ndarray:
    """uint64 hash of every n x n window: H[r, c] covers y[r:r+n, c:c+n].

    Separable weighted sum sum_ij y[r+i, c+j] * A^i * B^j in uint64
    wraparound arithmetic — exact-match detection only (equality is
    verified on the pixels afterwards), so collisions just cost a
    verify."""
    h, w = y.shape
    yw = y.astype(np.uint64)
    m64 = (1 << 64) - 1
    bp = [1] * n
    ap = [1] * n
    for k in range(1, n):
        bp[k] = (bp[k - 1] * int(_B)) & m64
        ap[k] = (ap[k - 1] * int(_A)) & m64
    rows = np.zeros((h, w - n + 1), np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            rows += yw[:, j : w - n + 1 + j] * np.uint64(bp[j])
        out = np.zeros((h - n + 1, w - n + 1), np.uint64)
        for i in range(n):
            out += rows[i : h - n + 1 + i] * np.uint64(ap[i])
    return out


def _dv_valid_spec(r8: np.ndarray, c8: np.ndarray, pr: np.ndarray,
                   pc: np.ndarray, mi_rows: int, mi_cols: int,
                   bs: int = 8) -> np.ndarray:
    """Vectorized av1_is_dv_valid for full-pel DVs, 64-px superblocks,
    single tile spanning the frame (spec 'is_dv_valid'; ref
    EbAdaptiveMotionVectorPrediction.c:2065).  (r8, c8): target block
    cell coords; (pr, pc): source window top-left in pixels."""
    th, tw = mi_rows * 4, mi_cols * 4       # tile extent in pixels
    src_top, src_left = pr, pc
    src_bot, src_right = pr + bs, pc + bs
    ok = (src_top >= 0) & (src_left >= 0) & (src_bot <= th) & \
         (src_right <= tw)
    # bottom-right within an already-coded SB64, HW delay of 4 SB64s
    active_sb_row = (r8 * 8) // 64
    active_sb64_col = (c8 * 8) // 64
    total_sb64 = (tw - 1) // 64 + 1
    src_sb_row = (src_bot - 1) // 64
    src_sb64_col = (src_right - 1) // 64
    active_sb64 = active_sb_row * total_sb64 + active_sb64_col
    src_sb64 = src_sb_row * total_sb64 + src_sb64_col
    ok &= src_sb64 < active_sb64 - INTRABC_DELAY_SB64
    # wavefront constraint (top-left area only)
    gradient = 1 + INTRABC_DELAY_SB64            # sb_size 64
    wf_offset = gradient * (active_sb_row - src_sb_row)
    ok &= (src_sb_row <= active_sb_row) & \
          (src_sb64_col < active_sb64_col - INTRABC_DELAY_SB64 + wf_offset)
    # SW-wavefront constraint
    ok &= src_sb64_col <= active_sb64_col + (active_sb_row - src_sb_row)
    return ok


def _staircase_causal(r8, c8, pr, pc) -> np.ndarray:
    """Encoder-side: the source window must be fully reconstructed when
    the device wavefront (staircase d = 2r + c) codes the target cell —
    every covered cell (r', c') needs 2r' + c' < 2r + c; the bottom-
    right covered cell maximizes it."""
    rmax = (pr + 7) >> 3
    cmax = (pc + 7) >> 3
    return 2 * rmax + cmax < 2 * r8 + c8


def hash_dv_map(y: np.ndarray, mi_rows: int, mi_cols: int
                ) -> tuple[np.ndarray, np.ndarray]:
    """Dense IBC decision for an intra frame.

    Returns (use [nbh, nbw] bool, dv [nbh, nbw, 2] int32 pixel offsets):
    for each aligned 8x8 block, the displacement to an EARLIER exact
    duplicate of its source pixels at an even position, or use=False.
    The device wavefront copies the duplicate's RECON (bit-exact), so
    the residual is just the duplicate's own coding error."""
    nbh, nbw = mi_rows // 2, mi_cols // 2
    use = np.zeros((nbh, nbw), bool)
    dv = np.zeros((nbh, nbw, 2), np.int32)
    h, w = y.shape
    if h < 80 or w < 80:        # delay region leaves no usable sources
        return use, dv
    H = _window_hashes(y.astype(np.uint8))
    He = H[::2, ::2]                       # even positions only
    flat = He.reshape(-1)
    # first occurrence (raster order over even positions) per hash
    order = np.argsort(flat, kind="stable")
    sf = flat[order]
    first_of_group = np.zeros(len(sf), bool)
    first_of_group[0] = True
    first_of_group[1:] = sf[1:] != sf[:-1]
    gidx = np.cumsum(first_of_group) - 1
    firsts = np.zeros(gidx[-1] + 1, np.int64)
    firsts[gidx[::-1]] = order[::-1]       # min raster index per group
    ne_h, ne_w = He.shape
    # target blocks: aligned cells (r8*8, c8*8) — themselves even grid
    r8g, c8g = np.mgrid[0:nbh, 0:nbw]
    tr = r8g * 4                            # even-grid row index (8px/2)
    tc = c8g * 4
    inb = (tr < ne_h) & (tc < ne_w)
    tid = np.where(inb, tr * ne_w + tc, 0)
    cand = firsts[gidx[np.argsort(order, kind="stable")]][tid]
    pr = (cand // ne_w) * 2
    pc = (cand % ne_w) * 2
    cand_ok = inb & (cand < tid)           # strictly earlier occurrence
    cand_ok &= _dv_valid_spec(r8g, c8g, pr, pc, mi_rows, mi_cols)
    cand_ok &= _staircase_causal(r8g, c8g, pr, pc)
    # verify pixel equality (hash collisions)
    rs, cs = np.nonzero(cand_ok)
    for i, j in zip(rs, cs):
        sr, sc = int(pr[i, j]), int(pc[i, j])
        if not np.array_equal(y[i * 8 : i * 8 + 8, j * 8 : j * 8 + 8],
                              y[sr : sr + 8, sc : sc + 8]):
            cand_ok[i, j] = False
    use = cand_ok
    dv[..., 0] = np.where(use, pr - r8g * 8, 0)
    dv[..., 1] = np.where(use, pc - c8g * 8, 0)
    return use, dv


def detect_screen_content(y: np.ndarray) -> bool:
    """Screen-content detection (ref EbPictureDecisionProcess.c:650-798
    counts blocks with few distinct colors / no noise).  Two signals on
    aligned 16x16 blocks: the few-distinct-colors fraction (flat UI /
    text regions) and the exact-duplicate fraction (repeated glyphs) —
    either one firing classifies the source as screen content."""
    h, w = y.shape
    bh, bw = h // 16, w // 16
    if bh == 0 or bw == 0:
        return False
    blocks = y[: bh * 16, : bw * 16].reshape(bh, 16, bw, 16)
    blocks = blocks.transpose(0, 2, 1, 3).reshape(-1, 256)
    step = max(1, len(blocks) // 256)
    sample = blocks[::step]
    few = sum(1 for b in sample if len(np.unique(b)) <= 4)
    if few * 2 >= len(sample):
        return True
    # duplicate rate over ALL aligned blocks (hash + one verify each)
    hs = _window_hashes(y.astype(np.uint8), 16)[::16, ::16].reshape(-1)
    _u, counts = np.unique(hs, return_counts=True)
    dup_frac = 1.0 - len(_u) / max(1, len(hs))
    return dup_frac >= 0.25 and counts.max() >= 3
