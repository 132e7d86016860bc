"""Device-side P-frame encoder: batched ME + MC + transform coding with
variable partitions.

Unlike intra (wavefront-ordered), inter prediction has NO intra-frame
dependency: every block predicts from the previous reconstructed frame.
The whole P-frame therefore encodes as ONE bulk-parallel device program —
the TPU-native answer to the reference's EncDec wavefront + ME segment
pools (EbEncDecProcess.c:1448, EbMotionEstimationProcess.c:374).

Partitioning (the reference's MD partition RDO, EbProductCodingLoop.c
mode_decision_sb) is restructured TPU-first: motion search and residual
coding run for EVERY block of EVERY size (8/16/32) as dense batched
passes, then a bottom-up merge pass picks the quadtree by rate-biased
cost — no per-block control flow; the host entropy stage walks the
resulting size map.  Nodes that cross the frame edge are forced to
split to 8x8 (static masks), so the partition tree never needs the
edge-forced rectangular forms.

Motion is quarter-pel (AV1 low-precision MVs): hierarchical full-pel
search (HME centers + center-warped multi-size sweep), then a dense
quarter-pel lattice refinement.  All per-block reference access rides
ops.gather (grid-anchored tile gathers); subpel interpolation happens
ON the gathered patches with per-block kernels (_interp_patch) — no
whole-plane phase banks.

Partition selection runs in two preset-selected modes (rdo flag, wired
to enc_mode): full RD (J = recon SSE + lambda*estimated bits, residual
coding at every size feeding the merge) or fast SAD-cost merge with
residual coding only at the selected size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from svt_av1_tpu.ops import cdef as CD
from svt_av1_tpu.ops import gather as G
from svt_av1_tpu.ops import deblock as DB
from svt_av1_tpu.ops import mc as MC
from svt_av1_tpu.ops import me as ME
from svt_av1_tpu.ops import quant as Q
from svt_av1_tpu.ops import transforms as T

from svt_av1_tpu.pipeline import rdo as RDO

SEARCH_RANGE = 16   # full-pel luma search window (+-R)
PAD = SEARCH_RANGE + 1  # +1: subpel refinement can cross one more pel
SIZES = (8, 16, 32)     # ME sweep sizes (the SAD pyramid's native levels)
SIZES64 = (8, 16, 32, 64)   # leaf sizes incl. 64x64 (PARTITION_NONE at SB)
TX_OF = {8: T.TX_8X8, 16: T.TX_16X16, 32: T.TX_32X32, 64: T.TX_64X64}
TX_OF_C = {8: T.TX_4X4, 16: T.TX_8X8, 32: T.TX_16X16, 64: T.TX_32X32}
# CDF-derived per-decision rate scalars (pipeline/rdo.py — from the
# normative default CDF tables, the same source the reference's
# av1_estimate_syntax_rate reads; replaces round-1 hand constants)
_PART_BITS = RDO.partition_bits()      # {bs: (none_bits, split_bits)}
_LEAF = RDO.inter_leaf_bits()          # mode / ref_single / comp_extra


def inter_layout(nrefs: int, compound: bool, txs: bool, lv8: bool,
                 lr: bool, rect: bool = False) -> dict:
    """name -> output-tuple index for a p_frame_step build.

    Single source of truth shared by the step assembly and the
    encoder's fetch stage (the tuple grew too many optional tails for
    positional indexing).  ``lv8`` marks the dynamic-q int8 level
    shadow outputs (small flag + int8 casts of the three packs — the
    tunnel fetch pulls those when every level fits int8, halving the
    dominant per-frame transfer)."""
    names = ["sizes", "mv", "ly", "lu", "lv", "rec_y", "rec_u", "rec_v",
             "cdef"]
    if nrefs >= 2:
        names.append("ref8")
    if compound:
        names.append("mv2")
    if txs:
        names.append("txty")
    if rect:
        names.append("shape8")
    if lv8:
        names += ["small", "ly8", "lu8", "lv8",
                  "lflags", "lcount", "ply", "plu", "plv"]
    if lr:
        names += ["deb_y", "deb_u", "deb_v"]
    return {n: i for i, n in enumerate(names)}


def sparse_capacity(n_cells: int) -> int:
    """Fixed sparse-pack capacity (cells) — must match between the
    device pack and the host scatter.  Clamped to n_cells: the device
    builds the pack as argsort(flags)[:cap], and slicing clamps to the
    cell count, so a larger nominal capacity would make the fetch claim
    rows the pack never produced (frombuffer overrun on small frames)."""
    return min(n_cells, max(256, n_cells // 2))


def _block(plane, bs: int):
    h, w = plane.shape
    return plane.reshape(h // bs, bs, w // bs, bs).transpose(0, 2, 1, 3)


def _block_rect(plane, bh: int, bw: int):
    h, w = plane.shape
    return plane.reshape(h // bh, bh, w // bw, bw).transpose(0, 2, 1, 3)


# rect leaf shapes searched by the RD merge (PARTITION_HORZ / VERT at
# the 16 and 32 nodes; ref ext partition shapes, EbSvtAv1Enc.h:194).
# kind codes for the per-cell leaf map: 0..3 square 8/16/32/64, then
# the rect kinds below.
RECT_KINDS = {4: (16, "h"), 5: (16, "v"), 6: (32, "h"), 7: (32, "v")}
KIND_SIZE = np.array([8, 16, 32, 64, 16, 16, 32, 32], np.int32)
KIND_SHAPE = np.array([0, 0, 0, 0, 1, 2, 1, 2], np.int32)  # 1=HORZ 2=VERT
# rect luma tx per kind (h16 = 8x16px tall? no: HORZ at node 16 is a
# 16-wide x 8-high block -> TX_16X8; VERT -> TX_8X16)
RECT_TX = {4: T.TX_16X8, 5: T.TX_8X16, 6: T.TX_32X16, 7: T.TX_16X32}
RECT_TX_C = {4: T.TX_8X4, 5: T.TX_4X8, 6: T.TX_16X8, 7: T.TX_8X16}


def _unblock(blocks):
    nbh, nbw, bh, bw = blocks.shape
    return blocks.transpose(0, 2, 1, 3).reshape(nbh * bh, nbw * bw)


def _encode_plane(src_blocks, pred_blocks, qindex, tx_size: int,
                  bd: int = 8, tx_type: int = T.DCT_DCT):
    nbh, nbw, bh, bw = src_blocks.shape
    if getattr(qindex, "ndim", 0):
        # per-block qindex grid [nbh, nbw] (per-SB AQ) -> flat batch
        qindex = qindex.reshape(-1)
    resid = (src_blocks - pred_blocks).reshape(-1, bh, bw)
    # forward txfm on the MXU (f32 matrix path): the fwd side is an
    # encoder choice — levels are self-consistent with the normative
    # int32 INVERSE below, so recon parity never depends on it (max
    # |err| < 0.05 coeff LSB for bd<=10, see ops/transforms.py)
    coeff = T.fwd_txfm2d_batch(resid, tx_size, tx_type, bd)
    levels = Q.quantize_batch(coeff, qindex, tx_size, bd)
    if T.TX_W[tx_size] > 32 or T.TX_H[tx_size] > 32:
        # spec Adjusted_Tx_Size: only the top-left 32x32 coefficients of a
        # dim-64 transform are coded — zero the rest so recon matches the
        # decoder (which parses a 32x32 region into a zero 64x64 array)
        keep = np.zeros((T.TX_H[tx_size], T.TX_W[tx_size]), bool)
        keep[: min(32, T.TX_H[tx_size]), : min(32, T.TX_W[tx_size])] = True
        levels = jnp.where(jnp.asarray(keep), levels, 0)
    dq = Q.dequantize_batch(levels, qindex, tx_size, bd)
    rec = T.inv_txfm2d_batch(dq, tx_size, tx_type, bd)
    recon = jnp.clip(pred_blocks + rec.reshape(nbh, nbw, bh, bw), 0,
                     (1 << bd) - 1)
    return levels.reshape(nbh, nbw, bh, bw), recon


def _phase_grid(patch, bs: int, bd: int, kern):
    """Pixel-domain quarter-pel phase grid from a gathered patch.

    patch: [ext, ext, N] int32, ext = bs + 8, gathered at offset -4
    (filter halo + the -1 integer reach of negative deltas).  Returns
    P[py][px] planes, each [bs+1, bs+1, N] int16 clipped pixels:
    P[0][0] the full-pel copy, rows/cols 1..3 the 4/8/12 sixteenth-pel
    phases, with av1_convolve_{x,y,2d}_sr_c rounding case-for-case
    (shared by the per-size and the merged-cell subpel refiners)."""
    hi = (1 << bd) - 1

    def hconv(p, ker):                               # -> [:, bs+1, N]
        out = None
        for k, c in enumerate(ker):
            t = c * p[:, k : k + bs + 1, :]
            out = t if out is None else out + t
        return out

    def vconv(p, ker):                               # -> [bs+1, :, N]
        out = None
        for k, c in enumerate(ker):
            t = c * p[k : k + bs + 1, :, :]
            out = t if out is None else out + t
        return out

    rs = lambda x, n: (x + (1 << (n - 1))) >> n
    offset0 = 1 << (bd + 6)                          # 1 << (bd+FILTER_BITS-1)
    offset_bits = bd + 11                            # bd + 2*7 - 3
    sub = (1 << (bd - 1)) + (1 << (bd - 2))
    i16 = lambda x: x.astype(jnp.int16)
    P = [[None] * 4 for _ in range(4)]
    P[0][0] = i16(patch[3 : 4 + bs, 3 : 4 + bs, :])
    im = {}
    for pxi, px in enumerate((4, 8, 12)):
        # x-only (av1_convolve_x_sr_c rounding)
        P[0][pxi + 1] = i16(jnp.clip(
            rs(rs(hconv(patch[3 : 4 + bs, :, :], kern[px]), 3), 4), 0, hi))
        im[px] = rs(hconv(patch, kern[px]) + offset0, 3)
    for pyi, py in enumerate((4, 8, 12)):
        # y-only (av1_convolve_y_sr_c rounding)
        P[pyi + 1][0] = i16(jnp.clip(
            rs(vconv(patch[:, 3 : 4 + bs, :], kern[py]), 7), 0, hi))
        for pxi, px in enumerate((4, 8, 12)):
            # 2-D (av1_convolve_2d_sr_c rounding)
            P[pyi + 1][pxi + 1] = i16(jnp.clip(
                rs(vconv(im[px], kern[py]) + (1 << offset_bits), 11) - sub,
                0, hi))
    return P


def _filter_kern(filt: int):
    from svt_av1_tpu import tables as _tbl
    table = _tbl.spec_tables()[MC.FILTER_TABLES[filt]]
    return {p: tuple(int(v) for v in table[p]) for p in (4, 8, 12)}


def _subpel_refine_dense(src_blocks, ref_pad, mv_fp, bs: int, pad: int,
                         lam, prior8, bd: int = 8, filt: int = 0,
                         lat_reach: int = 6):
    """Dense quarter-pel refinement around full-pel MVs — ONE patch
    gather per block, then every candidate is a static slice.

    After full-pel ME all blocks sit at integer MVs, so every
    quarter-pel delta d in the 7x7 lattice {-6..6 step 2}^2 (1/8-pel
    units) has the SAME (integer offset, phase) decomposition across
    blocks.  We gather a [bs+8, bs+8] patch per block from the padded
    reference, interpolate the 4x4 quarter-pel phase grid on-patch with
    batched static-slice convs, and evaluate all 49 candidates
    (including d=0, which doubles as the true-reference re-score of the
    warped-sweep winner) as static slices.  This replaced a 16-round
    per-candidate gather loop (_subpel_refine) that was ~75% of the
    720p P-step (481 ms -> ~25 ms measured on one chip).

    Arithmetic matches ops.mc.filter_plane case-for-case (copy / x-only
    / y-only / 2-D rounding), so the costs equal what bank-gather MC
    produces.  ref HalfPelSearch_LCU / QuarterPelSearch_LCU
    (EbMotionEstimation.c:3829/:4746).
    """
    kern = _filter_kern(filt)
    nbh, nbw = mv_fp.shape[:2]
    # patch top-left = block origin + mv - 4 (filter halo + the -1
    # integer reach of negative deltas); N-MINOR layout so the block
    # axis rides the 128-wide vector lanes
    patch = G.gather_blocks_grid(ref_pad, mv_fp[..., 0], mv_fp[..., 1],
                                 bs, pad, pad - 1, halo=8, off=-4)
    patch = jnp.transpose(patch, (1, 2, 0)).astype(jnp.int32)  # [ext,ext,N]
    # pixel-domain phase grid P[py][px]: [bs+1, bs+1, N] each, stored
    # int16 (clipped pixels; halves the 16-plane HBM footprint that the
    # candidate loop re-reads)
    P = _phase_grid(patch, bs, bd, kern)

    i16 = lambda x: x.astype(jnp.int16)
    src = i16(jnp.transpose(src_blocks.reshape(-1, bs, bs), (1, 2, 0)))
    best_cost = None
    best_mv = None
    for dy in range(-lat_reach, lat_reach + 1, 2):
        pyi = ((2 * dy) & 15) >> 2
        fy = dy >> 3
        for dx in range(-lat_reach, lat_reach + 1, 2):
            pxi = ((2 * dx) & 15) >> 2
            fx = dx >> 3
            pred = P[pyi][pxi][fy + 1 : fy + 1 + bs, fx + 1 : fx + 1 + bs, :]
            # int16 |diff| (<= 2^bd), accumulate int32 (bs=32: 1024 terms)
            sad = jnp.abs(src - pred).sum((0, 1), dtype=jnp.int32
                                          ).reshape(nbh, nbw)
            mv8c = mv_fp * 8 + jnp.array([dy, dx], jnp.int32)
            cost = sad + ((lam * ME.mv_rate_bits(mv8c - prior8)) >> 4)
            if best_cost is None:
                best_cost, best_mv = cost, mv8c
            else:
                better = cost < best_cost
                best_cost = jnp.where(better, cost, best_cost)
                best_mv = jnp.where(better[..., None], mv8c, best_mv)
    return best_mv, best_cost


def _interp_patch(patch, ph_r, ph_c, bs: int, bd: int, jnt: bool,
                  filt: int = 0, both: bool = False):
    """Per-block subpel interpolation on gathered patches.

    patch: [N, bs+7, bs+7] int32 full-pel windows (top-left at position
    - 3, the 8-tap halo); ph_r/ph_c: [nbh, nbw] phase16 indices.
    Regular path reproduces ops.mc.filter_plane case-for-case (copy /
    x-only / y-only / 2-D rounding, selected per block arithmetically);
    jnt path is the CONV_BUF-domain av1_jnt_convolve_2d formula (valid
    for every phase).  N-minor layout: the block axis rides the vector
    lanes.  Returns [nbh, nbw, bs, bs].
    """
    from svt_av1_tpu import tables as _tbl
    table = jnp.asarray(_tbl.spec_tables()[MC.FILTER_TABLES[filt]],
                        jnp.int32)                       # [16, 8]
    nbh, nbw = ph_r.shape
    onehot = lambda ph: (ph.reshape(-1)[:, None]
                         == jnp.arange(16)[None]).astype(jnp.int32)
    kx = onehot(ph_c) @ table                            # [N, 8]
    ky = onehot(ph_r) @ table
    p = jnp.transpose(patch, (1, 2, 0)).astype(jnp.int32)  # [bs+7, bs+7, N]
    rs = lambda x, n: (x + (1 << (n - 1))) >> n
    hi = (1 << bd) - 1
    offset0 = 1 << (bd + 6)
    ob = bd + 11

    def hconv(src):
        out = None
        for k in range(8):
            t = src[:, k : k + bs, :] * kx[:, k]
            out = t if out is None else out + t
        return out                                       # [rows, bs, N]

    def vconv(src):
        out = None
        for k in range(8):
            t = src[k : k + bs] * ky[:, k]
            out = t if out is None else out + t
        return out                                       # [bs, cols, N]

    hc = hconv(p)                                        # [bs+7, bs, N]
    im = rs(hc + offset0, 3)
    twod_acc = vconv(im)
    fin = lambda x: jnp.transpose(x, (2, 0, 1)).reshape(nbh, nbw, bs, bs)
    jnt_out = None
    if jnt or both:
        # CONV_BUF-domain output (compound averaging); shares hc/im/twod
        # with the regular path when both are wanted (one conv, two
        # finishes — the convs dominate)
        jnt_out = fin(rs(twod_acc + (1 << ob), 7))
        if not both:
            return jnt_out
    sub = (1 << (bd - 1)) + (1 << (bd - 2))
    twod = jnp.clip(rs(twod_acc + (1 << ob), 11) - sub, 0, hi)
    x_only = jnp.clip(rs(rs(hc[3 : 3 + bs], 3), 4), 0, hi)
    y_only = jnp.clip(rs(vconv(p[:, 3 : 3 + bs, :]), 7), 0, hi)
    copy = p[3 : 3 + bs, 3 : 3 + bs, :]
    phx0 = ph_c.reshape(-1) == 0
    phy0 = ph_r.reshape(-1) == 0
    out = jnp.where(phx0 & phy0, copy,
                    jnp.where(phy0, x_only,
                              jnp.where(phx0, y_only, twod)))
    return (fin(out), jnt_out) if both else fin(out)


def _gather_mc_patch(plane_pad, mv8, bs: int, pad: int, chroma: bool):
    """One grid-anchored patch gather for subpel MC; returns
    (patch [N, bs+7, bs+7], ph_r, ph_c)."""
    if chroma:
        f_r, f_c = mv8[..., 0] >> 4, mv8[..., 1] >> 4
        ph_r, ph_c = mv8[..., 0] & 15, mv8[..., 1] & 15
    else:
        f_r, f_c = mv8[..., 0] >> 3, mv8[..., 1] >> 3
        ph_r, ph_c = (mv8[..., 0] * 2) & 15, (mv8[..., 1] * 2) & 15
    patch = G.gather_blocks_grid(plane_pad, f_r, f_c, bs, pad, pad,
                                 halo=7, off=-3)
    return patch, ph_r, ph_c


def _mc_patch(plane_pad, mv8, bs: int, pad: int, chroma: bool, bd: int,
              jnt: bool = False, filt: int = 0):
    """Subpel MC via one grid-anchored patch gather + on-patch interp
    (replaces whole-plane phase banks + per-block bank gathers: XLA's
    per-slice gather ran at ~3.7 us/slice; ops.gather's one-hot-matmul
    tile gather is ~35x faster)."""
    patch, ph_r, ph_c = _gather_mc_patch(plane_pad, mv8, bs, pad, chroma)
    return _interp_patch(patch, ph_r, ph_c, bs, bd, jnt, filt)


# compound signaling beyond a single-ref leaf (comp_inter + ref pair +
# NEW_NEWMV symbol), from the default CDFs
COMP_EXTRA_BITS = round(_LEAF["comp_extra"])


def _coeff_bits(lv):
    """Per-block coefficient-rate estimate in bits from quantized levels.

    Models the coefficient syntax's magnitude cost (base + br + golomb
    tail ~ 3 + 2*bitlength(|l|) bits per nonzero) plus an eob/skip
    amortization — the batched stand-in for per-symbol CDF lookups (ref
    av1_estimate_syntax_rate, EbMdRateEstimation.c:76).  lv: [..., n, n]
    -> [...] int32 bits.
    """
    a = jnp.abs(lv)
    nb = jnp.ceil(jnp.log2(a.astype(jnp.float32) + 1.0)).astype(jnp.int32)
    bits = jnp.where(a > 0, 3 + 2 * nb, 0).sum((-1, -2))
    nz = (a > 0).any((-1, -2))
    return bits + jnp.where(nz, 4, 1)


def _sum4(a):
    """[2H, 2W] -> [H, W] 2x2 block sum."""
    return a.reshape(a.shape[0] // 2, 2, a.shape[1] // 2, 2).sum((1, 3))


def _tiles8(x, t: int):
    """[gh, gw, bh, bw] block grid -> [gh*bh/t, gw*bw/t, t, t] tile grid
    (pure reshuffle; host inverts it with numpy).  Handles rectangular
    blocks: block (R, C) lands its (i, j) tile at cell (R*bh/t + i,
    C*bw/t + j)."""
    gh, gw, bh, bw = x.shape
    kh, kw = bh // t, bw // t
    return (x.reshape(gh, gw, kh, t, kw, t).transpose(0, 2, 1, 4, 3, 5)
            .reshape(gh * kh, gw * kw, t, t))


def p_frame_step(ph: int, pw: int, qindex=None, search: int = SEARCH_RANGE,
                 nrefs: int = 1, compound: bool = False, bd: int = 8,
                 rdo: bool = True, txs: bool = False, filt: int = 0,
                 gm: bool = False, lr: bool = False, rect: bool = False,
                 filters: bool = True, aq: bool = False):
    """Build the (unjitted) P/B-frame encode step.

    Geometry: ph, pw are the *64-padded* plane dims (multiples of 64,
    so the 64x64 merge level tiles evenly).
    fn(src_y [ph,pw], src_u, src_v [ph/2,pw/2],
       ref0_y, ref0_u, ref0_v [, ref1_y, ref1_u, ref1_v when nrefs=2]
       [, qindex, lf_y, lf_u, lf_v — when built with qindex=None, rate
       control varies q per frame without recompiling])
    -> (sizes [nb8h,nb8w] u8 (8..64 leaf size covering each 8x8 cell),
        mv8   [nb8h,nb8w,2] i16 (selected leaf MV, replicated per cell),
        levels y/u/v at each size (9 arrays, i16),
        recon_y [ph,pw] u8, recon_u, recon_v, cdef idx
        [, ref8 [nb8h,nb8w] u8 (0 = ref0/fwd, 1 = ref1/bwd) when nrefs=2])

    With nrefs=2 the full ME pipeline runs against both references and
    every leaf size picks the cheaper one per block (the TPU analog of
    the reference's per-ref ME loop in EbMotionEstimation.c; the per-ref
    results stay batched device arrays instead of per-PU loops).
    """
    pad = search + 1
    txs = txs and rdo
    rect = rect and rdo
    from svt_av1_tpu import tables as _tbl
    dynamic_q = qindex is None

    nb8h, nb8w = ph // 8, pw // 8

    def step(sy, su, sv, *rest):
        refs = rest[: 3 * nrefs]
        dyn = rest[3 * nrefs:]
        # global-motion candidate (TRANSLATION): trailing dyn arg [2]
        # int32 in 1/8-pel (spec GlobalMvs; injected per size below)
        gmv = dyn[-1] if gm else None
        ph_mi, pw_mi = mi_extent[0], mi_extent[1]
        use_cdef = use_cdef_cell[0]
        if dynamic_q:
            q = dyn[0]
            lf_levels = (dyn[1], dyn[1], dyn[2], dyn[3])
            ac = jnp.asarray(_tbl.spec_tables()[f"ac_qlookup_{bd}"])[q]
            lam = jnp.maximum(8, ac // 4).astype(jnp.int32)
            # per-superblock adaptive quantization: dyn carries the
            # ABSOLUTE per-SB qindex map [ph/64, pw/64]; residual
            # quantization (and ONLY it) goes per-block — lambda, loop
            # filters and CDEF damping stay at the frame base q (spec:
            # those are frame-header driven)
            qmap = dyn[4] if aq else None
        else:
            q = qindex
            lf_levels = lf_levels_cell[0]
            # SAD-domain lambda from the quantizer step (the reference
            # scales its fast-loop lambda with qstep; EbLambdaRateTables.h)
            lam = max(8, _tbl.ac_q(qindex, bd) // 4)
        sy = sy.astype(jnp.int32)
        su = su.astype(jnp.int32)
        sv = sv.astype(jnp.int32)
        cpad = pad // 2 + 1
        # padded full-pel planes stay in the NATIVE pixel dtype (uint8 /
        # uint16): every consumer is a patch gather (bf16 one-hot path
        # for 8-bit) or an int16 SAD sweep — the step is HBM-bound
        # (~133 GB/frame measured at 1080p before narrowing), so plane
        # bytes are the scarce resource, not ALU width
        padded = []   # full-pel padded planes (all MC is patch-gathered)
        for i in range(nrefs):
            py_ = MC.pad_for_filter(jnp, refs[3 * i], pad)
            pu_ = MC.pad_for_filter(jnp, refs[3 * i + 1], cpad)
            pv_ = MC.pad_for_filter(jnp, refs[3 * i + 2], cpad)
            padded.append((py_, pu_, pv_))

        def me_one_ref(ry_i, py_pad_i, centers_hint=None):
            # hierarchical full-pel ME: quarter-res center search, then a
            # +-r2 multi-size sweep on a center-warped reference (10x
            # fewer offsets than exhaustive; ref HME levels 0-2).  The
            # speed preset narrows the sweep to +-3 (49 offsets): the
            # quarter-res HME center plus the quarter-pel refinement's
            # +-0.75 reach keeps the effective range (ref preset-gated
            # search areas, signal_derivation_me_kernel_oq)
            r2 = 4 if rdo else 3
            ref_pad = jnp.pad(ry_i, search, mode="edge")
            centers = (centers_hint if centers_hint is not None
                       else ME.hme_centers(sy, ry_i,
                                           search_reach=search - r2))
            warped = ME.warp_by_centers(ref_pad, centers, 32, search)
            # ONE image-diff sweep; both selections (unbiased winners ->
            # MVP priors, then rate-biased winners) are reductions over
            # the stored lattice (was two full sweeps)
            lat = ME.sad_lattice_multisize(sy, warped, r2, bd)
            p1 = ME.select_from_lattice(lat, centers, 32, r2)
            priors = {bs: ME.median3_mv_field(p1[bs][0]) for bs in SIZES}
            p2 = ME.select_from_lattice(lat, centers, 32, r2, lam, priors)
            mv_i, cost_i = {}, {}
            if not rdo:
                # speed preset: NO per-size subpel here — the merge runs
                # on full-pel lattice costs and ONE cell-granularity
                # quarter-pel refinement follows the partition decision
                # (the reference's fast presets likewise partition from
                # the full-pel ME pyramid and refine the winner,
                # signal_derivation_me_kernel_oq).  The 64 level comes
                # straight from the lattice (2x2 sums of the 32 level)
                # instead of four per-child MC evaluations.
                priors[64] = priors[32][::2, ::2]
                for bs in SIZES:
                    mv_i[bs] = p2[bs][0] * 8          # 1/8-pel units
                    cost_i[bs] = p2[bs][1]
                n_ = 2 * r2 + 1
                lat64 = lat[32].reshape(
                    n_ * n_, lat[32].shape[1] // 2, 2,
                    lat[32].shape[2] // 2, 2).sum((2, 4))
                cen64 = centers[::2, ::2]
                dyx64 = jnp.stack([jnp.arange(n_ * n_) // n_ - r2,
                                   jnp.arange(n_ * n_) % n_ - r2], -1)
                c64 = lat64 + ((lam * ME.mv_rate_bits(
                    (cen64[None] + dyx64[:, None, None, :]) * 8
                    - priors[64][None] * 8)) >> 4)
                k64 = jnp.argmin(c64, 0)
                oh64 = (k64[..., None]
                        == jnp.arange(n_ * n_)[None, None]).astype(jnp.int32)
                mv_i[64] = (cen64 + oh64 @ dyx64) * 8
                cost_i[64] = c64.min(0)
                return mv_i, cost_i, priors
            for bs in SIZES:
                # dense quarter-pel refine against the TRUE reference;
                # its d=0 candidate re-scores the warped-sweep winner
                # (the warped cost is approximate near tile seams)
                mv_i[bs], cost_i[bs] = _subpel_refine_dense(
                    _block(sy, bs), py_pad_i, p2[bs][0], bs, pad, lam,
                    priors[bs] * 8, bd, filt, lat_reach=6)
            priors[64] = priors[32][::2, ::2]
            return mv_i, cost_i, priors

        def me64(py_pad_i, mv32, prior64_fp):
            """64x64 leaf candidates: the four 32x32 children's refined
            subpel MVs, each evaluated on the whole 64 block (ref: the
            64x64 PU reuses the 32x32 search results in the ME pyramid,
            EbMotionEstimation.c sb64 combining)."""
            src64 = _block(sy, 64)
            best_mv = best_cost = None
            for dr in (0, 1):
                for dc in (0, 1):
                    mvc = mv32[dr::2, dc::2]
                    pred = _mc_patch(py_pad_i, mvc, 64, pad, False, bd,
                                     filt=filt)
                    sad = jnp.abs(src64 - pred).sum((-1, -2))
                    c = sad + ((lam * ME.mv_rate_bits(mvc - prior64_fp * 8))
                               >> 4)
                    if best_mv is None:
                        best_mv, best_cost = mvc, c
                    else:
                        better = c < best_cost
                        best_mv = jnp.where(better[..., None], mvc, best_mv)
                        best_cost = jnp.minimum(c, best_cost)
            return best_mv, best_cost

        r2_ = 4 if rdo else 3
        centers0 = ME.hme_centers(sy, refs[0].astype(jnp.int32),
                                  search_reach=search - r2_)
        per_ref = [me_one_ref(refs[0], padded[0][0], centers0)]
        for i in range(1, nrefs):
            # speed preset: seed the NEAR bwd ref's HME from the
            # mirrored fwd centers (hier-B refs sit symmetrically around
            # the source, so the fields are opposite to first order; the
            # +-r2 lattice + subpel recover the residual) instead of a
            # second quarter-res full search.  Farther refs (i >= 2,
            # e.g. ALTREF at an unknown temporal distance) run their own
            # quarter-res search.
            hint = (jnp.clip(-centers0, -(search - r2_), search - r2_)
                    if (not rdo and i == 1) else None)
            per_ref.append(me_one_ref(refs[3 * i], padded[i][0], hint))
        mv, cost = per_ref[0][:2]
        if gm and nrefs == 1:
            # GLOBALMV candidate: prediction at the frame's global
            # translation, charged mode bits but no MV bits (ref
            # GLOBALMV injection, EbModeDecision.c inject loop)
            mv = dict(mv)
            cost = dict(cost)
            if rdo:
                for bs in SIZES:
                    nbh_g, nbw_g = mv[bs].shape[:2]
                    mvg = jnp.broadcast_to(
                        gmv[None, None, :],
                        (nbh_g, nbw_g, 2)).astype(jnp.int32)
                    predg = _mc_patch(padded[0][0], mvg, bs, pad, False,
                                      bd, filt=filt)
                    sadg = jnp.abs(_block(sy, bs) - predg).sum((-1, -2))
                    costg = sadg + ((lam * 4) >> 4)
                    use_g = costg < cost[bs]
                    mv[bs] = jnp.where(use_g[..., None], mvg, mv[bs])
                    cost[bs] = jnp.minimum(costg, cost[bs])
            else:
                # speed preset: the estimator emits FULL-pel global
                # vectors, so one copy-gather at the 8 level + 2x2
                # lattice sums score every size (replaces 3 subpel MC
                # evaluations)
                nbh8_, nbw8_ = ph // 8, pw // 8
                tiles = G.gather_blocks_grid(
                    padded[0][0],
                    jnp.broadcast_to(gmv[0] >> 3, (nbh8_, nbw8_)),
                    jnp.broadcast_to(gmv[1] >> 3, (nbh8_, nbw8_)),
                    8, pad, pad - 1)
                sadg = {8: jnp.abs(
                    _block(sy, 8) - tiles.reshape(nbh8_, nbw8_, 8, 8)
                    .astype(jnp.int32)).sum((-1, -2))}
                for bs in (16, 32, 64):
                    sadg[bs] = _sum4(sadg[bs // 2])
                for bs in SIZES64:
                    nbh_g, nbw_g = mv[bs].shape[:2]
                    mvg = jnp.broadcast_to(
                        gmv[None, None, :],
                        (nbh_g, nbw_g, 2)).astype(jnp.int32)
                    costg = sadg[bs] + ((lam * 4) >> 4)
                    use_g = costg < cost[bs]
                    mv[bs] = jnp.where(use_g[..., None], mvg, mv[bs])
                    cost[bs] = jnp.minimum(costg, cost[bs])
        # 64x64 leaf candidates per reference (post-GM so pans inherit
        # the injected global MV through the 32 winners); the speed
        # preset selected its 64 level from the lattice in me_one_ref
        mv = dict(mv)
        cost = dict(cost)
        if rdo:
            mv[64], cost[64] = me64(padded[0][0], mv[32],
                                    per_ref[0][2][64])
        # clean per-ref MV snapshots for the post-merge cell refinement
        # (the argmin loop below mutates mv in place)
        per_ref_mv = [dict(mv)]
        refsel = {bs: None for bs in SIZES64}
        mv_c = {bs: None for bs in SIZES64}   # compound second (bwd) MV
        if nrefs >= 2:
            # per-ref 64 level + argmin single-ref selection over ALL
            # refs (ref: candidate injection across the ref lists,
            # EbModeDecision.c:1120-2364; Av1GenerateRpsInfo builds the
            # lists, EbPictureDecisionProcess.c:1094).  The compound
            # pair stays (ref0, ref1) = the temporally nearest fwd/bwd.
            mvs_all, costs_all = [mv], [cost]
            for i in range(1, nrefs):
                mvi, costi = dict(per_ref[i][0]), dict(per_ref[i][1])
                if rdo:
                    mvi[64], costi[64] = me64(padded[i][0], mvi[32],
                                              per_ref[i][2][64])
                mvs_all.append(mvi)
                costs_all.append(costi)
                per_ref_mv.append(dict(mvi))
            for bs in SIZES64:
                sel = jnp.zeros(costs_all[0][bs].shape, jnp.uint8)
                best_c = costs_all[0][bs]
                best_mv = mvs_all[0][bs]
                for i in range(1, nrefs):
                    better = costs_all[i][bs] < best_c
                    sel = jnp.where(better, np.uint8(i), sel)
                    best_c = jnp.minimum(costs_all[i][bs], best_c)
                    best_mv = jnp.where(better[..., None],
                                        mvs_all[i][bs], best_mv)
                if compound and rdo:
                    # COMPOUND_AVERAGE candidate from the per-ref best
                    # MVs (ref per-ref ME + BI candidate injection).
                    # Speed preset: the compound decision moves AFTER
                    # the merge + cell refinement (no per-size MC here)
                    mid0 = _mc_patch(padded[0][0], mvs_all[0][bs], bs,
                                     pad, False, bd, jnt=True, filt=filt)
                    mid1 = _mc_patch(padded[1][0], mvs_all[1][bs], bs,
                                     pad, False, bd, jnt=True, filt=filt)
                    pred_c = MC.jnt_average(jnp, mid0, mid1, bd)
                    rate = (ME.mv_rate_bits(mvs_all[0][bs]
                                            - per_ref[0][2][bs] * 8)
                            + ME.mv_rate_bits(mvs_all[1][bs]
                                              - per_ref[1][2][bs] * 8)
                            + COMP_EXTRA_BITS)
                    cost_c = (jnp.abs(_block(sy, bs) - pred_c).sum((-1, -2))
                              + ((lam * rate) >> 4))
                    use_c = cost_c < best_c
                    refsel[bs] = jnp.where(use_c, np.uint8(nrefs), sel)
                    mv[bs] = jnp.where(use_c[..., None], mvs_all[0][bs],
                                       best_mv)
                    mv_c[bs] = mvs_all[1][bs]
                    cost[bs] = jnp.minimum(cost_c, best_c)
                else:
                    refsel[bs] = sel
                    mv[bs] = best_mv
                    cost[bs] = best_c
                    if compound:
                        # compound skipped at this size (speed preset):
                        # keep a well-formed second-MV field — no cell
                        # selects the compound marker here
                        mv_c[bs] = mvs_all[1][bs]

        # --- per-size MC + residual coding + RD costs (rdo path) ---------
        def mc_one(plane_idx, chroma, bs2, pad2, mvs, mvs_c, sel):
            # compound reuses ref0's patch gather AND its convolution
            # core (both=True): regular + CONV_BUF outputs from one pass
            pt0, r0, c0 = _gather_mc_patch(padded[0][plane_idx], mvs,
                                           bs2, pad2, chroma)
            if nrefs >= 2 and compound:
                p0, m0 = _interp_patch(pt0, r0, c0, bs2, bd, False, filt,
                                       both=True)
            else:
                p0 = _interp_patch(pt0, r0, c0, bs2, bd, False, filt)
            if nrefs == 1:
                return p0
            out = p0
            for i in range(1, nrefs):
                pi = _mc_patch(padded[i][plane_idx], mvs, bs2, pad2,
                               chroma, bd, filt=filt)
                out = jnp.where((sel == i)[..., None, None], pi, out)
            if compound:
                m1 = _mc_patch(padded[1][plane_idx], mvs_c, bs2, pad2,
                               chroma, bd, jnt=True, filt=filt)
                pc = MC.jnt_average(jnp, m0, m1, bd)
                out = jnp.where((sel == nrefs)[..., None, None], pc, out)
            return out

        def qq(bsh, bsw=None):
            """quantizer grid for residual coding at block size
            (bsh, bsw): the per-SB map expanded to per-block cells when
            AQ rides the frame, else the frame scalar."""
            if not (dynamic_q and aq):
                return q
            bsw = bsh if bsw is None else bsw
            return jnp.repeat(jnp.repeat(qmap, 64 // bsh, 0),
                              64 // bsw, 1)

        levels = {}
        rec_planes = {}
        if rdo:
            # full-RD merge: distortion = SSE of the ACTUAL recon (all
            # three planes), rate = estimated coefficient bits + MV bits
            # + mode/partition overheads, lambda ~ 3*qstep^2 (the
            # reference's rdmult scaling, av1_compute_rd_mult /
            # EbLambdaRateTables.h).  J compared in f32 (values to ~1e8;
            # decisions only).  ref mode_decision_sb full-loop RD
            # (EbProductCodingLoop.c:1880, EbRateDistortionCost.c).
            # lambda ~ 0.25 * qstep^2 (qstep = ac_q/8): matches the
            # effective libaom rdmult scale (rdmult=88q^2/24, rate in
            # 1/512-bit units, dist << 4) — 3*qstep^2 measured ~0.5%
            # BD-rate WORSE on the harness
            if dynamic_q:
                lam_rd = jnp.maximum(
                    4, (ac * ac) >> 8).astype(jnp.float32)
            else:
                acq = _tbl.ac_q(qindex, bd)
                lam_rd = float(max(4, (acq * acq) >> 8))
            jcost = {}
            txty = {}
            for bs in SIZES64:
                src_b = _block(sy, bs)
                pred_y = mc_one(0, False, bs, pad, mv[bs], mv_c[bs],
                                refsel[bs])
                cbs = bs // 2
                su_b, sv_b = _block(su, cbs), _block(sv, cbs)
                pred_u = mc_one(1, True, cbs, cpad, mv[bs], mv_c[bs],
                                refsel[bs])
                pred_v = mc_one(2, True, cbs, cpad, mv[bs], mv_c[bs],
                                refsel[bs])
                base_r = (ME.mv_rate_bits(mv[bs] - per_ref[0][2][bs] * 8)
                          + round(_LEAF["mode"]
                                  + (_LEAF["ref_single"]
                                     if nrefs >= 2 else 0)))
                if compound:
                    base_r = base_r + jnp.where(
                        refsel[bs] == nrefs,
                        ME.mv_rate_bits(mv_c[bs] - per_ref[1][2][bs] * 8)
                        + COMP_EXTRA_BITS, 0)
                # tx-type search (ref ENCDEC_TX_SEARCH full-loop,
                # EbProductCodingLoop.c:1880): code the leaf with every
                # candidate type of the inter reduced set (DCT, IDTX) and
                # keep the J winner.  Inter chroma inherits the luma type
                # (spec compute_tx_type), so variants are evaluated
                # jointly; when the winning variant has NO luma coeffs
                # the tx-type symbol is never coded and the decoder
                # infers DCT — force the DCT variant there.
                # dim-64 transforms are DCT-only (spec ext-tx DCTONLY set)
                cand_types = ((T.DCT_DCT,) if (not txs or bs == 64)
                              else (T.DCT_DCT, T.IDTX))
                best = None
                for ty in cand_types:
                    ly, rec_y = _encode_plane(src_b, pred_y, qq(bs),
                                              TX_OF[bs], bd, ty)
                    lu, rec_u = _encode_plane(su_b, pred_u, qq(bs),
                                              TX_OF_C[bs], bd, ty)
                    lv, rec_v = _encode_plane(sv_b, pred_v, qq(bs),
                                              TX_OF_C[bs], bd, ty)
                    d = (((src_b - rec_y) ** 2).sum((-1, -2))
                         + ((su_b - rec_u) ** 2).sum((-1, -2))
                         + ((sv_b - rec_v) ** 2).sum((-1, -2)))
                    r = (_coeff_bits(ly) + _coeff_bits(lu)
                         + _coeff_bits(lv) + base_r)
                    j = d.astype(jnp.float32) + lam_rd * r
                    if best is None:
                        best = [j, ly, lu, lv, rec_y, rec_u, rec_v,
                                jnp.zeros_like(j, dtype=jnp.uint8)]
                    else:
                        pick = ((j < best[0])
                                & (ly != 0).any((-1, -2)))
                        w2 = lambda a, b: jnp.where(
                            pick[..., None, None], a, b)
                        best = [jnp.where(pick, j, best[0]),
                                w2(ly, best[1]), w2(lu, best[2]),
                                w2(lv, best[3]), w2(rec_y, best[4]),
                                w2(rec_u, best[5]), w2(rec_v, best[6]),
                                jnp.where(pick, jnp.uint8(ty),
                                          best[7])]
                jcost[bs] = best[0]
                txty[bs] = best[7]
                levels[bs] = (best[1].astype(jnp.int16),
                              best[2].astype(jnp.int16),
                              best[3].astype(jnp.int16))
                rec_planes[bs] = (_unblock(best[4]), _unblock(best[5]),
                                  _unblock(best[6]))
            rect_d = {}
            if rect:
                # rect leaf hypotheses (PARTITION_HORZ / VERT at the 16
                # and 32 nodes): each rect half inherits the full inter
                # descriptor (mv / ref select / second mv) of its
                # cheaper square child, predicted at 8x8-cell
                # granularity (interpolation is translation-invariant)
                # and coded with the matching rect transform; the merge
                # below weighs both halves' true J against NONE/SPLIT.
                # ref: ext partition shapes in mode_decision_sb
                # (EbProductCodingLoop.c:3300, EbSvtAv1Enc.h:194).
                for kind, (ns, shp) in RECT_KINDS.items():
                    cs = ns // 2
                    horz = shp == "h"
                    if horz:
                        slc = (lambda a: a[:, 0::2], lambda a: a[:, 1::2])
                        bh_, bw_ = cs, ns
                    else:
                        slc = (lambda a: a[0::2, :], lambda a: a[1::2, :])
                        bh_, bw_ = ns, cs
                    selB = slc[1](cost[cs]) < slc[0](cost[cs])

                    def pick(a, _s=selB, _sl=slc):
                        m = _s[..., None] if a.ndim == 3 else _s
                        return jnp.where(m, _sl[1](a), _sl[0](a))

                    rmv = pick(mv[cs])
                    rpri = pick(per_ref[0][2][cs])
                    rsel = (None if refsel[cs] is None
                            else pick(refsel[cs]))
                    rmv2 = None if mv_c[cs] is None else pick(mv_c[cs])
                    reph, repw = bh_ // 8, bw_ // 8
                    up = lambda a: jnp.repeat(jnp.repeat(a, reph, 0),
                                              repw, 1)
                    cmv = up(rmv).astype(jnp.int32)
                    csel = None if rsel is None else up(rsel)
                    cmv2 = (None if rmv2 is None
                            else up(rmv2).astype(jnp.int32))
                    py_ = _unblock(mc_one(0, False, 8, pad, cmv, cmv2,
                                          csel))
                    pu_ = _unblock(mc_one(1, True, 4, cpad, cmv, cmv2,
                                          csel))
                    pv_ = _unblock(mc_one(2, True, 4, cpad, cmv, cmv2,
                                          csel))
                    sby = _block_rect(sy, bh_, bw_)
                    sbu = _block_rect(su, bh_ // 2, bw_ // 2)
                    sbv = _block_rect(sv, bh_ // 2, bw_ // 2)
                    qr = qq(bh_, bw_)
                    ly_, ry_ = _encode_plane(sby, _block_rect(py_, bh_, bw_),
                                             qr, RECT_TX[kind], bd)
                    lu_, ru_ = _encode_plane(
                        sbu, _block_rect(pu_, bh_ // 2, bw_ // 2), qr,
                        RECT_TX_C[kind], bd)
                    lv_, rv_ = _encode_plane(
                        sbv, _block_rect(pv_, bh_ // 2, bw_ // 2), qr,
                        RECT_TX_C[kind], bd)
                    d = (((sby - ry_) ** 2).sum((-1, -2))
                         + ((sbu - ru_) ** 2).sum((-1, -2))
                         + ((sbv - rv_) ** 2).sum((-1, -2)))
                    r = (_coeff_bits(ly_) + _coeff_bits(lu_)
                         + _coeff_bits(lv_)
                         + ME.mv_rate_bits(rmv - rpri * 8)
                         + round(_LEAF["mode"]
                                 + (_LEAF["ref_single"]
                                    if nrefs >= 2 else 0)))
                    if compound:
                        rpri2 = pick(per_ref[1][2][cs])
                        r = r + jnp.where(
                            rsel == nrefs,
                            ME.mv_rate_bits(rmv2 - rpri2 * 8)
                            + COMP_EXTRA_BITS, 0)
                    jr = d.astype(jnp.float32) + lam_rd * r
                    jnode = ((jr[0::2] + jr[1::2]) if horz
                             else (jr[:, 0::2] + jr[:, 1::2]))
                    rect_d[kind] = {
                        "j": jnode, "mv": cmv.astype(jnp.int16),
                        "sel": csel, "mv2": (None if cmv2 is None
                                             else cmv2.astype(jnp.int16)),
                        "levels": (ly_.astype(jnp.int16),
                                   lu_.astype(jnp.int16),
                                   lv_.astype(jnp.int16)),
                        "rec": (_unblock(ry_), _unblock(ru_),
                                _unblock(rv_))}

            INF = jnp.float32(3e38)
            ins16 = jnp.asarray(inside16)
            ins32 = jnp.asarray(inside32)
            ins64 = jnp.asarray(inside64)
            j8 = jcost[8] + lam_rd * _PART_BITS[8][0]
            j_split16 = _sum4(j8) + lam_rd * _PART_BITS[16][1]
            j16 = jnp.where(ins16, jcost[16] + lam_rd * _PART_BITS[16][0],
                            INF)
            if rect:
                jh16 = jnp.where(
                    ins16, rect_d[4]["j"] + lam_rd * _PART_BITS[16][2], INF)
                jv16 = jnp.where(
                    ins16, rect_d[5]["j"] + lam_rd * _PART_BITS[16][3], INF)
                j_at16 = jnp.minimum(jnp.minimum(j16, j_split16),
                                     jnp.minimum(jh16, jv16))
                choice16 = jnp.where(
                    j_at16 == j16, 0,
                    jnp.where(j_at16 == jh16, 1,
                              jnp.where(j_at16 == jv16, 2, 3))
                ).astype(jnp.uint8)
            else:
                use16 = j16 <= j_split16
                choice16 = jnp.where(use16, 0, 3).astype(jnp.uint8)
                j_at16 = jnp.where(use16, j16, j_split16)
            j_split32 = _sum4(j_at16) + lam_rd * _PART_BITS[32][1]
            j32 = jnp.where(ins32, jcost[32] + lam_rd * _PART_BITS[32][0],
                            INF)
            if rect:
                jh32 = jnp.where(
                    ins32, rect_d[6]["j"] + lam_rd * _PART_BITS[32][2], INF)
                jv32 = jnp.where(
                    ins32, rect_d[7]["j"] + lam_rd * _PART_BITS[32][3], INF)
                j_at32 = jnp.minimum(jnp.minimum(j32, j_split32),
                                     jnp.minimum(jh32, jv32))
                choice32 = jnp.where(
                    j_at32 == j32, 0,
                    jnp.where(j_at32 == jh32, 1,
                              jnp.where(j_at32 == jv32, 2, 3))
                ).astype(jnp.uint8)
            else:
                use32 = j32 <= j_split32
                choice32 = jnp.where(use32, 0, 3).astype(jnp.uint8)
                j_at32 = jnp.where(use32, j32, j_split32)
            j_split64 = _sum4(j_at32) + lam_rd * _PART_BITS[64][1]
            j64 = jnp.where(ins64, jcost[64] + lam_rd * _PART_BITS[64][0],
                            INF)
            use64 = j64 <= j_split64
        else:
            # fast path (preset 8): SAD-domain rate-biased merge from the
            # ME costs; residual coding happens once, at the selected
            # size, below
            mb = _LEAF["mode"] + (_LEAF["ref_single"] if nrefs >= 2 else 0)
            oh = {bs: (lam * round(mb + _PART_BITS[bs][0])) >> 4
                  for bs in SIZES64}
            sp = {bs: (lam * round(_PART_BITS[bs][1])) >> 4
                  for bs in (16, 32, 64)}
            j8 = cost[8] + oh[8]
            j_split16 = _sum4(j8) + sp[16]
            j16 = cost[16] + oh[16]
            use16 = (j16 <= j_split16) & jnp.asarray(inside16)
            choice16 = jnp.where(use16, 0, 3).astype(jnp.uint8)
            j_at16 = jnp.where(use16, j16, j_split16)
            j_split32 = _sum4(j_at16) + sp[32]
            j32 = cost[32] + oh[32]
            use32 = (j32 <= j_split32) & jnp.asarray(inside32)
            choice32 = jnp.where(use32, 0, 3).astype(jnp.uint8)
            j_at32 = jnp.where(use32, j32, j_split32)
            j_split64 = _sum4(j_at32) + sp[64]
            j64 = cost[64] + oh[64]
            use64 = j64 <= j_split64

        # edge legality for 64 (16/32 legality is folded into choices);
        # ph/pw are 64-padded so only the true frame geometry matters.
        use64 = use64 & jnp.asarray(inside64)

        # per-8x8-cell leaf-kind map: 0..3 square 8/16/32/64, 4..7 rect
        # (RECT_KINDS); choiceN: 0 NONE, 1 HORZ, 2 VERT, 3 SPLIT
        up2 = lambda a: jnp.repeat(jnp.repeat(a, 2, 0), 2, 1)
        up8 = lambda a: up2(up2(up2(a)))
        c16c = up2(choice16)
        kind16 = jnp.where(c16c == 0, 1,
                           jnp.where(c16c == 1, 4,
                                     jnp.where(c16c == 2, 5, 0)))
        c32c = up2(up2(choice32))
        kind32 = jnp.where(c32c == 0, 2,
                           jnp.where(c32c == 1, 6,
                                     jnp.where(c32c == 2, 7, 255)))
        kind8 = jnp.where(up8(use64), 3,
                          jnp.where(kind32 != 255, kind32,
                                    kind16)).astype(jnp.uint8)
        size8 = jnp.where(
            kind8 == 3, 64,
            jnp.where((kind8 == 2) | (kind8 == 6) | (kind8 == 7), 32,
                      jnp.where(kind8 == 0, 8, 16))).astype(jnp.uint8)
        shape8 = jnp.where(
            (kind8 == 4) | (kind8 == 6), 1,
            jnp.where((kind8 == 5) | (kind8 == 7), 2, 0)).astype(jnp.uint8)

        def kpick(per_kind, dtype):
            """Per-cell select over leaf kinds (per_kind: {kind: cell
            array}; kinds absent from the map never win)."""
            out = per_kind[0]
            for k in sorted(per_kind):
                if k == 0 or per_kind[k] is None:
                    continue
                m = kind8 == k
                v = per_kind[k]
                if v.ndim > m.ndim:
                    m = m.reshape(m.shape + (1,) * (v.ndim - m.ndim))
                out = jnp.where(m, v, out)
            return out.astype(dtype)

        sq_cells = lambda d: {0: d[8], 1: up2(d[16]), 2: up2(up2(d[32])),
                              3: up8(d[64])}
        mv_cells = sq_cells(mv)
        if rect:
            for k in RECT_KINDS:
                mv_cells[k] = rect_d[k]["mv"]
        mv_sel = kpick(mv_cells, jnp.int16)

        # selected-ref/mode field (0 = ref0/fwd, 1 = ref1/bwd,
        # 2 = compound average) + second MV for compound leaves
        ref8 = None
        mv2_sel = None
        if nrefs >= 2:
            cells = sq_cells(refsel)
            if rect:
                for k in RECT_KINDS:
                    cells[k] = rect_d[k]["sel"]
            ref8 = kpick(cells, jnp.uint8)
            if compound:
                cells = sq_cells(mv_c)
                if rect:
                    for k in RECT_KINDS:
                        cells[k] = rect_d[k]["mv2"]
                mv2_sel = kpick(cells, jnp.int16)
        txty8 = None
        if txs:
            cells = sq_cells(txty)
            if rect:
                for k in RECT_KINDS:   # rect leaves code DCT only
                    cells[k] = jnp.zeros_like(cells[0])
            txty8 = kpick(cells, jnp.uint8)

        if not rdo:
            # --- merged-cell quarter-pel refinement --------------------
            # ONE subpel pass per reference at 8x8-cell granularity,
            # AFTER the partition merge: each cell anchors at its leaf's
            # full-pel winner, a shared 25-candidate quarter-pel lattice
            # is scored per cell against the TRUE reference, and each
            # LEAF picks the candidate minimizing the sum of its cells'
            # SADs (+ its level's MV rate) so the leaf moves as one.
            # Replaces the former per-size refine (3 sizes x nrefs patch
            # gathers + phase grids) and the per-size compound MC — the
            # step is HBM-bound and the patch-gather/interp pool was its
            # largest byte pool (round-5 HLO accounting).
            reach_q = 4
            cand = [(dy, dx) for dy in range(-reach_q, reach_q + 1, 2)
                    for dx in range(-reach_q, reach_q + 1, 2)]
            ncand = len(cand)
            dyx_c = jnp.asarray(np.array(cand, np.int32))
            kern_c = _filter_kern(filt)
            nb8h_, nb8w_ = ph // 8, pw // 8
            src8T = jnp.transpose(_block(sy, 8).reshape(-1, 8, 8),
                                  (1, 2, 0)).astype(jnp.int16)
            upk = lambda a, k: (a if k == 1
                                else jnp.repeat(jnp.repeat(a, k, 0), k, 1))

            def cand_slice(P, ci):
                dy, dx = cand[ci]
                pyi = ((2 * dy) & 15) >> 2
                pxi = ((2 * dx) & 15) >> 2
                fy, fx = dy >> 3, dx >> 3
                return P[pyi][pxi][fy + 1 : fy + 9, fx + 1 : fx + 9, :]

            def refine_ref(i):
                mv_dict = per_ref_mv[i]
                priors_i = per_ref[i][2]
                # cell anchor: this ref's own leaf-size winner (full-pel
                # valued, 1/8-pel units -> arithmetic shift is exact)
                mvc8 = kpick(sq_cells(mv_dict), jnp.int32)
                patch = G.gather_blocks_grid(
                    padded[i][0], mvc8[..., 0] >> 3, mvc8[..., 1] >> 3,
                    8, pad, pad - 1, halo=8, off=-4)
                patch = jnp.transpose(patch, (1, 2, 0)).astype(jnp.int32)
                P = _phase_grid(patch, 8, bd, kern_c)
                lat_c = jnp.stack([
                    jnp.abs(src8T - cand_slice(P, ci))
                    .sum((0, 1), dtype=jnp.int32).reshape(nb8h_, nb8w_)
                    for ci in range(ncand)])
                idx_l, cost_l, lvl = {}, {}, lat_c
                for bs in SIZES64:
                    if bs > 8:
                        lvl = lvl.reshape(ncand, lvl.shape[1] // 2, 2,
                                          lvl.shape[2] // 2, 2).sum((2, 4))
                    cl = lvl + ((lam * ME.mv_rate_bits(
                        mv_dict[bs][None] + dyx_c[:, None, None, :]
                        - priors_i[bs][None] * 8)) >> 4)
                    idx_l[bs] = jnp.argmin(cl, 0)
                    cost_l[bs] = cl.min(0)
                kcell = kpick({ki: upk(idx_l[bs_], bs_ // 8)
                               for ki, bs_ in enumerate(SIZES64)},
                              jnp.int32)
                onehot = (kcell[..., None] == jnp.arange(ncand)[None, None]
                          ).astype(jnp.int32)
                refined = mvc8 + onehot @ dyx_c
                return refined, cost_l, P, kcell

            ref_fine = [refine_ref(i) for i in range(nrefs)]
            if nrefs == 1:
                mv_sel = ref_fine[0][0].astype(jnp.int16)
            else:
                sadc = None
                if compound:
                    # compound decision from the refined cell preds
                    # (pixel-domain average approximates the jnt path's
                    # CONV_BUF rounding; the RECON below still uses the
                    # exact jnt average, so decode parity is untouched)
                    def pred_sel(P, kcell):
                        flat = (kcell.reshape(-1))[None, None, :]
                        out = jnp.zeros_like(cand_slice(P, 0))
                        for ci in range(ncand):
                            out = jnp.where(flat == ci,
                                            cand_slice(P, ci), out)
                        return out
                    p0s = pred_sel(ref_fine[0][2], ref_fine[0][3])
                    p1s = pred_sel(ref_fine[1][2], ref_fine[1][3])
                    avg = (p0s.astype(jnp.int32) + p1s + 1) >> 1
                    sadc = (jnp.abs(src8T.astype(jnp.int32) - avg)
                            .sum((0, 1)).reshape(nb8h_, nb8w_))
                sel_l = {}
                for bs in SIZES64:
                    k = bs // 8
                    costs = jnp.stack([ref_fine[i][1][bs]
                                       for i in range(nrefs)])
                    s = jnp.argmin(costs, 0).astype(jnp.uint8)
                    if compound:
                        if bs > 8:
                            sadc = _sum4(sadc)
                        if bs >= 16:
                            # smallest blocks rarely pick compound and
                            # cost the most; keep them single-ref
                            r0 = ME.mv_rate_bits(
                                ref_fine[0][0][::k, ::k]
                                - per_ref[0][2][bs] * 8)
                            r1 = ME.mv_rate_bits(
                                ref_fine[1][0][::k, ::k]
                                - per_ref[1][2][bs] * 8)
                            cc = sadc + ((lam * (r0 + r1
                                                 + COMP_EXTRA_BITS)) >> 4)
                            s = jnp.where(cc < costs.min(0),
                                          np.uint8(nrefs), s)
                    sel_l[bs] = s
                ref8 = kpick({ki: upk(sel_l[bs_], bs_ // 8)
                              for ki, bs_ in enumerate(SIZES64)},
                             jnp.uint8)
                mv_sel = ref_fine[0][0]
                for i in range(1, nrefs):
                    mv_sel = jnp.where((ref8 == i)[..., None],
                                       ref_fine[i][0], mv_sel)
                mv_sel = mv_sel.astype(jnp.int16)
                if compound:
                    mv2_sel = ref_fine[1][0].astype(jnp.int16)

            # --- motion compensation ONCE at selected-cell granularity ---
            # The interpolation is translation-invariant, so MCing a
            # 32x32 leaf equals MCing its sixteen 8x8 cells with the same
            # MV: one patch gather + on-patch interp per plane at 8x8
            # (luma) / 4x4 (chroma) cells replaces per-size MC.
            mv32 = mv_sel.astype(jnp.int32)
            mv32c = (mv2_sel.astype(jnp.int32) if mv2_sel is not None
                     else None)
            pred_y_pl = _unblock(mc_one(0, False, 8, pad, mv32, mv32c,
                                        ref8))
            pred_u_pl = _unblock(mc_one(1, True, 4, cpad, mv32, mv32c,
                                        ref8))
            pred_v_pl = _unblock(mc_one(2, True, 4, cpad, mv32, mv32c,
                                        ref8))

            # residual coding at every size against the selected pred
            for bs in SIZES64:
                ly, rec_y = _encode_plane(_block(sy, bs),
                                          _block(pred_y_pl, bs),
                                          qq(bs), TX_OF[bs], bd)
                cbs = bs // 2
                lu, rec_u = _encode_plane(_block(su, cbs),
                                          _block(pred_u_pl, cbs), qq(bs),
                                          TX_OF_C[bs], bd)
                lv, rec_v = _encode_plane(_block(sv, cbs),
                                          _block(pred_v_pl, cbs), qq(bs),
                                          TX_OF_C[bs], bd)
                levels[bs] = (ly.astype(jnp.int16), lu.astype(jnp.int16),
                              lv.astype(jnp.int16))
                rec_planes[bs] = (_unblock(rec_y), _unblock(rec_u),
                                  _unblock(rec_v))

        # --- final recon: per-cell select of the chosen leaf's recon -----
        def select_plane(idx_plane, shift):
            km = jnp.repeat(jnp.repeat(kind8, 8 >> shift, 0),
                            8 >> shift, 1)
            out = rec_planes[8][idx_plane]
            for k, bs_ in ((1, 16), (2, 32), (3, 64)):
                out = jnp.where(km == k, rec_planes[bs_][idx_plane], out)
            if rect:
                for k in RECT_KINDS:
                    out = jnp.where(km == k, rect_d[k]["rec"][idx_plane],
                                    out)
            return out

        rec_y = select_plane(0, 0)
        rec_u = select_plane(1, 1)
        rec_v = select_plane(2, 1)

        # --- level pack: per 8x8 cell, the SELECTED leaf's tiles only —
        # one array per plane instead of per-size grids (the tunnel link
        # is the bottleneck; host re-stitches leaves from cell tiles) ---
        def pack_cells(pidx, t):
            cells = {i: _tiles8(levels[bs_][pidx], t)
                     for i, bs_ in enumerate((8, 16, 32, 64))}
            if rect:
                for k in RECT_KINDS:
                    cells[k] = _tiles8(rect_d[k]["levels"][pidx], t)
            return kpick(cells, jnp.int16)

        ly_pack = pack_cells(0, 8)
        lu_pack = pack_cells(1, 4)
        lv_pack = pack_cells(2, 4)

        # --- in-loop filters over the mi-grid region (the decoder
        # filters exactly [ph_mi, pw_mi]; the 32-pad margin is redefined
        # by edge replication afterwards either way) ---------------------
        crop = lambda p2, sh: p2[: ph_mi >> sh, : pw_mi >> sh]
        repad = lambda core, like: jnp.pad(
            core, ((0, like.shape[0] - core.shape[0]),
                   (0, like.shape[1] - core.shape[1])), mode="edge")
        cy, cu, cv = crop(rec_y, 0), crop(rec_u, 1), crop(rec_v, 1)
        sz8 = size8[: ph_mi // 8, : pw_mi // 8].astype(jnp.int32)
        idx_sb = jnp.zeros((-(-ph_mi // 64), -(-pw_mi // 64)), jnp.uint8)

        if filters and (dynamic_q or lf_levels[0] or lf_levels[2]
                        or lf_levels[3]):
            # per-direction tx extents (they differ at rect leaves:
            # vertical edges follow the tx WIDTH, horizontal the HEIGHT)
            if rect:
                k8c = kind8[: ph_mi // 8, : pw_mi // 8].astype(jnp.int32)
                szw8 = jnp.where(k8c == 4, 16,
                                 jnp.where(k8c == 5, 8,
                                           jnp.where(k8c == 6, 32,
                                                     jnp.where(k8c == 7, 16,
                                                               sz8))))
                szh8 = jnp.where(k8c == 4, 8,
                                 jnp.where(k8c == 5, 16,
                                           jnp.where(k8c == 6, 16,
                                                     jnp.where(k8c == 7, 32,
                                                               sz8))))
            else:
                szw8 = szh8 = sz8
            upy = lambda a: jnp.repeat(jnp.repeat(a, 8, 0), 8, 1)
            upc = lambda a: jnp.repeat(jnp.repeat(a >> 1, 4, 0), 4, 1)
            cy = DB.deblock_plane(jnp, cy, upy(szw8), lf_levels[0],
                                  lf_levels[1], True, bd=bd,
                                  sizes_px_h=upy(szh8))
            cu = DB.deblock_plane(jnp, cu, upc(szw8), lf_levels[2],
                                  lf_levels[2], False, bd=bd,
                                  sizes_px_h=upc(szh8))
            cv = DB.deblock_plane(jnp, cv, upc(szw8), lf_levels[3],
                                  lf_levels[3], False, bd=bd,
                                  sizes_px_h=upc(szh8))

        # deblocked (pre-CDEF) planes: the loop-restoration stripe
        # context rows come from these (spec save_deblock_boundary_lines;
        # ref EbCdefProcess.c:545-558)
        deb_out = (cy, cu, cv) if lr else None

        if use_cdef:
            # per-8x8-unit skip: the selected LEAF has all-zero levels
            # (the skip flag is coded per block, so every cell of a leaf
            # shares it)
            def skipmap(lv3, reph, repw):
                z = ((lv3[0] == 0).all((-1, -2))
                     & (lv3[1] == 0).all((-1, -2))
                     & (lv3[2] == 0).all((-1, -2)))
                return jnp.repeat(jnp.repeat(z, reph, 0), repw, 1)

            cells = {i: skipmap(levels[bs_], bs_ // 8, bs_ // 8)
                     for i, bs_ in enumerate((8, 16, 32, 64))}
            if rect:
                for k, (ns_, shp_) in RECT_KINDS.items():
                    bh_ = (ns_ // 2 if shp_ == "h" else ns_) // 8
                    bw_ = (ns_ if shp_ == "h" else ns_ // 2) // 8
                    cells[k] = skipmap(rect_d[k]["levels"], bh_, bw_)
            sk = kpick(cells, jnp.bool_)[: sz8.shape[0], : sz8.shape[1]]
            # traced damping mirrors CD.pick_damping(q) so the header's
            # per-frame damping matches under dynamic q (hier-B layers, RC)
            damping = (3 + (q >> 6)) if dynamic_q else CD.pick_damping(qindex)
            (cy, cu, cv), idx_sb = CD.cdef_search_and_apply(
                jnp, (cy, cu, cv),
                (crop(sy, 0), crop(su, 1), crop(sv, 1)), sk, damping,
                coeff_shift=bd - 8)
            idx_sb = idx_sb.astype(jnp.uint8)

        px_dt = jnp.uint8 if bd == 8 else jnp.uint16
        rec_y = repad(cy, rec_y).astype(px_dt)
        rec_u = repad(cu, rec_u).astype(px_dt)
        rec_v = repad(cv, rec_v).astype(px_dt)

        if not dynamic_q:
            dt = (Q.level_dtype(qindex, T.TX_64X64, bd)
                  if Q.level_dtype(qindex, T.TX_64X64, bd) ==
                  Q.level_dtype(qindex, T.TX_4X4, bd)
                  else jnp.int16)
            ly_pack = ly_pack.astype(dt)
            lu_pack = lu_pack.astype(dt)
            lv_pack = lv_pack.astype(dt)
        out = (size8, mv_sel, ly_pack, lu_pack, lv_pack,
               rec_y, rec_u, rec_v, idx_sb)
        if nrefs >= 2:
            out = out + (ref8,)
        if compound:
            out = out + (mv2_sel,)
        if txs:
            out = out + (txty8,)
        if rect:
            out = out + (shape8,)
        if dynamic_q:
            # int8 level shadows + fits-int8 flag (see inter_layout)
            small = ((jnp.abs(ly_pack) <= 127).all()
                     & (jnp.abs(lu_pack) <= 127).all()
                     & (jnp.abs(lv_pack) <= 127).all())
            ly8 = ly_pack.astype(jnp.int8)
            lu8 = lu_pack.astype(jnp.int8)
            lv8_ = lv_pack.astype(jnp.int8)
            # sparse cell pack: most 8x8 cells code NO coefficients
            # (skip), so the per-frame level transfer compacts to the
            # nonzero cells under a fixed capacity (host falls back to
            # the dense arrays when count exceeds it).  Stable argsort
            # puts nonzero cells first in raster order — the host
            # scatter re-derives the same order from the flag bitmap.
            nb = nb8h * nb8w
            cap = sparse_capacity(nb)
            lflags = ((ly8 != 0).any((-1, -2))
                      | (lu8 != 0).any((-1, -2))
                      | (lv8_ != 0).any((-1, -2)))
            order = jnp.argsort(~lflags.reshape(-1), stable=True)[:cap]
            lcount = lflags.sum().astype(jnp.int32)
            ply = jnp.take(ly8.reshape(nb, 64), order, axis=0)
            plu = jnp.take(lu8.reshape(nb, 16), order, axis=0)
            plv = jnp.take(lv8_.reshape(nb, 16), order, axis=0)
            out = out + (small, ly8, lu8, lv8_,
                         lflags, lcount, ply, plu, plv)
        if lr:
            out = out + tuple(p.astype(px_dt) for p in deb_out)
        return out

    # static edge-legality masks in mi-grid terms are bound by the caller
    # via build_p_frame_encoder (closure cells patched below).
    inside16 = np.ones((ph // 16, pw // 16), bool)
    inside32 = np.ones((ph // 32, pw // 32), bool)
    inside64 = np.ones((ph // 64, pw // 64), bool)
    mi_extent = [ph, pw]
    lf_levels_cell = [(0, 0, 0, 0)]
    use_cdef_cell = [False]

    def bind_masks(mi_rows: int, mi_cols: int, deblock: bool,
                   cdef: bool = False):
        cells_h, cells_w = mi_rows // 2, mi_cols // 2  # 8x8 cells in frame
        for k, mask in ((2, inside16), (4, inside32), (8, inside64)):
            m = np.zeros_like(mask)
            for r in range(m.shape[0]):
                for c in range(m.shape[1]):
                    m[r, c] = (r * k + k <= cells_h) and \
                        (c * k + k <= cells_w)
            mask[:] = m
        mi_extent[0] = mi_rows * 4
        mi_extent[1] = mi_cols * 4
        if deblock and qindex is not None:
            ly, lu, lv = DB.pick_filter_levels(qindex, is_key=False)
            lf_levels_cell[0] = (ly, ly, lu, lv)
        use_cdef_cell[0] = cdef

    step.bind_masks = bind_masks
    return step


@functools.lru_cache(maxsize=8)
def build_p_frame_encoder(ph: int, pw: int, mi_rows: int, mi_cols: int,
                          qindex: int, search: int = SEARCH_RANGE,
                          deblock: bool = True, cdef: bool = False,
                          bd: int = 8, rdo: bool = True, txs: bool = False,
                          filt: int = 0, gm: bool = False,
                          lr: bool = False, rect: bool = False):
    fn = p_frame_step(ph, pw, qindex, search, bd=bd, rdo=rdo, txs=txs,
                      filt=filt, gm=gm, lr=lr, rect=rect)
    fn.bind_masks(mi_rows, mi_cols, deblock, cdef)
    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def build_b_frame_encoder(ph: int, pw: int, mi_rows: int, mi_cols: int,
                          qindex: int, search: int = SEARCH_RANGE,
                          deblock: bool = True, cdef: bool = False,
                          rdo: bool = True, txs: bool = False,
                          filt: int = 0, lr: bool = False):
    """Two-reference (fwd + bwd) step for hierarchical-B mini-GOPs.
    fn(sy, su, sv, r0y, r0u, r0v, r1y, r1u, r1v) -> P outputs + ref8."""
    fn = p_frame_step(ph, pw, qindex, search, nrefs=2, rdo=rdo, txs=txs,
                      filt=filt, lr=lr)
    fn.bind_masks(mi_rows, mi_cols, deblock, cdef)
    return jax.jit(fn)


@functools.lru_cache(maxsize=4)
def build_p_frame_encoder_dyn(ph: int, pw: int, mi_rows: int, mi_cols: int,
                              search: int = SEARCH_RANGE,
                              cdef: bool = False, bd: int = 8,
                              rdo: bool = True, txs: bool = False,
                              filt: int = 0, gm: bool = False,
                              lr: bool = False, rect: bool = False,
                              filters: bool = True, aq: bool = False):
    """Dynamic-q P step: fn(..., qindex, lf_y, lf_u, lf_v[, gmv]); one
    compile serves every qindex (rate control).  filters=False skips
    the in-loop filters (warped-motion mode: the host flips blocks to
    WARPED_CAUSAL on the pre-filter recon, then a separate postproc
    step deblocks/CDEFs — pipeline.warp_pass)."""
    fn = p_frame_step(ph, pw, None, search, bd=bd, rdo=rdo, txs=txs,
                      filt=filt, gm=gm, lr=lr, rect=rect, filters=filters,
                      aq=aq)
    fn.bind_masks(mi_rows, mi_cols, False, cdef)
    return jax.jit(fn)


@functools.lru_cache(maxsize=6)
def build_b_frame_encoder_dyn(ph: int, pw: int, mi_rows: int, mi_cols: int,
                              search: int = SEARCH_RANGE,
                              cdef: bool = False, compound: bool = False,
                              bd: int = 8, rdo: bool = True,
                              txs: bool = False, filt: int = 0,
                              lr: bool = False, rect: bool = False,
                              nrefs: int = 2, aq: bool = False):
    """Dynamic-q multi-ref step: fn(sy, su, sv, r0..., r1...[, r2...],
    qindex, lf_y, lf_u, lf_v); one compile serves every qindex (hier-B
    layer offsets, rate control).  compound=True adds the
    COMPOUND_AVERAGE candidate (ref0+ref1 pairs); nrefs=3 adds a third
    single-prediction reference (far bwd / ALTREF) to the argmin."""
    fn = p_frame_step(ph, pw, None, search, nrefs=nrefs,
                      compound=compound, bd=bd, rdo=rdo, txs=txs,
                      filt=filt, lr=lr, rect=rect, aq=aq)
    fn.bind_masks(mi_rows, mi_cols, False, cdef)
    return jax.jit(fn)
