"""Pallas TPU tile-gather kernel — the MC/ME gather primitive.

XLA lowers a vmapped ``dynamic_slice`` over N blocks to a serial
per-slice gather (~3.7 us/slice measured on one chip: a [14400, 16, 16]
patch gather runs at ~270 MB/s and dominated the whole inter step).
The TPU-native formulation exploits the encoder's structure: blocks sit
on a regular grid and their motion offsets are bounded by the search
range, so every block of grid row *i* reads inside a fixed row band of
the reference.  The kernel DMAs that band HBM->VMEM once per block row;
each tile is then one ALIGNED vector load of a covering chunk plus two
dynamic rotates (tpu.dynamic_rotate) for the sub-tile remainder — no
per-tile DMA, no unaligned accesses.

ref analog: the reference's MC reads per-PU windows directly from the
padded reference picture (EbInterPrediction.c convolve callers); CPU
caches do the staging implicitly — VMEM banding is the TPU equivalent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _align(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=1)
def on_tpu() -> bool:
    """Mosaic kernels need real TPU hardware; the CPU mesh used by tests
    (and the driver's multichip dryrun) takes the XLA fallback path."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


@functools.partial(
    jax.jit,
    static_argnames=("nbh", "nbw", "stride", "band_off", "band_h", "th",
                     "tw"))
def gather_tiles(plane, base_r, base_c, *, nbh: int, nbw: int, stride: int,
                 band_off: int, band_h: int, th: int, tw: int):
    """Gather N = nbh*nbw tiles of [th, tw] from a 2-D plane.

    Tiles are grid-anchored: tile k = i*nbw + j (row-major) starts at
    (base_r[k], base_c[k]) with the caller guaranteeing
    ``0 <= base_r[k] - (i*stride + band_off) <= band_h - th`` — i.e.
    grid row i only reads rows [i*stride + band_off, +band_h) (the
    band = block rows + search range + filter halo).  stride must be a
    multiple of 8 (sublane tiling).

    Returns [N, th, tw] in plane dtype.
    """
    Hp, Wp = plane.shape
    assert band_off >= 0, band_off
    assert (nbh - 1) * stride + band_off + band_h <= Hp, \
        (Hp, nbh, stride, band_off, band_h)
    if not on_tpu():
        # XLA fallback (CPU mesh: tests, multichip dryrun)
        one = lambda r, c: jax.lax.dynamic_slice(plane, (r, c), (th, tw))
        return jax.vmap(one)(base_r, base_c)
    import os
    impl = (_gather_tiles_pallas
            if os.environ.get("SVT_GATHER") == "pallas"
            else _gather_tiles_mm)
    return impl(plane, base_r, base_c, nbh=nbh, nbw=nbw,
                stride=stride, band_off=band_off,
                band_h=band_h, th=th, tw=tw)


@functools.partial(
    jax.jit,
    static_argnames=("nbh", "nbw", "stride", "band_off", "band_h", "th",
                     "tw"))
def _gather_tiles_mm(plane, base_r, base_c, *, nbh: int, nbw: int,
                     stride: int, band_off: int, band_h: int, th: int,
                     tw: int):
    """One-hot-matmul tile gather (MXU path).

    Build the im2col window tensor V[i,j] = plane[i*s + g0*s : +nk*s,
    j*s + g0*s : +nc*s] from static slice-stacks of the stride-grouped
    plane (no dynamic indexing), then extract each tile with two
    batched one-hot matmuls: rows R = S @ V, cols T = R @ C.  One-hot
    f32 products of integer pixels are exact (values < 2^24).  ~50x
    faster than XLA's per-slice gather for the 720p MC shapes.

    Requires base_c to be grid-anchored with the SAME stride in j (true
    for all MC/ME users: base_c = j*stride + bounded offset).
    """
    s = stride
    Hp, Wp = plane.shape
    # window geometry (static): rel offsets lie in [band_off,
    # band_off + band_h - th] for rows, and the same bound is assumed
    # for columns (callers use symmetric reach)
    g0 = band_off // s
    nk = -(-(band_off + band_h) // s) - g0         # row groups
    win = nk * s
    # pad so every group index i+g0 .. i+g0+nk-1 and column group
    # j+g0 .. j+g0+nk-1 exists
    need_h = max((nbh - 1 + g0 + nk) * s, _align(Hp, s))
    need_w = max((nbw - 1 + g0 + nk) * s, _align(Wp, s))
    plane = jnp.pad(plane, ((0, need_h - Hp), (0, need_w - Wp)))
    Hp2, Wp2 = plane.shape
    # rows: group and stack nk shifted slices -> [nbh, win, Wp2]
    gr = plane.reshape(Hp2 // s, s, Wp2)
    rows = jnp.concatenate(
        [jax.lax.slice(gr, (g0 + k, 0, 0), (g0 + k + nbh, s, Wp2))
         for k in range(nk)], axis=1)              # [nbh, win, Wp2]
    # cols: group and stack -> V [nbh, nbw, win, win]
    gc = rows.reshape(nbh, win, Wp2 // s, s)
    V = jnp.concatenate(
        [jax.lax.slice(gc, (0, 0, g0 + k, 0), (nbh, win, g0 + k + nbw, s))
         for k in range(nk)], axis=3)              # [nbh, win, nbw, nk*s]
    V = V.transpose(0, 2, 1, 3).reshape(nbh * nbw, win, win)
    # one-hot selectors from the residual offsets inside the window
    rel_r = (base_r.reshape(nbh, nbw)
             - (jnp.arange(nbh, dtype=jnp.int32) + g0)[:, None] * s
             ).reshape(-1)
    rel_c = (base_c.reshape(nbh, nbw)
             - (jnp.arange(nbw, dtype=jnp.int32) + g0)[None, :] * s
             ).reshape(-1)
    ar = jnp.arange(win, dtype=jnp.int32)
    # compute dtype: 8-bit planes ride bf16 (integers < 2^8 are exact in
    # bf16, and one-hot contractions accumulate in f32 on the MXU) —
    # halves the V window traffic, the dominant HBM cost of the inter
    # step; wider planes (10-bit pixels, int16 CONV_BUF values) use f32
    cdt = jnp.bfloat16 if plane.dtype.itemsize == 1 else jnp.float32
    S = (rel_r[:, None, None] + jnp.arange(th, dtype=jnp.int32)[None, :, None]
         == ar[None, None, :]).astype(cdt)             # [N, th, win]
    C = (rel_c[:, None, None] + jnp.arange(tw, dtype=jnp.int32)[None, None, :]
         == ar[None, :, None]).astype(cdt)             # [N, win, tw]
    R = jnp.einsum("nrk,nkc->nrc", S, V.astype(cdt),
                   preferred_element_type=jnp.float32)
    # row-selected values are exact pixels, so the f32 accumulators can
    # drop back to the compute dtype for the column contraction
    T = jnp.einsum("nrc,ncm->nrm", R.astype(cdt), C,
                   preferred_element_type=jnp.float32)
    return T.astype(plane.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("nbh", "nbw", "stride", "band_off", "band_h", "th",
                     "tw"))
def _gather_tiles_pallas(plane, base_r, base_c, *, nbh: int, nbw: int,
                         stride: int, band_off: int, band_h: int, th: int,
                         tw: int):
    """Mosaic (Pallas) tile gather — the DMA-banded alternative to the
    one-hot-matmul path: grid over block rows; each program DMAs its
    row band HBM->VMEM once, then every tile is one ALIGNED vector load
    of a covering chunk plus two rotates (no per-tile DMA).  Select
    with SVT_GATHER=pallas; the matmul path stays default (measured
    faster for the MC shapes, where the one-hot contractions ride the
    MXU while this kernel is VPU/rotate-bound)."""
    Hp, Wp = plane.shape
    # alignment geometry: the band DMA starts at the enclosing 8-aligned
    # row; each tile loads an (8, 128)-aligned covering chunk and
    # rotates the remainder into place
    band_hp = _align(band_h + 7, 8) + 8
    thp = _align(th, 8) + 8
    twp = _align(tw, 128) + 128
    wp = _align(Wp, 128) + 128
    hp_need = (nbh - 1) * stride + band_off + band_hp
    plane = jnp.pad(plane, ((0, max(0, hp_need - Hp)), (0, wp - Wp)))

    def kernel(base_r_ref, base_c_ref, plane_ref, out_ref, band, bsem):
        i = pl.program_id(0)
        row0u = i * stride + band_off
        row0 = pl.multiple_of(row0u - jax.lax.rem(row0u, 8), 8)
        dma = pltpu.make_async_copy(
            plane_ref.at[pl.ds(row0, band_hp), :], band, bsem)
        dma.start()
        dma.wait()

        def body(j, _):
            k = i * nbw + j
            rr = base_r_ref[k] - row0
            rrem = jax.lax.rem(rr, 8)
            rr8 = pl.multiple_of(rr - rrem, 8)
            cc = base_c_ref[k]
            crem = jax.lax.rem(cc, 128)
            cc128 = pl.multiple_of(cc - crem, 128)
            chunk = band[pl.ds(rr8, thp), pl.ds(cc128, twp)]
            # Mosaic implements dynamic_rotate only for 32-bit vectors
            # ("Rotate with non-32-bit data").  Sub-word planes bitcast
            # to a sublane-packed u32 view for the LANE (column) rotate
            # — lane geometry is unchanged by sublane packing, so the
            # roll moves pixel columns regardless of which rows share a
            # word — and the row remainder (0..7) is an 8-way
            # static-slice select instead of a dim-0 roll.
            if plane.dtype.itemsize < 4:
                c32 = pltpu.bitcast(chunk, jnp.uint32)
                c32 = pltpu.roll(c32, jax.lax.rem(twp - crem, twp), 1)
                chunk = pltpu.bitcast(c32, plane.dtype)
            else:
                chunk = pltpu.roll(chunk, jax.lax.rem(twp - crem, twp), 1)
            tile = jax.lax.switch(
                rrem,
                [(lambda s=s: jax.lax.slice(chunk, (s, 0), (s + th, tw)))
                 for s in range(8)])
            out_ref[pl.ds(j, 1)] = tile.reshape(1, th, tw)
            return 0

        jax.lax.fori_loop(0, nbw, body, 0, unroll=nbw)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nbh,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((nbw, th, tw), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((band_hp, wp), plane.dtype),
                        pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbh * nbw, th, tw), plane.dtype),
    )(base_r, base_c, plane)


def gather_blocks_grid(plane_pad, mv_r, mv_c, bs: int, pad: int,
                       reach: int, halo: int = 0, off: int = 0):
    """Grid-anchored gather from a pad_for_filter plane: block (i, j)
    reads a [bs+halo, bs+halo] tile starting at grid position
    (i*bs, j*bs) + (mv_r, mv_c) + off (pad_for_filter maps position p
    to index p + pad + 3).  |mv| <= reach must hold.
    Returns [nbh*nbw, bs+halo, bs+halo]."""
    nbh, nbw = mv_r.shape
    th = bs + halo
    o = pad + 3 + off
    base_r = (jnp.arange(nbh, dtype=jnp.int32)[:, None] * bs + o
              + mv_r.astype(jnp.int32)).reshape(-1)
    base_c = (jnp.arange(nbw, dtype=jnp.int32)[None, :] * bs + o
              + mv_c.astype(jnp.int32)).reshape(-1)
    band_off = o - reach
    band_h = 2 * reach + th
    assert band_off >= 0
    return gather_tiles(plane_pad, base_r, base_c, nbh=nbh, nbw=nbw,
                        stride=bs, band_off=band_off, band_h=band_h,
                        th=th, tw=th)
