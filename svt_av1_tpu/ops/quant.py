"""Quantization / dequantization.

Normative side (dequant, AV1 spec §7.12.2-7.12.3): step sizes from the
dc_q/ac_q lookup tables; dim>=32 transforms apply a downshift of
``tx_scale = (pels>256) + (pels>1024)``; dequantized magnitude is
``(level * q) >> tx_scale`` with the sign applied after, clamped to the
(bd+8)-bit coefficient range.

Encoder side (non-normative, ref quantize_b_helper_c EbFullLoop.c:143 /
av1_quantize_inv_quantize :653): a uniform deadzone quantizer computed in
f32 on the VPU (reciprocal multiply — integer divide is slow on TPU);
an occasional off-by-one level near a decision boundary only perturbs RD,
never conformance, because reconstruction always goes through the exact
integer dequant below.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from svt_av1_tpu import tables
from svt_av1_tpu.ops.transforms import TX_H, TX_W


def tx_scale(tx_size: int) -> int:
    """(pels > 256) + (pels > 1024) — spec av1_get_tx_scale."""
    pels = TX_W[tx_size] * TX_H[tx_size]
    return int(pels > 256) + int(pels > 1024)


@functools.lru_cache(maxsize=None)
def quant_params(qindex: int, bd: int = 8) -> tuple[int, int]:
    """(dc_q, ac_q) step sizes (zero delta_q, as the reference's CQP path)."""
    return tables.dc_q(qindex, bd), tables.ac_q(qindex, bd)


def _dq_grid(h: int, w: int, dc: int, ac: int):
    g = np.full((h, w), ac, np.int32)
    g[0, 0] = dc
    return g


def level_cap(qindex: int, tx_size: int, bd: int = 8) -> int:
    """Encoder-side level saturation cap.  When the theoretical level
    bound is only slightly above int8 range, cap at 127 so levels ride
    the device->host link as int8 (the tunnel link is the pipeline
    bottleneck); recon uses the SAME capped levels, so encoder/decoder
    stay bit-exact.  Saturation then affects only near-maximal
    coefficients (>= 127 quantization steps), which real content never
    produces at these step sizes."""
    shift = tx_scale(tx_size)
    dc, ac = quant_params(qindex, bd)
    hi = (((1 << (bd + 7)) - 1) << shift) // min(dc, ac)
    return 127 if hi <= 181 else (1 << 30)


def _qgrids(qindex, tx_size: int, bd: int):
    """(q, rnd, lvl_max) grids; qindex may be a static int, a traced
    scalar (rate control varies q per frame without recompiling), or a
    traced per-block array [...]: per-superblock delta-q quantizes each
    block with its own qindex (grids broadcast as [..., 1, 1] x [h, w])."""
    w, h = TX_W[tx_size], TX_H[tx_size]
    shift = tx_scale(tx_size)
    if isinstance(qindex, (int, np.integer)):
        dc, ac = quant_params(int(qindex), bd)
        cap = level_cap(int(qindex), tx_size, bd)
    else:
        t = tables.spec_tables()
        dc = jnp.asarray(t[f"dc_qlookup_{bd}"])[qindex]
        ac = jnp.asarray(t[f"ac_qlookup_{bd}"])[qindex]
        cap = 1 << 30   # traced q: no int8 saturation optimization
        if getattr(qindex, "ndim", 0):
            dc = dc[..., None, None]
            ac = ac[..., None, None]
    pos0 = np.zeros((h, w), bool)
    pos0[0, 0] = True
    pos0 = jnp.asarray(pos0)
    q = jnp.where(pos0, dc, ac)
    rnd = jnp.where(pos0, dc // 2, (ac * 7) >> 4)
    hi = ((1 << (bd + 7)) - 1) << shift
    lvl_max = jnp.minimum(jnp.where(pos0, hi // dc, hi // ac), cap)
    return q, rnd, lvl_max, shift


def quantize_batch(coeffs, qindex, tx_size: int, bd: int = 8):
    """coeffs [..., H, W] int32 -> levels [..., H, W] int32 (signed).

    Deadzone rounding of 7/16 (AC) and 1/2 (DC), like the reference's
    default quantize_b rounding split.
    """
    q, rnd, lvl_max, shift = _qgrids(qindex, tx_size, bd)
    # int32 is safe: |coeff| < 2^20 even for 64x64 and shift <= 2
    mag = jnp.abs(coeffs).astype(jnp.int32) << shift
    lvl = ((mag + rnd).astype(jnp.float32) * (1.0 / q.astype(jnp.float32)))
    lvl = jnp.floor(lvl).astype(jnp.int32)
    lvl = jnp.minimum(lvl, lvl_max)
    return jnp.sign(coeffs) * lvl


def dequantize_batch(levels, qindex, tx_size: int, bd: int = 8):
    """Exact normative dequant: [..., H, W] levels -> int32 coefficients."""
    q, _rnd, _lm, shift = _qgrids(qindex, tx_size, bd)
    mag = (jnp.abs(levels) * q) >> shift
    hi = (1 << (bd + 7)) - 1
    mag = jnp.minimum(mag, hi)
    return jnp.sign(levels) * mag


def dequantize_np(levels: np.ndarray, qindex: int, tx_size: int,
                  bd: int = 8) -> np.ndarray:
    """Numpy twin of dequantize_batch (used by the mirror decoder)."""
    w, h = TX_W[tx_size], TX_H[tx_size]
    shift = tx_scale(tx_size)
    dc, ac = quant_params(qindex, bd)
    q = _dq_grid(h, w, dc, ac).astype(np.int64)
    mag = (np.abs(levels.astype(np.int64)) * q) >> shift
    mag = np.minimum(mag, (1 << (bd + 7)) - 1)
    return (np.sign(levels) * mag).astype(np.int32)


quantize = jax.jit(quantize_batch, static_argnums=(1, 2, 3))
dequantize = jax.jit(dequantize_batch, static_argnums=(1, 2, 3))


def level_dtype(qindex: int, tx_size: int, bd: int = 8):
    """Narrowest dtype that can hold any level at this q (transfer
    shrinker: levels ride host<->device links into the entropy stage)."""
    shift = tx_scale(tx_size)
    dc, ac = quant_params(qindex, bd)
    hi = min((((1 << (bd + 7)) - 1) << shift) // min(dc, ac),
             level_cap(qindex, tx_size, bd))
    return np.int8 if hi <= 127 else np.int16
