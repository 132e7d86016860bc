"""Quantization tests — mirrors the reference QuantAsmTest.cc:233-307
(all-zero input, dc/ac extremes across the Q range, random inputs)."""

import numpy as np
import pytest

from svt_av1_tpu.ops import quant as Q
from svt_av1_tpu.ops import transforms as T


@pytest.mark.parametrize("tx_size", [T.TX_4X4, T.TX_16X16, T.TX_32X32, T.TX_64X64])
@pytest.mark.parametrize("qindex", [1, 20, 60, 120, 200, 255])
def test_quant_dequant_roundtrip_error_bounded(tx_size, qindex):
    import jax.numpy as jnp

    rng = np.random.default_rng(qindex + tx_size)
    w, h = T.TX_W[tx_size], T.TX_H[tx_size]
    shift = Q.tx_scale(tx_size)
    dc, ac = Q.quant_params(qindex)
    co = rng.integers(-(1 << 14), 1 << 14, size=(4, h, w)).astype(np.int32)
    lv = np.asarray(Q.quantize(jnp.asarray(co), qindex, tx_size, 8))
    dq = np.asarray(Q.dequantize(jnp.asarray(lv), qindex, tx_size, 8))
    # reconstruction error bounded by ~ one effective step
    step = max(dc, ac) / (1 << shift)
    err = np.abs(dq.astype(np.int64) - co)
    assert err.max() <= step + 2, (tx_size, qindex, err.max(), step)
    # signs preserved
    assert ((np.sign(dq) == np.sign(lv)) | (lv == 0)).all()


def test_zero_input_zero_output():
    import jax.numpy as jnp

    z = jnp.zeros((2, 8, 8), jnp.int32)
    assert np.asarray(Q.quantize(z, 50, T.TX_8X8, 8)).sum() == 0
    assert np.asarray(Q.dequantize(z, 50, T.TX_8X8, 8)).sum() == 0


def test_dequant_np_matches_jax():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    lv = rng.integers(-500, 500, size=(3, 16, 16)).astype(np.int32)
    a = Q.dequantize_np(lv, 100, T.TX_16X16)
    b = np.asarray(Q.dequantize(jnp.asarray(lv), 100, T.TX_16X16, 8))
    assert (a == b).all()


def test_lossless_qindex_zero_is_small_step():
    # qindex 0 -> step 4 (both dc and ac), the spec's lossless anchor
    assert Q.quant_params(0) == (4, 4)
