"""Coefficient codec round-trip tests (writer vs mirror reader)."""

import numpy as np
import pytest

from svt_av1_tpu.entropy import syntax as S
from svt_av1_tpu.entropy.cdf_model import FrameContext
from svt_av1_tpu.entropy.range_coder import RangeDecoder, RangeEncoder
from svt_av1_tpu.ops import transforms as T


def _sparse_levels(rng, h, w, density, maxlvl):
    lv = np.zeros((h, w), np.int32)
    n = max(1, int(h * w * density))
    idx = rng.choice(h * w, size=n, replace=False)
    vals = rng.integers(1, maxlvl + 1, size=n) * rng.choice([-1, 1], size=n)
    lv.flat[idx] = vals
    # bias energy toward low frequencies like real transforms
    lv[h // 2 :, w // 2 :] = 0
    return lv


@pytest.mark.parametrize("tx_size", [T.TX_4X4, T.TX_8X8, T.TX_16X16,
                                     T.TX_32X32, T.TX_8X4, T.TX_4X8,
                                     T.TX_16X8, T.TX_64X64])
@pytest.mark.parametrize("density,maxlvl", [(0.1, 3), (0.4, 30), (0.9, 600)])
def test_coeff_roundtrip(tx_size, density, maxlvl):
    rng = np.random.default_rng(tx_size * 17 + maxlvl)
    w, h = S.adjusted_dims(tx_size)
    qidx = 80
    enc_fc = FrameContext(qidx)
    dec_fc = FrameContext(qidx)
    enc = RangeEncoder()
    blocks = []
    for i in range(25):
        lv = _sparse_levels(rng, h, w, density, maxlvl)
        if i % 7 == 0:
            lv[:] = 0  # all-zero blocks exercise the skip path
        ctx = (int(rng.integers(0, 13)), int(rng.integers(0, 3)))
        ymode = int(rng.integers(0, 13))
        blocks.append((lv, ctx, ymode))
        S.write_coeffs_txb(enc, enc_fc, lv, tx_size, 0, 0, ctx[0], ctx[1],
                           write_tx_type=True, y_mode=ymode)
    data = enc.done()
    dec = RangeDecoder(data)
    for lv, ctx, ymode in blocks:
        got, cul, tt = S.read_coeffs_txb(dec, dec_fc, tx_size, 0,
                                         ctx[0], ctx[1], read_tx_type=True,
                                         y_mode=ymode)
        assert (got == lv).all()
        assert cul == S.cul_level_of(lv)
        assert tt == 0
    # adaptive CDFs must be in lockstep
    assert (enc_fc.coeff_base == dec_fc.coeff_base).all()
    assert (enc_fc.txb_skip == dec_fc.txb_skip).all()


@pytest.mark.parametrize("tx_type", [0, 1, 2, 3, 9, 10, 11])
def test_coeff_roundtrip_tx_types(tx_type):
    """All members of the intra DTT4_IDTX_1DDCT set (incl. 1-D scan classes)."""
    rng = np.random.default_rng(tx_type)
    tx_size = T.TX_8X8
    w, h = S.adjusted_dims(tx_size)
    enc_fc, dec_fc = FrameContext(100), FrameContext(100)
    enc = RangeEncoder()
    blocks = []
    for _ in range(10):
        lv = _sparse_levels(rng, h, w, 0.3, 12)
        blocks.append(lv)
        S.write_coeffs_txb(enc, enc_fc, lv, tx_size, 0, tx_type, 1, 0,
                           write_tx_type=True, y_mode=4, reduced_tx_set=False)
    dec = RangeDecoder(enc.done())
    for lv in blocks:
        got, _, tt = S.read_coeffs_txb(dec, dec_fc, tx_size, 0, 1, 0,
                                       read_tx_type=True, y_mode=4,
                                       reduced_tx_set=False)
        assert tt == tx_type
        assert (got == lv).all()


def test_chroma_plane_roundtrip():
    rng = np.random.default_rng(5)
    enc_fc, dec_fc = FrameContext(50), FrameContext(50)
    enc = RangeEncoder()
    blocks = []
    for _ in range(20):
        lv = _sparse_levels(rng, 4, 4, 0.5, 40)
        blocks.append(lv)
        S.write_coeffs_txb(enc, enc_fc, lv, T.TX_4X4, 1, 0, 7, 0)
    dec = RangeDecoder(enc.done())
    for lv in blocks:
        got, _, _ = S.read_coeffs_txb(dec, dec_fc, T.TX_4X4, 1, 7, 0)
        assert (got == lv).all()


def test_golomb_extremes():
    """Levels beyond the BR range use exp-golomb tails."""
    enc_fc, dec_fc = FrameContext(200), FrameContext(200)
    enc = RangeEncoder()
    lv = np.zeros((4, 4), np.int32)
    lv[0, 0] = -3000
    lv[0, 1] = 15
    lv[1, 0] = 250
    S.write_coeffs_txb(enc, enc_fc, lv, T.TX_4X4, 0, 0, 0, 2,
                       write_tx_type=True, y_mode=0)
    dec = RangeDecoder(enc.done())
    got, _, _ = S.read_coeffs_txb(dec, dec_fc, T.TX_4X4, 0, 0, 2,
                                  read_tx_type=True, y_mode=0)
    assert (got == lv).all()
