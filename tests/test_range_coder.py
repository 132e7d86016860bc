"""Range coder round-trip tests.

Mirrors the reference's BitstreamWriterTest.cc:169-233 (random bits,
literals, symbols with/without CDF update, decoded back with a reader).
"""

import numpy as np
import pytest

from svt_av1_tpu.entropy.range_coder import RangeDecoder, RangeEncoder
from svt_av1_tpu.entropy.cdf_model import make_icdf, update_icdf


def _rand_icdf(rng, nsyms):
    """Random strictly-increasing CDF -> inverse form."""
    cuts = np.sort(rng.choice(np.arange(1, 32768), size=nsyms - 1, replace=False))
    cum = np.concatenate([cuts, [32768]])
    return (32768 - cum).astype(np.int32)


@pytest.mark.parametrize("seed", range(4))
def test_bool_roundtrip(seed):
    rng = np.random.default_rng(seed)
    n = 2000
    bits = rng.integers(0, 2, size=n)
    probs = rng.integers(64, 32700, size=n)  # P(bit==0) in Q15
    enc = RangeEncoder()
    for b, p in zip(bits, probs):
        enc.encode_bool(int(b), int(p))
    data = enc.done()
    dec = RangeDecoder(data)
    got = [dec.decode_bool(int(p)) for p in probs]
    assert got == bits.tolist()


@pytest.mark.parametrize("seed", range(4))
def test_literal_roundtrip(seed):
    rng = np.random.default_rng(100 + seed)
    widths = rng.integers(1, 17, size=500)
    vals = [int(rng.integers(0, 1 << w)) for w in widths]
    enc = RangeEncoder()
    for v, w in zip(vals, widths):
        enc.encode_literal(v, int(w))
    dec = RangeDecoder(enc.done())
    assert [dec.decode_literal(int(w)) for w in widths] == vals


@pytest.mark.parametrize("nsyms", [2, 3, 4, 5, 8, 11, 13, 16])
def test_symbol_roundtrip_static_cdf(nsyms):
    rng = np.random.default_rng(nsyms)
    n = 1500
    icdf = _rand_icdf(rng, nsyms)
    syms = rng.integers(0, nsyms, size=n)
    enc = RangeEncoder()
    for s in syms:
        enc.encode_symbol(int(s), icdf, nsyms)
    dec = RangeDecoder(enc.done())
    assert [dec.decode_symbol(icdf, nsyms) for _ in range(n)] == syms.tolist()


@pytest.mark.parametrize("nsyms", [2, 4, 9, 13])
def test_symbol_roundtrip_adaptive_cdf(nsyms):
    """Encoder and decoder must stay in sync under per-symbol CDF updates."""
    rng = np.random.default_rng(7 * nsyms)
    n = 3000
    syms = rng.integers(0, nsyms, size=n)
    enc_cdf = make_icdf(nsyms)
    dec_cdf = make_icdf(nsyms)
    enc = RangeEncoder()
    for s in syms:
        enc.encode_symbol(int(s), enc_cdf, nsyms)
        update_icdf(enc_cdf, int(s), nsyms)
    dec = RangeDecoder(enc.done())
    got = []
    for _ in range(n):
        s = dec.decode_symbol(dec_cdf, nsyms)
        update_icdf(dec_cdf, s, nsyms)
        got.append(s)
    assert got == syms.tolist()
    assert enc_cdf.tolist() == dec_cdf.tolist()


def test_mixed_stream_roundtrip():
    rng = np.random.default_rng(42)
    ops = []
    enc = RangeEncoder()
    icdf = _rand_icdf(rng, 6)
    for _ in range(2500):
        kind = rng.integers(0, 3)
        if kind == 0:
            b, p = int(rng.integers(0, 2)), int(rng.integers(100, 32000))
            enc.encode_bool(b, p)
            ops.append(("bool", p, b))
        elif kind == 1:
            w = int(rng.integers(1, 13))
            v = int(rng.integers(0, 1 << w))
            enc.encode_literal(v, w)
            ops.append(("lit", w, v))
        else:
            s = int(rng.integers(0, 6))
            enc.encode_symbol(s, icdf, 6)
            ops.append(("sym", None, s))
    dec = RangeDecoder(enc.done())
    for kind, arg, want in ops:
        if kind == "bool":
            assert dec.decode_bool(arg) == want
        elif kind == "lit":
            assert dec.decode_literal(arg) == want
        else:
            assert dec.decode_symbol(icdf, 6) == want


def test_checkpoint_rollback():
    """RDO trial-encode then rollback must leave the stream unaffected."""
    enc = RangeEncoder()
    icdf = make_icdf(4)
    for s in (0, 1, 2, 3, 1):
        enc.encode_symbol(s, icdf, 4)
    ck = enc.checkpoint()
    for s in (3, 3, 3):
        enc.encode_symbol(s, icdf, 4)
    enc.rollback(ck)
    for s in (2, 0):
        enc.encode_symbol(s, icdf, 4)
    dec = RangeDecoder(enc.done())
    assert [dec.decode_symbol(icdf, 4) for _ in range(7)] == [0, 1, 2, 3, 1, 2, 0]


def test_short_stream_and_trailing_behavior():
    """Tiny streams (few symbols) must decode; decoder reads past end as 0s."""
    for nbits in range(1, 12):
        enc = RangeEncoder()
        enc.encode_literal(0b1011_0110_101 & ((1 << nbits) - 1), nbits)
        data = enc.done()
        dec = RangeDecoder(data)
        assert dec.decode_literal(nbits) == 0b1011_0110_101 & ((1 << nbits) - 1)
