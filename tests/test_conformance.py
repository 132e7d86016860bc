"""Independent conformance checker vs the encoder's streams, plus a
seeded-mutation test proving the checker catches corruption
(VERDICT round-1 item 9)."""

import numpy as np
import pytest

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.conformance import ConformanceError, check_stream
from svt_av1_tpu.io.yuv import synthetic_frame
from svt_av1_tpu.pipeline.encoder import Encoder

W, H = 192, 128


def _clip(n):
    base = synthetic_frame(W, H, seed=6)
    out = []
    for i in range(n):
        f = synthetic_frame(W, H, seed=6)
        f.y[:] = np.roll(base.y, (i, 2 * i), (0, 1))
        out.append(f)
    return out


def _payloads(**kw):
    enc = Encoder(EncoderConfig(width=W, height=H, qp=40,
                                scene_change_detection=False,
                                recon_output=False, **kw))
    return [p.payload for p in enc.encode_all(_clip(5))]


CONFIGS = [
    dict(intra_period=-2),
    dict(intra_period=-1, pred_structure=0),
    dict(intra_period=-1, pred_structure=0, tile_columns_log2=1),
    dict(intra_period=-1, pred_structure=2, hierarchical_levels=2,
         compound_mode=1),
    dict(intra_period=-1, pred_structure=0, bit_depth=10),
    dict(intra_period=-1, pred_structure=0, enable_film_grain=8),
]


@pytest.mark.parametrize("kw", CONFIGS)
def test_streams_pass_independent_checker(kw):
    frames = _clip(5)
    if kw.get("bit_depth") == 10:
        base = synthetic_frame(W, H, seed=6, bit_depth=10)
        for i, f in enumerate(frames):
            frames[i] = synthetic_frame(W, H, seed=6, bit_depth=10)
            frames[i].y[:] = np.roll(base.y, (i, 2 * i), (0, 1))
    enc = Encoder(EncoderConfig(width=W, height=H, qp=40,
                                scene_change_detection=False,
                                recon_output=False, **kw))
    check_stream(p.payload for p in enc.encode_all(frames))


def test_checker_catches_seeded_corruption():
    """Canonical corruption classes MUST be caught, and a random
    single-bit sweep over the header region must catch a solid share
    (many header bits are legitimate value changes — qindex, filter
    levels — which no structural checker can flag)."""
    payloads = _payloads(intra_period=-1, pred_structure=0)

    def fails(seq):
        try:
            check_stream(seq)
            return False
        except ConformanceError:
            return True

    tu = bytearray(payloads[0])
    # 1. OBU forbidden bit
    m = bytearray(tu)
    m[0] |= 0x80
    assert fails([bytes(m)])
    # 2. OBU reserved bit
    m = bytearray(tu)
    m[0] |= 0x01
    assert fails([bytes(m)])
    # 3. truncation mid-OBU
    assert fails([bytes(tu[: len(tu) - 5])])
    # 4. oversized leb128 obu_size
    m = bytearray(tu)
    m[3] = 0xFF      # TD(2) then frame obu header+size region
    assert fails([bytes(m)])
    # 5. inter frame referencing never-filled slots: drop the keyframe
    assert fails(payloads[1:])

    rng = np.random.default_rng(7)
    caught = 0
    trials = 48
    for _ in range(trials):
        k = int(rng.integers(0, len(payloads)))
        mut = bytearray(payloads[k])
        pos = int(rng.integers(0, min(24, len(mut))))
        mut[pos] ^= 1 << int(rng.integers(0, 8))
        if fails([bytes(mut) if i == k else p
                  for i, p in enumerate(payloads)]):
            caught += 1
    assert caught >= trials * 0.35, (caught, trials)
