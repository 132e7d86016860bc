"""OBU header writer/parser lockstep tests.

Regression: the sequence-header parser once over-read 3 flag bits —
masked at small sizes by byte padding, fatal at 854x480.  Headers must
round-trip at every geometry.
"""

import pytest

from svt_av1_tpu.entropy import obu as O
from svt_av1_tpu.utils.bits import BitReader, BitWriter, leb128, read_leb128


@pytest.mark.parametrize("w,h", [(64, 64), (128, 96), (854, 480), (853, 479),
                                 (1280, 720), (1920, 1080), (4096, 2304),
                                 (100, 72), (2047, 65)])
def test_sequence_header_roundtrip(w, h):
    sp = O.SequenceParams(w, h)
    data = O.write_sequence_header(sp)
    (obu_type, payload), = list(O.split_obus(data))
    assert obu_type == O.OBU_SEQUENCE_HEADER
    got = O.parse_sequence_header(payload)
    assert (got.width, got.height) == (w, h)


@pytest.mark.parametrize("w,h,qidx", [(854, 480, 1), (854, 480, 160),
                                      (64, 64, 255), (1920, 1080, 100)])
def test_frame_header_roundtrip(w, h, qidx):
    sp = O.SequenceParams(w, h)
    fp = O.FrameParams(base_q_idx=qidx)
    payload = O.write_frame_obu(sp, fp, b"\xAB\xCD")
    (obu_type, body), = list(O.split_obus(payload))
    assert obu_type == O.OBU_FRAME
    r = BitReader(body)
    got = O.parse_frame_header_bits(r, sp)
    assert got.base_q_idx == qidx
    assert got.reduced_tx_set == fp.reduced_tx_set
    r.byte_align()
    assert body[r.byte_offset():] == b"\xAB\xCD"


def test_leb128():
    for v in (0, 1, 127, 128, 300, 2**20, 2**32 - 1):
        data = leb128(v)
        got, pos = read_leb128(data, 0)
        assert got == v and pos == len(data)


def test_bit_writer_reader():
    w = BitWriter()
    w.f(5, 3).f(1, 1).f(1023, 10).f(0, 2)
    w.byte_align()
    r = BitReader(w.data())
    assert r.f(3) == 5 and r.f(1) == 1 and r.f(10) == 1023 and r.f(2) == 0
