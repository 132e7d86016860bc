"""10-bit (high bitdepth) intra path: e2e bit-exact encode/decode.

Ref parity targets: color_config high_bitdepth bit
(reference/Source/Lib/Codec/EbEncSettings.c bit-depth handling and
svt_aom_write_sequence_header), 10-bit sample range [0, 1023].
"""

import numpy as np
import pytest

from svt_av1_tpu import EncoderConfig
from svt_av1_tpu.decoder import Decoder
from svt_av1_tpu.io import synthetic_frame
from svt_av1_tpu.pipeline.encoder import Encoder


def test_bd10_intra_e2e_bit_exact():
    w, h = 192, 128
    enc = Encoder(EncoderConfig(width=w, height=h, qp=40, bit_depth=10,
                                stat_report=True))
    dec = Decoder()
    for i in range(3):
        enc.send_picture(synthetic_frame(w, h, seed=i, bit_depth=10))
    n = 0
    while True:
        pkt = enc.get_packet()
        if pkt is None:
            break
        assert pkt.recon.y.dtype == np.uint16
        assert int(pkt.recon.y.max()) > 255  # actually using the 10-bit range
        fr = dec.decode_temporal_unit(pkt.payload)
        assert fr.y.dtype == np.uint16
        np.testing.assert_array_equal(fr.y, pkt.recon.y)
        np.testing.assert_array_equal(fr.u, pkt.recon.u)
        np.testing.assert_array_equal(fr.v, pkt.recon.v)
        assert pkt.psnr[0] > 25.0
        n += 1
    assert n == 3


def test_bd10_seq_header_roundtrip():
    from svt_av1_tpu.entropy.obu import SequenceParams, parse_sequence_header, \
        write_sequence_header
    from svt_av1_tpu.entropy.obu import OBU_SEQUENCE_HEADER, split_obus
    sp = SequenceParams(width=192, height=128, bit_depth=10)
    (obu_type, payload), = list(split_obus(write_sequence_header(sp)))
    assert obu_type == OBU_SEQUENCE_HEADER
    sp2 = parse_sequence_header(payload)
    assert sp2.bit_depth == 10
    assert (sp2.width, sp2.height) == (192, 128)


def test_bd10_inter_e2e_bit_exact():
    """10-bit flat-P and hierarchical-B (compound jnt path at bd=10)."""
    W, H = 192, 128
    for ps, hl in ((0, 3), (2, 1)):
        cfg = EncoderConfig(width=W, height=H, qp=45, intra_period=63,
                            pred_structure=ps, hierarchical_levels=hl,
                            bit_depth=10, scene_change_detection=False)
        from svt_av1_tpu.pipeline.encoder import Encoder as _E
        enc, dec = _E(cfg), Decoder()
        base = synthetic_frame(W, H, seed=0, bit_depth=10)
        frames = []
        for i in range(3):
            f = synthetic_frame(W, H, seed=0, bit_depth=10)
            f.y[:] = np.roll(base.y, (i, 2 * i), (0, 1))
            f.u[:] = np.roll(base.u, (0, i), (0, 1))
            f.v[:] = np.roll(base.v, (0, i), (0, 1))
            frames.append(f)
        pkts = list(enc.encode_all(frames))
        shown = [x for x in (dec.decode_temporal_unit(p.payload)
                             for p in pkts) if x is not None]
        assert len(shown) == 3
        if ps == 0:
            recs = {i: p.recon for i, p in enumerate(pkts)}
        else:
            recs = {p.display_idx: p.recon for p in pkts
                    if p.recon is not None}
        for d in range(3):
            assert shown[d].y.dtype == np.uint16
            assert int(shown[d].y.max()) > 255
            np.testing.assert_array_equal(shown[d].y, recs[d].y)
            np.testing.assert_array_equal(shown[d].u, recs[d].u)
            np.testing.assert_array_equal(shown[d].v, recs[d].v)
