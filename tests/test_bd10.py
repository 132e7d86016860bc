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


def test_bd10_inloop_filters_bit_exact():
    """10-bit DLF + CDEF (highbd semantics: thresholds/strengths scaled
    << 2, damping + 2, shifted direction search) must mirror-decode
    bit-exactly across intra, flat-P, and hier-B compound paths."""
    W, H = 192, 128
    base = synthetic_frame(W, H, seed=9, bit_depth=10)

    def clip(n):
        out = []
        for i in range(n):
            f = synthetic_frame(W, H, seed=9, bit_depth=10)
            f.y[:] = np.roll(base.y, (i, 2 * i), (0, 1))
            f.u[:] = np.roll(base.u, (0, i), (0, 1))
            f.v[:] = np.roll(base.v, (0, i), (0, 1))
            out.append(f)
        return out

    for kw in (dict(intra_period=-2),
               dict(intra_period=-1, pred_structure=0),
               dict(intra_period=-1, pred_structure=2,
                    hierarchical_levels=1, compound_mode=1)):
        enc = Encoder(EncoderConfig(width=W, height=H, qp=35, bit_depth=10,
                                    enable_deblocking=True, enable_cdef=True,
                                    scene_change_detection=False, **kw))
        dec = Decoder()
        recons = {}
        shown = []
        for pkt in enc.encode_all(clip(3)):
            out = dec.decode_temporal_unit(pkt.payload)
            if pkt.recon is not None:
                key = pkt.display_idx if pkt.display_idx is not None \
                    else len(recons)
                recons[key] = pkt.recon
            if out is not None:
                shown.append(out)
        assert len(shown) == 3
        for i, got in enumerate(shown):
            want = recons[i]
            np.testing.assert_array_equal(got.y, want.y)
            np.testing.assert_array_equal(got.u, want.u)
            np.testing.assert_array_equal(got.v, want.v)
