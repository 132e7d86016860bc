"""Lookahead: open-loop complexity window -> frame-level q assignment
(ref InitialRateControlProcess look-ahead handling)."""

import numpy as np

from svt_av1_tpu import EncoderConfig
from svt_av1_tpu.decoder import Decoder
from svt_av1_tpu.entropy import obu as O
from svt_av1_tpu.io import synthetic_frame
from svt_av1_tpu.pipeline.encoder import Encoder
from svt_av1_tpu.pipeline.lookahead import Lookahead
from svt_av1_tpu.utils.bits import BitReader


def test_window_offsets_bounded_and_signed():
    la = Lookahead(4)
    base = synthetic_frame(128, 96, seed=0)
    frames = []
    for i in range(10):
        f = synthetic_frame(128, 96, seed=0)
        f.y[:] = np.roll(base.y, 0 if i < 5 else 5 * i, 0)
        frames.append(f)
    out = []
    for f in frames:
        out += la.push(f)
    out += la.flush()
    offs = [o for _, o in out]
    assert len(out) == 10
    assert all(-12 <= o <= 12 for o in offs)
    assert min(offs) < 0 < max(offs)   # static run boosted, motion taxed


def test_lookahead_e2e_bit_exact_varying_q():
    W, H = 192, 128
    cfg = EncoderConfig(width=W, height=H, qp=45, intra_period=63,
                        pred_structure=0, look_ahead_distance=4,
                        scene_change_detection=False)
    enc, dec = Encoder(cfg), Decoder()
    base = synthetic_frame(W, H, seed=0)
    frames = []
    for i in range(8):
        f = synthetic_frame(W, H, seed=0)
        shift = 0 if i < 4 else 4 * i
        f.y[:] = np.roll(base.y, (shift, shift), (0, 1))
        f.u[:] = np.roll(base.u, (0, shift // 2), (0, 1))
        f.v[:] = np.roll(base.v, (0, shift // 2), (0, 1))
        frames.append(f)
    pkts = list(enc.encode_all(frames))
    assert len(pkts) == 8
    qs, sp = [], None
    for p in pkts:
        d = dec.decode_temporal_unit(p.payload)
        np.testing.assert_array_equal(d.y, p.recon.y)
        np.testing.assert_array_equal(d.u, p.recon.u)
        np.testing.assert_array_equal(d.v, p.recon.v)
        for ot, pay in O.split_obus(p.payload):
            if ot == O.OBU_SEQUENCE_HEADER:
                sp = O.parse_sequence_header(pay)
            if ot == O.OBU_FRAME:
                qs.append(O.parse_frame_header_bits(BitReader(pay),
                                                    sp).base_q_idx)
    assert len(set(qs[1:])) > 1   # q follows the motion change
