"""Multi-reference prediction (hier-B 3-slot ref lists).

Interior mini-GOP frames add the span base as a third single-prediction
reference (LAST + BWDREF + ALTREF) — ref Av1GenerateRpsInfo
(EbPictureDecisionProcess.c:1094) builds per-direction lists the same
way.  The invariant is unchanged: every decoded frame must equal the
encoder's recon bit-exactly, now across frames that code ref_frame
against three references and compound pairs (LAST, BWDREF).
"""

import numpy as np

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.decoder import Decoder
from svt_av1_tpu.io.yuv import synthetic_frame
from svt_av1_tpu.pipeline.encoder import Encoder

W, H = 192, 128


def _clip(n):
    base = synthetic_frame(W, H, seed=3)
    out = []
    for i in range(n):
        f = synthetic_frame(W, H, seed=3)
        f.y[:] = np.roll(base.y, (i, 2 * i), (0, 1))
        f.u[:] = np.roll(base.u, (i, i), (0, 1))
        f.v[:] = np.roll(base.v, (0, i), (0, 1))
        out.append(f)
    return out


def _roundtrip(cfg, frames):
    enc = Encoder(cfg)
    for f in frames:
        enc.send_picture(f)
    enc.flush()
    dec = Decoder()
    shown, recons = [], {}
    while True:
        pkt = enc.get_packet()
        if pkt is None:
            break
        out = dec.decode_temporal_unit(pkt.payload)
        if out is not None:
            shown.append(out)
        if pkt.recon is not None:
            recons[pkt.display_idx] = pkt.recon
    return enc, shown, recons


def test_three_ref_hier_bit_exact():
    frames = _clip(9)
    cfg = EncoderConfig(width=W, height=H, qp=40, intra_period=-1,
                        pred_structure=2, hierarchical_levels=2,
                        enc_mode=7, multi_ref=1, compound_mode=1,
                        scene_change_detection=False)
    enc, shown, recons = _roundtrip(cfg, frames)
    assert getattr(enc, "_nrefs3_frames", 0) >= 2, \
        "no frame actually coded against 3 references"
    assert len(shown) == 9
    for i, fr in enumerate(shown):
        r = recons[i]
        assert (fr.y == r.y).all(), f"frame {i} luma mismatch"
        assert (fr.u == r.u).all() and (fr.v == r.v).all(), i


def test_multi_ref_improves_or_matches_rate():
    """The 3-ref argmin can only reduce the SAD-cost of the chosen
    predictor; total payload at fixed q should not grow materially."""
    frames = _clip(9)
    base = dict(width=W, height=H, qp=40, intra_period=-1,
                pred_structure=2, hierarchical_levels=2, enc_mode=7,
                compound_mode=1, scene_change_detection=False)
    sizes = {}
    for mr in (0, 1):
        enc = Encoder(EncoderConfig(multi_ref=mr, **base))
        for f in frames:
            enc.send_picture(f)
        enc.flush()
        tot = 0
        while True:
            pkt = enc.get_packet()
            if pkt is None:
                break
            tot += len(pkt.payload)
        sizes[mr] = tot
    assert sizes[1] <= sizes[0] * 1.02, sizes
