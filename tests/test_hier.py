"""Hierarchical-B (random access) coding: mini-GOP planning, order-hint
headers, show_existing display, and e2e bit-exact mirror decode.

Ref parity targets: picture decision mini-GOPs
(EbPictureDecisionProcess.c:1632, EbPredictionStructure.c), RPS slot
management (Av1GenerateRpsInfo EbPictureDecisionProcess.c:1094),
show_existing_frame packetization (EbPacketizationProcess.c).
"""

import numpy as np
import pytest

from svt_av1_tpu import EncoderConfig
from svt_av1_tpu.decoder import Decoder
from svt_av1_tpu.io import synthetic_frame
from svt_av1_tpu.pipeline.encoder import Encoder
from svt_av1_tpu.pipeline.gop import (CodeStep, ShowStep, plan_minigop,
                                      plan_pins)


def test_plan_minigop_dyadic_8():
    steps = plan_minigop(0, 8)
    codes = [(s.disp, s.fwd, s.bwd, s.layer) for s in steps
             if isinstance(s, CodeStep)]
    assert codes == [(8, 0, None, 0), (4, 0, 8, 1), (2, 0, 4, 2),
                     (1, 0, 2, 3), (3, 2, 4, 3), (6, 4, 8, 2),
                     (5, 4, 6, 3), (7, 6, 8, 3)]
    shows = [s.disp for s in steps if isinstance(s, ShowStep)]
    assert shows == list(range(1, 9))
    # every code step's refs are already coded at that point
    coded = {0}
    for s in steps:
        if isinstance(s, CodeStep):
            assert s.fwd in coded and (s.bwd is None or s.bwd in coded)
            coded.add(s.disp)


@pytest.mark.parametrize("span", [1, 2, 3, 5, 7, 16])
def test_plan_minigop_truncated(span):
    steps = plan_minigop(10, 10 + span)
    disp = [s.disp for s in steps if isinstance(s, ShowStep)]
    assert disp == list(range(11, 11 + span))
    coded = {s.disp for s in steps if isinstance(s, CodeStep)}
    assert coded == set(range(11, 11 + span))
    # pins balance: every pin is released by exactly one use
    pins = plan_pins(steps, 10)
    assert sum(pins.values()) == sum(
        (1 + (s.bwd is not None)) if isinstance(s, CodeStep) else 1
        for s in steps)


def _roll_frames(w, h, n):
    base = synthetic_frame(w, h, seed=0)
    out = [base]
    for i in range(1, n):
        f = synthetic_frame(w, h, seed=0)
        f.y[:] = np.roll(base.y, (i, 2 * i), (0, 1))
        f.u[:] = np.roll(base.u, (0, i), (0, 1))
        f.v[:] = np.roll(base.v, (0, i), (0, 1))
        out.append(f)
    return out


def _drive(cfg, frames):
    enc = Encoder(cfg)
    pkts = list(enc.encode_all(frames))
    dec = Decoder()
    shown = []
    for p in pkts:
        f = dec.decode_temporal_unit(p.payload)
        if f is not None:
            shown.append(f)
    return pkts, shown


def test_hier_e2e_bit_exact_display_order():
    W, H = 192, 128
    n = 6   # one full GOP of 4 + truncated [4, 5]
    cfg = EncoderConfig(width=W, height=H, qp=45, intra_period=63,
                        pred_structure=2, hierarchical_levels=2,
                        stat_report=True)
    pkts, shown = _drive(cfg, _roll_frames(W, H, n))
    assert len(shown) == n
    recs = {p.display_idx: p.recon for p in pkts if p.recon is not None}
    assert sorted(recs) == list(range(n))
    for d in range(n):
        np.testing.assert_array_equal(shown[d].y, recs[d].y)
        np.testing.assert_array_equal(shown[d].u, recs[d].u)
        np.testing.assert_array_equal(shown[d].v, recs[d].v)
    # structure: B frames reference both directions and cost fewer bits
    coded = [p for p in pkts if not p.show]
    assert len(coded) == n - 1
    # the no-show/show_existing pattern covers every display index once
    se = [p for p in pkts if p.show and not p.is_keyframe]
    assert sorted(p.display_idx for p in se) == list(range(1, n))


def test_low_delay_b_e2e_bit_exact():
    """pred_structure=1: every frame refs LAST + GOLDEN (both forward),
    shown in order, no buffering (ref EB_PRED_LOW_DELAY_B)."""
    W, H = 192, 128
    cfg = EncoderConfig(width=W, height=H, qp=45, intra_period=63,
                        pred_structure=1, scene_change_detection=False,
                        stat_report=True)
    pkts, shown = _drive(cfg, _roll_frames(W, H, 5))
    assert len(shown) == 5
    assert [p.pts for p in pkts] == list(range(5))
    assert all(p.show for p in pkts)
    for d in range(5):
        np.testing.assert_array_equal(shown[d].y, pkts[d].recon.y)
        np.testing.assert_array_equal(shown[d].u, pkts[d].recon.u)
        np.testing.assert_array_equal(shown[d].v, pkts[d].recon.v)


def test_hier_compound_e2e_bit_exact():
    """Compound average blocks: the middle frame is a literal blend of
    its two references, so COMPOUND_AVERAGE must win on most blocks.
    Parity invariant unchanged: decoded == recon bit-exact."""
    W, H = 192, 128
    rng = np.random.default_rng(7)
    f0 = synthetic_frame(W, H, seed=0)
    f2 = synthetic_frame(W, H, seed=3)
    f1 = synthetic_frame(W, H, seed=0)
    for pl in "yuv":
        a = getattr(f0, pl).astype(np.int32)
        b = getattr(f2, pl).astype(np.int32)
        blend = ((a + b + 1) // 2
                 + rng.integers(-2, 3, a.shape)).clip(0, 255)
        getattr(f1, pl)[:] = blend.astype(np.uint8)
    cfg = EncoderConfig(width=W, height=H, qp=45, intra_period=63,
                        pred_structure=2, hierarchical_levels=1,
                        scene_change_detection=False)
    pkts, shown = _drive(cfg, [f0, f1, f2])
    assert len(shown) == 3
    recs = {p.display_idx: p.recon for p in pkts if p.recon is not None}
    for d in range(3):
        np.testing.assert_array_equal(shown[d].y, recs[d].y)
        np.testing.assert_array_equal(shown[d].u, recs[d].u)
        np.testing.assert_array_equal(shown[d].v, recs[d].v)


def test_hier_keyframe_interval_flushes_gop():
    W, H = 128, 96
    cfg = EncoderConfig(width=W, height=H, qp=45, intra_period=3,
                        pred_structure=2, hierarchical_levels=2,
                        scene_change_detection=False)
    # key at 0 and 4 (intra_period=3 -> every 4th frame)
    pkts, shown = _drive(cfg, _roll_frames(W, H, 6))
    assert len(shown) == 6
    keys = [p.display_idx for p in pkts if p.is_keyframe]
    assert keys == [0, 4]
