"""Screen content: intra block copy (hash ME + IBC wavefront lane).

Mirrors the reference's coverage intent for its sc tools
(inject_intra_bc_candidates EbModeDecision.c:2301, hash_motion.c,
av1_is_dv_valid EbAdaptiveMotionVectorPrediction.c:2065): unit tests on
the hash/DV machinery plus e2e bit-exact encode->decode.
"""

import numpy as np
import pytest

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.decoder import Decoder
from svt_av1_tpu.io.yuv import Frame
from svt_av1_tpu.pipeline import ibc as IBC
from svt_av1_tpu.pipeline.encoder import Encoder


def screen_frame(w=256, h=192, seed=3):
    """Synthetic screen content: flat background + a repeated 'glyph'
    pattern stamped at even positions (text-like exact duplicates)."""
    rng = np.random.default_rng(seed)
    y = np.full((h, w), 235, np.uint8)
    glyph = rng.integers(0, 255, (16, 16), dtype=np.uint8)
    for r in range(8, h - 24, 24):
        for c in range(8, w - 24, 20):
            y[r : r + 16, c : c + 16] = glyph
    u = np.full((h // 2, w // 2), 128, np.uint8)
    v = np.full((h // 2, w // 2), 128, np.uint8)
    # chroma detail that must copy correctly too
    u[: h // 4, : w // 4] = 90
    return Frame(y, u, v)


def test_hash_dv_map_finds_duplicates():
    f = screen_frame()
    mi_rows, mi_cols = 2 * ((192 + 7) >> 3), 2 * ((256 + 7) >> 3)
    use, dv = IBC.hash_dv_map(f.y, mi_rows, mi_cols)
    assert use.any(), "repeated glyphs must produce IBC hits"
    # every hit is an exact duplicate, even, spec-valid and causal
    rs, cs = np.nonzero(use)
    for i, j in zip(rs, cs):
        dr, dc = int(dv[i, j, 0]), int(dv[i, j, 1])
        assert dr % 2 == 0 and dc % 2 == 0
        sr, sc = i * 8 + dr, j * 8 + dc
        assert np.array_equal(f.y[i * 8 : i * 8 + 8, j * 8 : j * 8 + 8],
                              f.y[sr : sr + 8, sc : sc + 8])
        # staircase causality: bottom-right source cell precedes target
        assert 2 * ((sr + 7) >> 3) + ((sc + 7) >> 3) < 2 * i + j
        # spec hardware-delay: bottom-right at least 4 SB64s back
        tot = (mi_cols * 4 - 1) // 64 + 1
        src64 = ((sr + 8 - 1) // 64) * tot + (sc + 8 - 1) // 64
        act64 = (i * 8 // 64) * tot + (j * 8 // 64)
        assert src64 < act64 - IBC.INTRABC_DELAY_SB64


def test_dv_validity_rejects_near_sources():
    # a source immediately left of the target violates the 256-px delay
    ok = IBC._dv_valid_spec(np.array(10), np.array(40), np.array(72),
                            np.array(304), 48, 64)
    assert not ok
    # far up-left is fine
    ok = IBC._dv_valid_spec(np.array(10), np.array(40), np.array(0),
                            np.array(0), 48, 64)
    assert ok


def _roundtrip(cfg, frames):
    enc = Encoder(cfg)
    dec = Decoder()
    n_ibc_frames = 0
    for f in frames:
        enc.send_picture(f)
    enc.flush()
    while True:
        pkt = enc.get_packet()
        if pkt is None:
            break
        out = dec.decode_temporal_unit(pkt.payload)
        if pkt.recon is not None and out is not None:
            assert (out.y == pkt.recon.y).all()
            assert (out.u == pkt.recon.u).all()
            assert (out.v == pkt.recon.v).all()
        n_ibc_frames += 1
    return n_ibc_frames


def test_ibc_e2e_intra_only():
    f = screen_frame()
    cfg = EncoderConfig(width=256, height=192, qp=30, intra_period=-2,
                        screen_content_mode=1, stat_report=True)
    enc = Encoder(cfg)
    enc.send_picture(f)
    pkt = enc.get_packet()
    assert pkt is not None
    # the stream really used IBC and is smaller than without it
    cfg2 = EncoderConfig(width=256, height=192, qp=30, intra_period=-2,
                         stat_report=True)
    enc2 = Encoder(cfg2)
    enc2.send_picture(f)
    pkt2 = enc2.get_packet()
    assert len(pkt.payload) < len(pkt2.payload), \
        "IBC must win bits on exact-duplicate screen content"
    out = Decoder().decode_temporal_unit(pkt.payload)
    assert (out.y == pkt.recon.y).all()
    assert (out.u == pkt.recon.u).all()
    assert (out.v == pkt.recon.v).all()


def test_ibc_e2e_conformance():
    from svt_av1_tpu.conformance import check_stream
    f = screen_frame()
    cfg = EncoderConfig(width=256, height=192, qp=35, intra_period=-2,
                        screen_content_mode=1)
    enc = Encoder(cfg)
    enc.send_picture(f)
    pkt = enc.get_packet()
    check_stream([pkt.payload])


def test_ibc_keyframe_then_inter():
    """IPPP chain whose keyframe codes IBC blocks: the unfiltered IBC
    recon is the reference for the P frames; mirror decode stays
    bit-exact across the whole chain."""
    base = screen_frame()
    frames = [base]
    for i in range(1, 4):
        f = screen_frame()
        f.y[:] = np.roll(base.y, 2 * i, 1)
        frames.append(f)
    cfg = EncoderConfig(width=256, height=192, qp=35, intra_period=-1,
                        pred_structure=0, screen_content_mode=1,
                        stat_report=True, scene_change_detection=False,
                        enable_global_motion=False)
    _roundtrip(cfg, frames)


def test_sc_auto_detection():
    assert IBC.detect_screen_content(screen_frame().y)
    rng = np.random.default_rng(0)
    noisy = rng.integers(0, 255, (192, 256), dtype=np.uint8)
    assert not IBC.detect_screen_content(noisy)
