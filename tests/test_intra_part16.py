"""Multi-size intra partitions (16x16 leaves, enc_mode <= 7).

The 16x16-unit wavefront (pipeline/intra_encoder.frame_step16) encodes
the four 8x8 sub-blocks AND the whole 16x16 block per unit and keeps
the J = SSE + lambda*bits winner; keyframes then carry a real partition
tree (PARTITION_NONE at n4=4) instead of the uniform full-split grid.
Ref: per-SB depth decisions in mode_decision_sb
(/root/reference/Source/Lib/Common/Codec/EbProductCodingLoop.c:3300).
"""

import numpy as np
import pytest

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.decoder.decode import Decoder
from svt_av1_tpu.io.yuv import Frame, synthetic_frame
from svt_av1_tpu.pipeline.encoder import Encoder


def _flat_gradient_frame(W, H):
    """Low-detail content that should merge to 16 leaves."""
    y = (np.add.outer(np.linspace(20, 120, H), np.linspace(0, 90, W))
         .astype(np.uint8))
    u = np.full((H // 2, W // 2), 120, np.uint8)
    v = np.full((H // 2, W // 2), 136, np.uint8)
    return Frame(y, u, v)


def _leaf_histogram(payload):
    """Decode and count intra leaf sizes via an instrumented decoder."""
    from collections import Counter

    seen = Counter()
    orig = Decoder._block

    class Spy(Decoder):
        def _block(self, r4, c4, lbs=8):
            seen[lbs] += 1
            return orig(self, r4, c4, lbs)

    frame = Spy().decode_temporal_unit(payload)
    return frame, seen


def test_part16_mirror_decode_and_merges():
    W, H = 120, 88   # odd 8-block grid: partial bottom/right units
    f = _flat_gradient_frame(W, H)
    enc = Encoder(EncoderConfig(width=W, height=H, qp=50, enc_mode=4,
                                intra_period=63, pred_structure=0))
    enc.send_picture(f)
    pkt = enc.get_packet()
    df, seen = _leaf_histogram(pkt.payload)
    assert np.array_equal(df.y, pkt.recon.y)
    assert np.array_equal(df.u, pkt.recon.u)
    assert np.array_equal(df.v, pkt.recon.v)
    # flat content must actually merge
    assert seen.get(16, 0) > 0, f"no 16x16 leaves chosen: {seen}"


def test_part16_textured_keeps_8s_and_decodes():
    W, H = 128, 96
    f = synthetic_frame(W, H, seed=9)
    enc = Encoder(EncoderConfig(width=W, height=H, qp=30, enc_mode=4,
                                intra_period=63, pred_structure=0))
    enc.send_picture(f)
    pkt = enc.get_packet()
    df, seen = _leaf_histogram(pkt.payload)
    assert np.array_equal(df.y, pkt.recon.y)
    assert seen.get(8, 0) > 0


def test_part16_python_cpp_backends_identical():
    W, H = 112, 80
    f = _flat_gradient_frame(W, H)
    f.y[40:, 56:] = synthetic_frame(W, H, seed=3).y[40:, 56:]
    pkts = {}
    for be in ("python", "cpp"):
        enc = Encoder(EncoderConfig(width=W, height=H, qp=45, enc_mode=4,
                                    intra_period=63, pred_structure=0,
                                    entropy_backend=be))
        enc.send_picture(f)
        pkts[be] = enc.get_packet().payload
    assert pkts["python"] == pkts["cpp"]


def test_part16_beats_uniform_grid_bits():
    """On flat content the partition tree must save bits at equal or
    better quality (keyframe PSNR within noise)."""
    W, H = 192, 128
    f = _flat_gradient_frame(W, H)

    def run(enc_mode):
        enc = Encoder(EncoderConfig(width=W, height=H, qp=45,
                                    enc_mode=enc_mode, intra_period=63,
                                    pred_structure=0, stat_report=True))
        enc.send_picture(f)
        p = enc.get_packet()
        return len(p.payload), p.psnr[0]

    bits16, psnr16 = run(4)     # multi-size
    bits8, psnr8 = run(8)       # uniform 8x8 (fast preset)
    assert bits16 < bits8, (bits16, bits8)
    assert psnr16 > psnr8 - 0.3, (psnr16, psnr8)


def test_part16_ippp_chain_parity():
    """Keyframe 16-leaves recon must feed the inter chain bit-exactly."""
    W, H = 128, 96
    base = _flat_gradient_frame(W, H)
    frames = []
    for t in range(3):
        y = np.roll(base.y, (t, 2 * t), (0, 1))
        frames.append(Frame(y, base.u.copy(), base.v.copy()))
    enc = Encoder(EncoderConfig(width=W, height=H, qp=45, enc_mode=7,
                                intra_period=63, pred_structure=0,
                                scene_change_detection=False))
    for f in frames:
        enc.send_picture(f)
    pkts = [enc.get_packet() for _ in frames]
    dec = Decoder()
    for i, p in enumerate(pkts):
        df = dec.decode_temporal_unit(p.payload)
        assert np.array_equal(df.y, p.recon.y), f"frame {i}"


def test_part16_bd10():
    W, H = 96, 64
    rng = np.random.default_rng(3)
    y = (np.add.outer(np.linspace(60, 800, H), np.linspace(0, 150, W))
         + rng.normal(0, 1.0, (H, W))).astype(np.uint16)
    u = np.full((H // 2, W // 2), 512, np.uint16)
    v = np.full((H // 2, W // 2), 512, np.uint16)
    enc = Encoder(EncoderConfig(width=W, height=H, qp=50, enc_mode=4,
                                bit_depth=10, intra_period=63,
                                pred_structure=0))
    enc.send_picture(Frame(y, u, v))
    pkt = enc.get_packet()
    df, seen = _leaf_histogram(pkt.payload)
    assert np.array_equal(df.y, pkt.recon.y)
    assert np.array_equal(df.u, pkt.recon.u)
