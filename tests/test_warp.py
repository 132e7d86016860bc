"""Warped motion (WARPED_CAUSAL): derivation units + e2e parity.

The warp model is decoder-derived (spec 7.10.2), so encoder and decoder
must run identical integer algorithms — ops/warp.py +
entropy/warp_samples.py are shared verbatim; these tests pin the filter
semantics and prove a warp-coded stream mirror-decodes bit-exactly.
ref: EbWarpedMotion.c find_affine_int/get_shear_params/av1_warp_affine_c.
"""

import numpy as np

from svt_av1_tpu.ops import warp as WP


def test_warp_filter_identity_model():
    """The identity model predicts through phase row 64 of the
    normative Warp_Filter — NOT a copy (row = [0,0,0,127,1,...]), so
    the output is a slight smoothing of the source window but must be
    sample-aligned (no shift)."""
    rng = np.random.RandomState(1)
    ref = rng.randint(0, 255, (64, 96)).astype(np.int32)
    sh = WP.get_shear_params(WP.IDENTITY)
    assert sh == (0, 0, 0, 0)
    p = WP.warp_block(ref, WP.IDENTITY, sh, 16, 8, 16, 16, 0, 0, 8)
    d = np.abs(p - ref[8:24, 16:32])
    assert d.max() <= 6 and d.mean() < 2.0   # 127/1 taps, not a copy
    # flat content IS exact (any normalized filter reproduces it)
    flat = np.full((64, 96), 133, np.int32)
    p = WP.warp_block(flat, WP.IDENTITY, sh, 16, 8, 16, 16, 0, 0, 8)
    assert (p == 133).all()


def test_affine_fit_recovers_translation():
    """A pure-translation sample field fits to ~identity diagonal and a
    translation matching the MV."""
    pts1 = [(x * 8, y * 8) for x, y in ((0, 0), (16, 0), (0, 16),
                                        (16, 16))]
    mv = (-16, 24)   # (row, col) 1/8-pel
    pts2 = [(x + mv[1], y + mv[0]) for (x, y) in pts1]
    wm = WP.find_affine_int(pts1, pts2, 16, 16, mv, 4, 6)
    assert wm is not None
    assert abs(wm[2] - (1 << 16)) < 128 and abs(wm[5] - (1 << 16)) < 128
    assert abs(wm[3]) < 128 and abs(wm[4]) < 128
    assert WP.get_shear_params(wm) is not None


def test_shear_rejects_extreme_affine():
    wm = (0, 0, 3 << 16, 0, 0, 1 << 16, 0, 0)   # 3x horizontal stretch
    assert WP.get_shear_params(wm) is None
    assert WP.get_shear_params((0, 0, -1, 0, 0, 1 << 16, 0, 0)) is None


def _shear_clip(W, H, n, s=0.02):
    """Content under a slight affine shear per frame: the local MV
    field varies linearly -> warp projections are derivable and win."""
    from svt_av1_tpu.io.yuv import Frame, synthetic_frame
    base = synthetic_frame(W * 2, H * 2, seed=9)
    rr, cc = np.indices((H, W))
    out = []
    for t in range(n):
        # x' = x + t*s*y (shear), plus a slow pan
        sx = (cc + t * s * rr + 2 * t).astype(np.int32) % (2 * W)
        sy = (rr + t * s * cc + t).astype(np.int32) % (2 * H)
        y = base.y[sy, sx]
        u = base.u[sy[::2, ::2] // 2 % H, sx[::2, ::2] // 2 % W]
        v = base.v[sy[::2, ::2] // 2 % H, sx[::2, ::2] // 2 % W]
        out.append(Frame(y.copy(), u.copy(), v.copy()))
    return out


def test_warp_e2e_mirror_decode():
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.conformance import check_stream
    from svt_av1_tpu.decoder.decode import Decoder
    from svt_av1_tpu.pipeline.encoder import Encoder

    W, H = 256, 128
    frames = _shear_clip(W, H, 4)
    enc = Encoder(EncoderConfig(width=W, height=H, qp=44, intra_period=63,
                                pred_structure=0, enc_mode=5,
                                enable_warped_motion=True,
                                enable_global_motion=False,
                                scene_change_detection=False))
    for f in frames:
        enc.send_picture(f)
    pk = [enc.get_packet() for _ in frames]
    n_warp_frames = 0
    dec = Decoder()
    for i, p in enumerate(pk):
        df = dec.decode_temporal_unit(p.payload)
        for a, b in ((df.y, p.recon.y), (df.u, p.recon.u),
                     (df.v, p.recon.v)):
            assert np.array_equal(a, b), f"warp mismatch frame {i}"
        if i > 0 and dec.fp.switchable_motion_mode:
            n_warp_frames += 1
    check_stream([p.payload for p in pk])
    # the shear clip must actually exercise WARPED_CAUSAL
    assert n_warp_frames > 0, "no frame selected any warped block"
