"""Deblocking filter tests: np/jax equality, filtering activity, e2e."""

import numpy as np
import pytest

from svt_av1_tpu.ops import deblock as DB


def _blocky_plane(H, W, bs, rng):
    """Piecewise-constant blocks: the ideal deblock target."""
    vals = rng.integers(60, 196, (H // bs, W // bs))
    return np.repeat(np.repeat(vals, bs, 0), bs, 1).astype(np.int32)


def test_np_jax_equal_and_active():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    H, W = 64, 96
    plane = _blocky_plane(H, W, 8, rng)
    sizes = np.full((H, W), 8, np.int32)
    for lvl in (7, 20, 63):
        a = DB.deblock_plane(np, plane.copy(), sizes, lvl, lvl, True)
        b = np.asarray(DB.deblock_plane(jnp, jnp.asarray(plane),
                                        jnp.asarray(sizes), lvl, lvl, True))
        assert np.array_equal(a, b)
    # blocky content at a real level must actually be smoothed
    out = DB.deblock_plane(np, plane.copy(), sizes, 20, 20, True)
    assert np.count_nonzero(out != plane) > H * W // 8


def test_levels_monotone_with_q():
    l1 = DB.pick_filter_levels(60, is_key=False)
    l2 = DB.pick_filter_levels(200, is_key=False)
    assert l2[0] >= l1[0] >= 0


def test_e2e_deblock_parity():
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.decoder.decode import Decoder
    from svt_av1_tpu.pipeline.encoder import Encoder
    from svt_av1_tpu.io.yuv import Frame, synthetic_frame

    W, H = 128, 96
    base = synthetic_frame(W * 2, H * 2, seed=3)
    frames = [Frame(base.y[t : t + H, 2 * t : 2 * t + W].copy(),
                    base.u[t // 2 : t // 2 + H // 2, t : t + W // 2].copy(),
                    base.v[t // 2 : t // 2 + H // 2, t : t + W // 2].copy())
              for t in range(3)]
    enc = Encoder(EncoderConfig(width=W, height=H, qp=50, intra_period=63,
                                pred_structure=0, enable_deblocking=True))
    for f in frames:
        enc.send_picture(f)
    pkts = [enc.get_packet() for _ in frames]
    dec = Decoder()
    for i, p in enumerate(pkts):
        df = dec.decode_temporal_unit(p.payload)
        assert np.array_equal(df.y, p.recon.y), i
        assert np.array_equal(df.u, p.recon.u), i
        assert np.array_equal(df.v, p.recon.v), i
