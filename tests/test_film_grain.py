"""Film grain synthesis (spec 7.18.3; ref grainSynthesis.c): header
round-trip, LFSR/AR determinism, and decoder-output parity against the
shared apply function (grain is output-only — coding recon stays clean).
"""

import numpy as np

from svt_av1_tpu import EncoderConfig
from svt_av1_tpu.decoder import Decoder
from svt_av1_tpu.entropy import obu as O
from svt_av1_tpu.io import synthetic_frame
from svt_av1_tpu.ops.film_grain import (FilmGrainParams, apply_grain,
                                        preset_params, _gen_grain, _Lfsr)
from svt_av1_tpu.pipeline.encoder import Encoder
from svt_av1_tpu.utils.bits import BitReader, BitWriter


def test_lfsr_sequence():
    r = _Lfsr(0x1234)
    seq = [r.bits(11) for _ in range(4)]
    assert all(0 <= v < 2048 for v in seq)
    r2 = _Lfsr(0x1234)
    assert [r2.bits(11) for _ in range(4)] == seq   # deterministic


def test_grain_template_deterministic_and_bounded():
    p = preset_params(10)
    ly, cb, cr = _gen_grain(p)
    ly2, cb2, cr2 = _gen_grain(p)
    np.testing.assert_array_equal(ly, ly2)
    assert ly.shape == (73, 82) and cb.shape == (38, 44)
    assert ly.min() >= -128 and ly.max() <= 127
    assert np.abs(ly).sum() > 0 and np.abs(cb).sum() > 0


def test_grain_params_header_roundtrip():
    g = preset_params(12, seed=0xBEEF)
    fp = O.FrameParams(base_q_idx=100, film_grain=g)
    sp = O.SequenceParams(128, 96, film_grain_present=True)
    w = O.write_frame_header_bits(sp, fp)
    w.byte_align()
    got = O.parse_frame_header_bits(BitReader(w.data()), sp)
    g2 = got.film_grain
    for f in ("random_seed", "num_y_points", "scaling_points_y",
              "scaling_shift", "ar_coeff_lag", "ar_coeffs_y",
              "ar_coeffs_cb", "ar_coeffs_cr", "ar_coeff_shift",
              "cb_mult", "cr_offset", "overlap_flag"):
        assert getattr(g2, f) == getattr(g, f), f


def test_film_grain_e2e_output_parity():
    W, H = 192, 128
    cfg = EncoderConfig(width=W, height=H, qp=45, intra_period=63,
                        pred_structure=0, enable_film_grain=8,
                        scene_change_detection=False)
    enc, dec = Encoder(cfg), Decoder()
    base = synthetic_frame(W, H, seed=0)
    for i in range(2):
        f = synthetic_frame(W, H, seed=0)
        f.y[:] = np.roll(base.y, (i, 2 * i), (0, 1))
        f.u[:] = np.roll(base.u, (0, i), (0, 1))
        f.v[:] = np.roll(base.v, (0, i), (0, 1))
        enc.send_picture(f)
        pkt = enc.get_packet()
        d = dec.decode_temporal_unit(pkt.payload)
        gy, gu, gv = apply_grain(enc._grain_for(i), pkt.recon.y, pkt.recon.u,
                                 pkt.recon.v)
        np.testing.assert_array_equal(d.y, gy)
        np.testing.assert_array_equal(d.u, gu)
        np.testing.assert_array_equal(d.v, gv)
        assert np.abs(d.y.astype(int)
                      - pkt.recon.y.astype(int)).mean() > 0.1


def test_film_grain_auto_estimation():
    """enable_film_grain=-1 estimates grain from the source: a noisy
    source gets synthesis params, a clean one none (ref noise_model.c
    flat-block fit)."""
    from svt_av1_tpu.ops.film_grain import estimate_params
    rng = np.random.default_rng(3)
    clean = np.full((192, 192), 90, np.uint8)
    noisy = np.clip(clean + rng.normal(0, 5, clean.shape), 0,
                    255).astype(np.uint8)
    assert not estimate_params(clean).apply_grain
    p = estimate_params(noisy)
    assert p.apply_grain and p.num_y_points >= 1

    cfg = EncoderConfig(width=192, height=128, qp=45, intra_period=63,
                        pred_structure=0, enable_film_grain=-1,
                        scene_change_detection=False)
    enc, dec = Encoder(cfg), Decoder()
    f = synthetic_frame(192, 128, seed=1, kind="noise")
    enc.send_picture(f)
    pkt = enc.get_packet()
    assert enc._grain is not None
    d = dec.decode_temporal_unit(pkt.payload)
    assert d is not None


def test_noise_overlap_blend_bands():
    """Overlap blending (spec 7.18.3.9/10) touches exactly the 2-col /
    2-row luma bands at 32-pixel block seams and nothing else."""
    import dataclasses

    from svt_av1_tpu.ops.film_grain import _noise_planes, preset_params
    p0 = dataclasses.replace(preset_params(10), overlap_flag=False)
    p1 = dataclasses.replace(preset_params(10), overlap_flag=True)
    n0 = _noise_planes(p0, 96, 96)[0]
    n1 = _noise_planes(p1, 96, 96)[0]
    diff = n0 != n1
    band = np.zeros_like(diff)
    for b in (32, 64):
        band[:, b : b + 2] = True
        band[b : b + 2, :] = True
    assert not diff[~band].any(), "overlap changed non-boundary noise"
    assert diff.any(), "overlap had no effect at seams"


def test_film_grain_10bit_e2e():
    """Grain synthesis at bit_depth=10: widened grain range
    (gss = 12 - bd), scale_lut 2-bit Round2 interpolation (spec
    7.18.3.5), <<2 chroma offsets, 10-bit clips; decoder output equals
    apply_grain over the coded recon (ref grainSynthesis.c highbd
    paths)."""
    W, H = 192, 128
    cfg = EncoderConfig(width=W, height=H, qp=45, intra_period=63,
                        pred_structure=0, enable_film_grain=8,
                        bit_depth=10, scene_change_detection=False)
    enc, dec = Encoder(cfg), Decoder()
    base = synthetic_frame(W, H, seed=0, bit_depth=10)
    for i in range(2):
        f = synthetic_frame(W, H, seed=0, bit_depth=10)
        f.y[:] = np.roll(base.y, (i, 2 * i), (0, 1))
        f.u[:] = np.roll(base.u, (0, i), (0, 1))
        f.v[:] = np.roll(base.v, (0, i), (0, 1))
        enc.send_picture(f)
        pkt = enc.get_packet()
        d = dec.decode_temporal_unit(pkt.payload)
        gy, gu, gv = apply_grain(enc._grain_for(i), pkt.recon.y,
                                 pkt.recon.u, pkt.recon.v, bit_depth=10)
        assert d.y.dtype == np.uint16
        assert d.y.max() > 255   # genuinely 10-bit samples
        np.testing.assert_array_equal(d.y, gy)
        np.testing.assert_array_equal(d.u, gu)
        np.testing.assert_array_equal(d.v, gv)
        assert np.abs(d.y.astype(int)
                      - pkt.recon.y.astype(int)).mean() > 0.1
