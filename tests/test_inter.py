"""Inter path tests: convolve parity, MC np/jax equivalence, IPPP e2e."""

import numpy as np
import pytest

from svt_av1_tpu.ops import mc as MC


def _convolve_2d_ref(src_pad: np.ndarray, phase_x: int, phase_y: int
                     ) -> np.ndarray:
    """Direct scalar port of av1_convolve_2d_sr_c / x_sr / y_sr / copy
    (EbInterPrediction.c:131-260) for the aligned full-plane case."""
    H = src_pad.shape[0] - 7
    W = src_pad.shape[1] - 7
    kx = MC.regular_kernel(phase_x)
    ky = MC.regular_kernel(phase_y)
    out = np.zeros((H, W), np.int32)

    def rshift(v, n):
        return (v + (1 << (n - 1))) >> n

    if phase_x == 0 and phase_y == 0:
        return src_pad[3 : 3 + H, 3 : 3 + W].astype(np.int32)
    if phase_y == 0:
        for y in range(H):
            for x in range(W):
                s = sum(kx[k] * int(src_pad[y + 3, x + k]) for k in range(8))
                out[y, x] = np.clip(rshift(rshift(s, 3), 4), 0, 255)
        return out
    if phase_x == 0:
        for y in range(H):
            for x in range(W):
                s = sum(ky[k] * int(src_pad[y + k, x + 3]) for k in range(8))
                out[y, x] = np.clip(rshift(s, 7), 0, 255)
        return out
    im = np.zeros((H + 7, W), np.int64)
    for y in range(H + 7):
        for x in range(W):
            s = (1 << 14) + sum(kx[k] * int(src_pad[y, x + k])
                                for k in range(8))
            im[y, x] = rshift(s, 3)
    for y in range(H):
        for x in range(W):
            s = (1 << 19) + sum(ky[k] * int(im[y + k, x]) for k in range(8))
            r = rshift(s, 11) - ((1 << 7) + (1 << 6))
            out[y, x] = np.clip(r, 0, 255)
    return out


@pytest.mark.parametrize("phase", [(0, 0), (8, 0), (0, 8), (8, 8)])
def test_filter_plane_matches_reference(phase):
    rng = np.random.default_rng(7)
    plane = rng.integers(0, 256, (19, 23), np.int32)
    got = MC.filter_plane(np, plane, *phase)
    want = _convolve_2d_ref(plane, *phase)
    assert np.array_equal(got, want)


def test_filter_plane_jax_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    plane = rng.integers(0, 256, (27, 31), np.int32)
    for phase in ((0, 0), (8, 0), (0, 8), (8, 8)):
        a = MC.filter_plane(np, plane, *phase)
        b = np.asarray(MC.filter_plane(jnp, jnp.asarray(plane), *phase))
        assert np.array_equal(a, b), phase


def _pan_sequence(W, H, n):
    from svt_av1_tpu.io.yuv import Frame, synthetic_frame

    base = synthetic_frame(W * 2, H * 2, seed=3)
    out = []
    for t in range(n):
        dx, dy = 2 * t, t
        out.append(Frame(
            base.y[dy : dy + H, dx : dx + W].copy(),
            base.u[dy // 2 : dy // 2 + H // 2, dx // 2 : dx // 2 + W // 2].copy(),
            base.v[dy // 2 : dy // 2 + H // 2, dx // 2 : dx // 2 + W // 2].copy()))
    return out


def test_ippp_mirror_decode_parity():
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.decoder.decode import Decoder
    from svt_av1_tpu.pipeline.encoder import Encoder

    W, H = 128, 96
    frames = _pan_sequence(W, H, 4)
    enc = Encoder(EncoderConfig(width=W, height=H, qp=40, intra_period=63,
                                pred_structure=0))
    for f in frames:
        enc.send_picture(f)
    pkts = [enc.get_packet() for _ in frames]
    assert pkts[0].is_keyframe and not pkts[1].is_keyframe

    dec = Decoder()
    for i, (p, f) in enumerate(zip(pkts, frames)):
        df = dec.decode_temporal_unit(p.payload)
        for a, b in ((df.y, p.recon.y), (df.u, p.recon.u), (df.v, p.recon.v)):
            assert np.array_equal(a, b), f"recon mismatch at frame {i}"
        mse = ((df.y.astype(np.float64) - f.y) ** 2).mean()
        assert 10 * np.log10(255**2 / max(mse, 1e-9)) > 30


def test_ippp_keyframe_interval():
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.pipeline.encoder import Encoder

    W, H = 64, 64
    frames = _pan_sequence(W, H, 5)
    enc = Encoder(EncoderConfig(width=W, height=H, qp=44, intra_period=1,
                                pred_structure=0))
    for f in frames:
        enc.send_picture(f)
    kinds = [enc.get_packet().is_keyframe for _ in frames]
    assert kinds == [True, False, True, False, True]

    # decodable end-to-end across the key/inter alternation
    from svt_av1_tpu.decoder.decode import Decoder
    enc2 = Encoder(EncoderConfig(width=W, height=H, qp=44, intra_period=1,
                                 pred_structure=0))
    dec = Decoder()
    for f in frames:
        enc2.send_picture(f)
        p = enc2.get_packet()
        df = dec.decode_temporal_unit(p.payload)
        assert np.array_equal(df.y, p.recon.y)


def test_scene_cut_inserts_keyframe():
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.decoder.decode import Decoder
    from svt_av1_tpu.pipeline.encoder import Encoder
    from svt_av1_tpu.io.yuv import synthetic_frame

    W, H = 128, 96
    a = synthetic_frame(W, H, seed=1)
    b = synthetic_frame(W, H, seed=99, kind="noise")  # hard cut
    frames = [a, a, b, b]
    enc = Encoder(EncoderConfig(width=W, height=H, qp=45, intra_period=63,
                                pred_structure=0))
    for f in frames:
        enc.send_picture(f)
    pkts = [enc.get_packet() for _ in frames]
    kinds = [p.is_keyframe for p in pkts]
    assert kinds[0] and not kinds[1] and kinds[2], kinds

    dec = Decoder()
    for i, p in enumerate(pkts):
        df = dec.decode_temporal_unit(p.payload)
        assert np.array_equal(df.y, p.recon.y), i


def test_interp_filter_kernels_match_spec():
    # spec Subpel_Filters half-pel rows (AV1 6.8.9 table values)
    assert MC.kernel(8, 0) == (0, 2, -14, 76, 76, -14, 2, 0)
    assert MC.kernel(8, 1) == (0, -2, 14, 52, 52, 14, -2, 0)
    assert MC.kernel(8, 2) == (-4, 12, -24, 80, 80, -24, 12, -4)
    for filt in (0, 1, 2):
        # phase 0 is the identity for every filter
        assert MC.kernel(0, filt) == (0, 0, 0, 128, 0, 0, 0, 0)
        for ph in range(16):
            assert sum(MC.kernel(ph, filt)) == 128


@pytest.mark.parametrize("filt", [1, 2])
def test_interp_filter_e2e_mirror_decode(filt):
    """Forced SMOOTH/SHARP streams signal the filter in the header and
    mirror-decode bit-exactly (encoder step + decoder banks both use the
    signaled kernels)."""
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.decoder.decode import Decoder
    from svt_av1_tpu.pipeline.encoder import Encoder

    W, H = 128, 96
    frames = _pan_sequence(W, H, 3)
    enc = Encoder(EncoderConfig(width=W, height=H, qp=40, intra_period=63,
                                pred_structure=0, interp_filter=filt))
    for f in frames:
        enc.send_picture(f)
    pkts = [enc.get_packet() for _ in frames]
    dec = Decoder()
    for i, p in enumerate(pkts):
        df = dec.decode_temporal_unit(p.payload)
        for a, b in ((df.y, p.recon.y), (df.u, p.recon.u), (df.v, p.recon.v)):
            assert np.array_equal(a, b), f"filt={filt} mismatch frame {i}"
    # the two non-regular streams must differ from a regular encode of
    # the same frames (the filter is actually applied, not just signaled)
    enc0 = Encoder(EncoderConfig(width=W, height=H, qp=40, intra_period=63,
                                 pred_structure=0, interp_filter=0))
    for f in frames:
        enc0.send_picture(f)
    pk0 = [enc0.get_packet() for _ in frames]
    assert pkts[1].payload != pk0[1].payload


def test_interp_filter_auto_decision():
    from svt_av1_tpu.pipeline.analysis import analyze, pick_interp_filter

    rng = np.random.default_rng(3)
    noisy = rng.integers(0, 255, (96, 128)).astype(np.uint8)
    stats = analyze(noisy)
    assert pick_interp_filter(stats, 160) in (0, 1)
    flat = np.full((96, 128), 128, np.uint8)
    assert pick_interp_filter(analyze(flat), 80) == 0


def test_global_motion_e2e():
    """Panning IPPP stream: GM is estimated open-loop, signaled in the
    header (spec 5.9.24), injected as a GLOBALMV candidate, and the
    stream mirror-decodes bit-exactly while costing fewer P bits than
    the same encode with GM off."""
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.conformance import check_stream
    from svt_av1_tpu.decoder.decode import Decoder
    from svt_av1_tpu.pipeline.encoder import Encoder
    from svt_av1_tpu.entropy import obu as O

    W, H = 256, 128
    base = _pan_sequence(W, H, 1)[0]
    frames = []
    for i in range(4):
        f = _pan_sequence(W, H, 1)[0]
        f.y[:] = np.roll(base.y, (2 * i, 3 * i), (0, 1))
        f.u[:] = np.roll(base.u, (i, i), (0, 1))
        f.v[:] = np.roll(base.v, (i, i), (0, 1))
        frames.append(f)

    def run(gm_on):
        enc = Encoder(EncoderConfig(width=W, height=H, qp=40,
                                    intra_period=63, pred_structure=0,
                                    enable_global_motion=gm_on))
        for f in frames:
            enc.send_picture(f)
        return [enc.get_packet() for _ in frames]

    pk_on = run(True)
    pk_off = run(False)
    dec = Decoder()
    for i, p in enumerate(pk_on):
        df = dec.decode_temporal_unit(p.payload)
        for a, b in ((df.y, p.recon.y), (df.u, p.recon.u),
                     (df.v, p.recon.v)):
            assert np.array_equal(a, b), f"gm mismatch frame {i}"
    check_stream([p.payload for p in pk_on])
    bits_on = sum(len(p.payload) for p in pk_on[1:])
    bits_off = sum(len(p.payload) for p in pk_off[1:])
    assert bits_on < bits_off, (bits_on, bits_off)
