"""Rich intra mode decision (presets <= 5): angle deltas +-1..3 on the
directional bases and a DC/V/H/SMOOTH chroma pick with the DERIVED
chroma tx types (VERDICT round-1 item 6)."""

import numpy as np

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.decoder import Decoder
from svt_av1_tpu.io.yuv import synthetic_frame
from svt_av1_tpu.pipeline.encoder import Encoder

W, H = 192, 128


def _diag_frame():
    """Strongly diagonal content so off-base angles win somewhere."""
    f = synthetic_frame(W, H, seed=8)
    yy, xx = np.mgrid[0:H, 0:W]
    f.y[:] = ((xx * 13 + yy * 29) // 7 % 220).astype(np.uint8)
    f.u[:] = ((np.mgrid[0:H // 2, 0:W // 2][1] * 5) % 200).astype(np.uint8)
    return f


def _run(backend):
    enc = Encoder(EncoderConfig(width=W, height=H, qp=38, enc_mode=4,
                                entropy_backend=backend,
                                scene_change_detection=False))
    enc.send_picture(_diag_frame())
    pkt = enc.get_packet()
    d = Decoder().decode_temporal_unit(pkt.payload)
    np.testing.assert_array_equal(d.y, pkt.recon.y)
    np.testing.assert_array_equal(d.u, pkt.recon.u)
    np.testing.assert_array_equal(d.v, pkt.recon.v)
    return pkt.payload


def test_rich_intra_parity_and_backend_equality():
    py = _run("python")
    cpp = _run("cpp")
    assert py == cpp      # byte-identical C++/Python entropy backends


def test_rich_intra_actually_uses_new_tools():
    from svt_av1_tpu.pipeline import intra_encoder as IE
    out, nbh, nbw = IE.dispatch_frame_device(
        _diag_frame().y, _diag_frame().u, _diag_frame().v, 120,
        H // 4, W // 4, rich=True)
    dev = IE.materialize_frame(out, nbh, nbw)
    assert dev["angles"] is not None
    assert (dev["angles"] != 0).any(), "no angle delta ever chosen"
    assert (dev["uv_modes"] != 0).any(), "chroma never left DC"


def test_rich_intra_beats_base_modes():
    """On diagonal content the wider candidate set must not lose
    quality at equal q (it strictly widens the argmin set)."""
    f = _diag_frame()
    outs = {}
    for mode, rich in (("base", 8), ("rich", 4)):
        enc = Encoder(EncoderConfig(width=W, height=H, qp=38,
                                    enc_mode=rich, stat_report=True,
                                    scene_change_detection=False))
        enc.send_picture(f)
        pkt = enc.get_packet()
        outs[mode] = pkt.psnr[0]
    assert outs["rich"] >= outs["base"] - 1e-6, outs


def test_cfl_chroma_from_luma_e2e():
    """CFL (spec 7.11.5): on luma-correlated chroma the wavefront picks
    UV_CFL_PRED with nonzero alphas, the alphas survive the joint-sign
    syntax in both backends, and the stream mirror-decodes bit-exactly."""
    import numpy as np
    from svt_av1_tpu.decoder.decode import Decoder
    from svt_av1_tpu.io import synthetic_frame

    f = synthetic_frame(W, H, seed=3)
    f.u[:] = (f.y[::2, ::2] // 2 + 60).astype(f.u.dtype)
    f.v[:] = ((255 - f.y[::2, ::2]) // 2).astype(f.v.dtype)
    enc = Encoder(EncoderConfig(width=W, height=H, qp=40, enc_mode=4,
                                scene_change_detection=False))
    enc.send_picture(f)
    pkt = enc.get_packet()
    df = Decoder().decode_temporal_unit(pkt.payload)
    for a, b in ((df.y, pkt.recon.y), (df.u, pkt.recon.u),
                 (df.v, pkt.recon.v)):
        assert np.array_equal(a, b)
    # CFL must actually fire on this content
    import svt_av1_tpu.pipeline.intra_encoder as IE
    out, nbh, nbw = IE.dispatch_frame_device(
        f.y, f.u, f.v, 160, H // 4, W // 4, rich=True)
    dev = IE.materialize_frame(out, nbh, nbw)
    assert (dev["uv_modes"] == IE.UV_CFL_ID).any(), "CFL never chosen"
    picked = dev["cfl"][dev["uv_modes"] == IE.UV_CFL_ID]
    assert (picked != 0).any(), "CFL chosen only with zero alphas"
