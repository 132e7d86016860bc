"""App-layer units: packed 10-bit input, config-file and qp-file layers
(ref EbAppConfig.c / EbAppProcessCmd.c:759-925)."""

import io

import numpy as np

from svt_av1_tpu.io.yuv import YuvReaderPacked10


def _pack2(plane10):
    """Inverse of YuvReaderPacked10: 10-bit plane -> (msb bytes, packed
    2-bit bytes MSB-first)."""
    msb = (plane10 >> 2).astype(np.uint8)
    lsb = (plane10 & 3).astype(np.uint8)
    h, w = plane10.shape
    l4 = lsb.reshape(h, w // 4, 4)
    packed = (l4[..., 0] << 6) | (l4[..., 1] << 4) | (l4[..., 2] << 2) \
        | l4[..., 3]
    return msb.tobytes(), packed.astype(np.uint8).tobytes()


def test_packed_ten_bit_reader_roundtrip():
    rng = np.random.default_rng(0)
    w, h = 16, 8
    y = rng.integers(0, 1024, (h, w)).astype(np.uint16)
    u = rng.integers(0, 1024, (h // 2, w // 2)).astype(np.uint16)
    v = rng.integers(0, 1024, (h // 2, w // 2)).astype(np.uint16)
    ym, yl = _pack2(y)
    um, ul = _pack2(u)
    vm, vl = _pack2(v)
    blob = ym + um + vm + yl + ul + vl
    rd = YuvReaderPacked10(io.BytesIO(blob * 2), w, h)
    frames = list(rd.frames())
    assert len(frames) == 2
    for f in frames:
        np.testing.assert_array_equal(f.y, y)
        np.testing.assert_array_equal(f.u, u)
        np.testing.assert_array_equal(f.v, v)


def test_config_file_layer(tmp_path):
    from svt_av1_tpu.app.enc_app import build_parser, parse_config_file
    cfg = tmp_path / "enc.cfg"
    cfg.write_text("""
# Sample.cfg style
SourceWidth : 854
SourceHeight : 480   # comment
QP : 37
EncoderMode : 4
IntraPeriod : 15
""")
    vals = parse_config_file(str(cfg))
    assert vals == {"width": 854, "height": 480, "qp": 37, "preset": 4,
                    "intra_period": 15}
    parser = build_parser()
    parser.set_defaults(**vals)
    # CLI flag wins over the file value
    args = parser.parse_args(["-q", "22"])
    assert args.qp == 22 and args.width == 854 and args.preset == 4


def test_qp_file_override():
    """push_qp overrides the per-frame qindex in coding order."""
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.pipeline.encoder import Encoder
    enc = Encoder(EncoderConfig(width=64, height=64, qp=50))
    enc.push_qp(20)
    enc.push_qp(None)
    assert enc._frame_qindex(True) == 80     # 20 * 4
    assert enc._frame_qindex(True) == 200    # falls back to cfg qp 50
