"""C++ entropy backend must produce byte-identical tiles to Python."""

import numpy as np
import pytest

from svt_av1_tpu.entropy import backend as B
from svt_av1_tpu.entropy.cdf_model import FrameContext
from svt_av1_tpu.pipeline.tile import TileWriter

pytestmark = pytest.mark.skipif(not B.available(), reason="no C++ toolchain")


def _random_frame_data(rng, nbh, nbw, density=0.3, maxlvl=40):
    modes = rng.integers(0, 13, size=(nbh, nbw)).astype(np.uint8)
    # constrain to modes the encoder emits
    modes = np.take(np.array([0, 1, 2, 9, 12]), modes % 5).astype(np.uint8)

    def lv(bs):
        a = rng.integers(-maxlvl, maxlvl + 1, size=(nbh, nbw, bs, bs))
        mask = rng.random((nbh, nbw, bs, bs)) < density
        a = (a * mask).astype(np.int32)
        a[:, :, bs // 2 :, bs // 2 :] = 0
        return a

    ly, lu, lvv = lv(8), lv(4), lv(4)
    # some all-skip blocks
    zero = rng.random((nbh, nbw)) < 0.2
    ly[zero] = 0
    lu[zero] = 0
    lvv[zero] = 0
    return modes, ly, lu, lvv


@pytest.mark.parametrize("mi_rows,mi_cols,qindex", [
    (24, 32, 80), (120, 214, 160), (16, 16, 1), (30, 54, 255)])
def test_cpp_matches_python_bytes(mi_rows, mi_cols, qindex):
    rng = np.random.default_rng(mi_rows + qindex)
    nbh, nbw = mi_rows // 2, mi_cols // 2
    modes, ly, lu, lvv = _random_frame_data(rng, nbh, nbw)

    fc_py = FrameContext(qindex)
    py = TileWriter(fc_py, mi_rows, mi_cols, qindex).encode(modes, ly, lu, lvv)
    fc_cc = FrameContext(qindex)
    cc = B.encode_tile_cpp(fc_cc, mi_rows, mi_cols, qindex, modes, ly, lu, lvv)
    assert cc == py, (len(cc), len(py))


def test_cpp_decodable_by_mirror_decoder():
    """Full e2e through the C++ backend (the production path)."""
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.decoder import Decoder
    from svt_av1_tpu.io.yuv import synthetic_frame
    from svt_av1_tpu.pipeline.encoder import Encoder

    enc = Encoder(EncoderConfig(width=160, height=96, qp=30))
    enc.send_picture(synthetic_frame(160, 96, seed=4))
    pkt = enc.get_packet()
    d = Decoder().decode_temporal_unit(pkt.payload)
    assert (d.y == pkt.recon.y).all()


def test_cpp_inter_tile_byte_identical():
    """C++ inter tile writer == Python TileWriter.encode_inter, byte-exact."""
    import numpy as np
    from svt_av1_tpu.entropy import backend as B
    from svt_av1_tpu.entropy.cdf_model import FrameContext
    from svt_av1_tpu.pipeline.tile import TileWriter

    if not B.available():
        import pytest
        pytest.skip("C++ backend unavailable")
    rng = np.random.default_rng(42)
    mi_rows, mi_cols = 24, 38   # non-multiple-of-16 edge SBs
    nbh, nbw = 12, 19
    for qindex in (20, 120, 255):
        # quarter-pel MVs in 1/8-pel units (even), +-16 pel range
        mv = rng.integers(-64, 65, (nbh, nbw, 2), np.int32) * 2
        ly = np.where(rng.random((nbh, nbw, 8, 8)) < 0.15,
                      rng.integers(-40, 41, (nbh, nbw, 8, 8)), 0).astype(np.int32)
        lu = np.where(rng.random((nbh, nbw, 4, 4)) < 0.1,
                      rng.integers(-9, 10, (nbh, nbw, 4, 4)), 0).astype(np.int32)
        lv = np.where(rng.random((nbh, nbw, 4, 4)) < 0.1,
                      rng.integers(-9, 10, (nbh, nbw, 4, 4)), 0).astype(np.int32)
        mask = rng.random((nbh, nbw)) < 0.4
        ly[mask] = 0
        lu[mask] = 0
        lv[mask] = 0
        tw = TileWriter(FrameContext(qindex), mi_rows, mi_cols, qindex)
        py = tw.encode_inter(mv, ly, lu, lv)
        cpp = B.encode_tile_inter_cpp(FrameContext(qindex), mi_rows, mi_cols,
                                      qindex, mv, ly, lu, lv)
        assert py == cpp
