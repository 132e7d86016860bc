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
    cells_h, cells_w = mi_rows // 2, mi_cols // 2
    # device-padded grid (32-multiples)
    gh, gw = 12, 20

    def rand_levels(n, bs, density, hi):
        a = np.where(rng.random((n[0], n[1], bs, bs)) < density,
                     rng.integers(-hi, hi + 1, (n[0], n[1], bs, bs)),
                     0).astype(np.int32)
        mask = rng.random(n[:2]) < 0.4
        a[mask] = 0
        return a

    for qindex in (20, 120, 255):
        # random legal quadtree size map (merged nodes fully inside)
        use32 = rng.random((gh // 4, gw // 4)) < 0.3
        use16 = rng.random((gh // 2, gw // 2)) < 0.4
        for r in range(gh // 4):
            for c in range(gw // 4):
                if r * 4 + 4 > cells_h or c * 4 + 4 > cells_w:
                    use32[r, c] = False
        for r in range(gh // 2):
            for c in range(gw // 2):
                if r * 2 + 2 > cells_h or c * 2 + 2 > cells_w:
                    use16[r, c] = False
        up2 = lambda a: np.repeat(np.repeat(a, 2, 0), 2, 1)
        sizes = np.where(up2(up2(use32)), 32,
                         np.where(up2(use16), 16, 8)).astype(np.uint8)
        mv = (rng.integers(-64, 65, (gh, gw, 2), np.int32) * 2)
        levels = {
            8: (rand_levels((gh, gw), 8, 0.15, 40),
                rand_levels((gh, gw), 4, 0.1, 9),
                rand_levels((gh, gw), 4, 0.1, 9)),
            16: (rand_levels((gh // 2, gw // 2), 16, 0.08, 40),
                 rand_levels((gh // 2, gw // 2), 8, 0.08, 9),
                 rand_levels((gh // 2, gw // 2), 8, 0.08, 9)),
            32: (rand_levels((gh // 4, gw // 4), 32, 0.04, 40),
                 rand_levels((gh // 4, gw // 4), 16, 0.04, 9),
                 rand_levels((gh // 4, gw // 4), 16, 0.04, 9)),
        }
        tw = TileWriter(FrameContext(qindex), mi_rows, mi_cols, qindex)
        py = tw.encode_inter(sizes, mv, levels)
        cpp = B.encode_tile_inter_cpp(FrameContext(qindex), mi_rows, mi_cols,
                                      qindex, sizes, mv, levels)
        assert py == cpp

        # per-cell refs (hier-B: mixed LAST/ALTREF single-ref blocks),
        # with the backward ref sign-biased (MV flips in the relaxed
        # ref-MV-stack extension must match bit-for-bit)
        refs = np.where(rng.random((gh, gw)) < 0.5, 1, 7).astype(np.uint8)
        bias = (0, 0, 0, 0, 0, 0, 0, 1)
        tw2 = TileWriter(FrameContext(qindex), mi_rows, mi_cols, qindex)
        py2 = tw2.encode_inter(sizes, mv, levels, refs=refs,
                               sign_bias=bias)
        cpp2 = B.encode_tile_inter_cpp(FrameContext(qindex), mi_rows,
                                       mi_cols, qindex, sizes, mv, levels,
                                       refs=refs, sign_bias=bias)
        assert py2 == cpp2
        assert py2 != py

        # compound cells (refs value 0): NEW_NEWMV/NEAREST_NEARESTMV with
        # a second MV field and BIDIR pair (LAST, ALTREF)
        refs3 = refs.copy()
        refs3[rng.random((gh, gw)) < 0.4] = 0
        mv2 = (rng.integers(-64, 65, (gh, gw, 2), np.int32) * 2)
        tw3 = TileWriter(FrameContext(qindex), mi_rows, mi_cols, qindex)
        py3 = tw3.encode_inter(sizes, mv, levels, refs=refs3,
                               sign_bias=bias, comp_pair=(1, 7), mvs2=mv2)
        cpp3 = B.encode_tile_inter_cpp(FrameContext(qindex), mi_rows,
                                       mi_cols, qindex, sizes, mv, levels,
                                       refs=refs3, sign_bias=bias,
                                       mvs2=mv2, comp_pair=(1, 7))
        assert py3 == cpp3

        # global motion: half the blocks carry the frame's translation
        # (exercises GLOBALMV vs NEARESTMV precedence + gmv stack
        # padding identically in both writers)
        gm = {1: (16, -24)}
        mv4 = mv.copy()
        mv4[rng.random((gh, gw)) < 0.5] = gm[1]
        tw4 = TileWriter(FrameContext(qindex), mi_rows, mi_cols, qindex)
        py4 = tw4.encode_inter(sizes, mv4, levels, gm=gm)
        cpp4 = B.encode_tile_inter_cpp(FrameContext(qindex), mi_rows,
                                       mi_cols, qindex, sizes, mv4,
                                       levels, gm=gm)
        assert py4 == cpp4
        # with gm absent the same MV field must cost more bits
        tw5 = TileWriter(FrameContext(qindex), mi_rows, mi_cols, qindex)
        py5 = tw5.encode_inter(sizes, mv4, levels)
        assert len(py4) <= len(py5)
