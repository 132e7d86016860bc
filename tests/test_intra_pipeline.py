"""Device wavefront encoder consistency tests.

The strongest invariant: replaying (mode, levels) through the numpy twin
ops in decoder order must reproduce the device recon bit-exactly — this is
what guarantees a conforming decoder sees the encoder's reference frames.
"""

import numpy as np
import pytest

from svt_av1_tpu.io.yuv import synthetic_frame
from svt_av1_tpu.ops import intra
from svt_av1_tpu.ops import quant as Q
from svt_av1_tpu.ops import transforms as T
from svt_av1_tpu.pipeline import intra_encoder as IE


def _replay_plane(levels, modes, qindex, bs, tx_size, luma=False):
    """Reconstruct a plane from (modes, levels) exactly like a decoder."""
    nbh, nbw = levels.shape[:2]
    recon = np.zeros((nbh * bs, nbw * bs), np.int32)
    ar_avail = intra.edge_availability(nbh, nbw)[0] if luma else None
    for r in range(nbh):
        for c in range(nbw):
            ha, hl = r > 0, c > 0
            above = recon[r * bs - 1, c * bs : c * bs + bs] if ha else \
                np.zeros(bs, np.int32)
            left = recon[r * bs : r * bs + bs, c * bs - 1] if hl else \
                np.zeros(bs, np.int32)
            tl = recon[r * bs - 1, c * bs - 1] if (ha and hl) else 0
            above_ext = None
            if luma and ar_avail[r, c]:
                above_ext = recon[r * bs - 1,
                                  c * bs + bs : c * bs + 2 * bs]
            pred = intra.predict_block_np(int(modes[r, c]), above, left,
                                          int(tl), ha, hl, bs, bs,
                                          above_ext=above_ext)
            dq = Q.dequantize_np(levels[r, c], qindex, tx_size)
            resid = T.inv_txfm2d_np(dq, tx_size, T.DCT_DCT)
            recon[r * bs : r * bs + bs, c * bs : c * bs + bs] = np.clip(
                pred + resid, 0, 255)
    return recon


@pytest.mark.parametrize("qindex", [40, 120])
@pytest.mark.parametrize("kind", ["mix", "flat"])
def test_device_recon_matches_numpy_replay(qindex, kind):
    f = synthetic_frame(128, 64, seed=3, kind=kind)
    mi_rows, mi_cols = 2 * ((64 + 7) >> 3), 2 * ((128 + 7) >> 3)
    out = IE.encode_frame_device(f.y, f.u, f.v, qindex, mi_rows, mi_cols)
    ry = _replay_plane(out["levels_y"], out["modes"], qindex, 8, T.TX_8X8,
                       luma=True)
    assert (ry == out["recon_y"]).all()
    dc_modes = np.zeros_like(out["modes"])
    ru = _replay_plane(out["levels_u"], dc_modes, qindex, 4, T.TX_4X4)
    assert (ru == out["recon_u"]).all()
    rv = _replay_plane(out["levels_v"], dc_modes, qindex, 4, T.TX_4X4)
    assert (rv == out["recon_v"]).all()


def test_recon_quality_reasonable():
    """Encoder recon should track the source (sanity PSNR check)."""
    f = synthetic_frame(128, 128, seed=1)
    mi = 2 * ((128 + 7) >> 3)
    out = IE.encode_frame_device(f.y, f.u, f.v, 30, mi, mi)
    err = (out["recon_y"].astype(np.float64) - f.y) ** 2
    psnr = 10 * np.log10(255**2 / max(err.mean(), 1e-9))
    assert psnr > 32, psnr


def test_nonmultiple_dimensions_padding():
    f = synthetic_frame(100, 52, seed=2)  # not multiples of 8
    mi_rows, mi_cols = 2 * ((52 + 7) >> 3), 2 * ((100 + 7) >> 3)
    out = IE.encode_frame_device(f.y, f.u, f.v, 60, mi_rows, mi_cols)
    assert out["recon_y"].shape == (mi_rows * 4, mi_cols * 4)
