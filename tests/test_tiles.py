"""Multi-tile encoding: per-tile contexts, tile-group size fields,
tile-parallel entropy, frame-wide in-loop filters across tile edges.

Ref parity: tile_info uniform spacing (spec 5.9.15), tile_group_obu
(spec 5.11.1), per-tile EC reset (EbEntropyCodingProcess.c tile path).
Intra frames stay single-tile (the wavefront predicts across
boundaries); inter frames tile per the config.
"""

import numpy as np

from svt_av1_tpu import EncoderConfig
from svt_av1_tpu.decoder import Decoder
from svt_av1_tpu.entropy import obu as O
from svt_av1_tpu.io import synthetic_frame
from svt_av1_tpu.pipeline.encoder import Encoder


def test_tile_starts_uniform():
    sp = O.SequenceParams(320, 192)   # 5x3 SBs
    rows, cols = O.tile_starts(sp, 1, 1)
    assert cols == [(0, 48), (48, sp.mi_cols)]
    assert rows == [(0, 32), (32, sp.mi_rows)]
    rows, cols = O.tile_starts(sp, 0, 0)
    assert len(rows) == 1 and len(cols) == 1
    # more tile columns than SB columns collapses cleanly
    sp64 = O.SequenceParams(64, 64)
    rows, cols = O.tile_starts(sp64, 2, 0)
    assert cols == [(0, sp64.mi_cols)]


def test_odd_width_single_tile_bit_exact():
    """Regression: the C++ writer's per-size level strides derive from
    nb8w*8/bs — an odd sliced cell width (854 -> 107 cells) silently
    skewed 16/32 grids until slices were re-aligned to 4-cell multiples."""
    W, H = 854, 128   # odd 8x8-cell count per row (107)
    cfg = EncoderConfig(width=W, height=H, qp=45, intra_period=63,
                        pred_structure=0, scene_change_detection=False)
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
        np.testing.assert_array_equal(d.y, pkt.recon.y)


def test_tiled_inter_e2e_bit_exact():
    W, H = 320, 192
    cfg = EncoderConfig(width=W, height=H, qp=45, intra_period=63,
                        pred_structure=0, tile_columns_log2=1,
                        tile_rows_log2=1, scene_change_detection=False)
    enc, dec = Encoder(cfg), Decoder()
    base = synthetic_frame(W, H, seed=0)
    for i in range(3):
        f = synthetic_frame(W, H, seed=0)
        f.y[:] = np.roll(base.y, (i, 2 * i), (0, 1))
        f.u[:] = np.roll(base.u, (0, i), (0, 1))
        f.v[:] = np.roll(base.v, (0, i), (0, 1))
        enc.send_picture(f)
        pkt = enc.get_packet()
        d = dec.decode_temporal_unit(pkt.payload)
        np.testing.assert_array_equal(d.y, pkt.recon.y)
        np.testing.assert_array_equal(d.u, pkt.recon.u)
        np.testing.assert_array_equal(d.v, pkt.recon.v)
