"""CDEF tests: scalar-reference parity, np/jax equality, e2e."""

import numpy as np

from svt_av1_tpu.ops import cdef as C


def test_find_dir_matches_scalar_reference():
    rng = np.random.default_rng(0)

    def ref_find_dir(img):
        cost = [0] * 8
        partial = [[0] * 15 for _ in range(8)]
        div = [0, 840, 420, 280, 210, 168, 140, 120, 105]
        for i in range(8):
            for j in range(8):
                x = int(img[i, j]) - 128
                partial[0][i + j] += x
                partial[1][i + j // 2] += x
                partial[2][i] += x
                partial[3][3 + i - j // 2] += x
                partial[4][7 + i - j] += x
                partial[5][3 - i // 2 + j] += x
                partial[6][j] += x
                partial[7][i // 2 + j] += x
        for i in range(8):
            cost[2] += partial[2][i] ** 2
            cost[6] += partial[6][i] ** 2
        cost[2] *= div[8]
        cost[6] *= div[8]
        for i in range(7):
            cost[0] += (partial[0][i] ** 2 + partial[0][14 - i] ** 2) * div[i + 1]
            cost[4] += (partial[4][i] ** 2 + partial[4][14 - i] ** 2) * div[i + 1]
        cost[0] += partial[0][7] ** 2 * div[8]
        cost[4] += partial[4][7] ** 2 * div[8]
        for i in (1, 3, 5, 7):
            for j in range(5):
                cost[i] += partial[i][3 + j] ** 2
            cost[i] *= div[8]
            for j in range(3):
                cost[i] += (partial[i][j] ** 2 + partial[i][10 - j] ** 2) * div[2 * j + 2]
        bc, bd = 0, 0
        for i in range(8):
            if cost[i] > bc:
                bc, bd = cost[i], i
        return bd, (bc - cost[(bd + 4) & 7]) >> 10

    plane = rng.integers(0, 256, (24, 32), np.int32)
    d, v = C.find_dir_grid(np, plane)
    for r in range(3):
        for c in range(4):
            rd, rv = ref_find_dir(plane[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8])
            assert d[r, c] == rd and v[r, c] == rv


def test_cdef_frame_np_jax_equal():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    y = rng.integers(0, 256, (64, 128), np.int32)
    u = rng.integers(0, 256, (32, 64), np.int32)
    v = rng.integers(0, 256, (32, 64), np.int32)
    skip8 = rng.random((8, 16)) < 0.3
    idx = rng.integers(0, 4, (1, 2)).astype(np.int32)
    a = C.cdef_frame(np, (y, u, v), skip8, idx, 5)
    b = C.cdef_frame(jnp, tuple(jnp.asarray(p) for p in (y, u, v)),
                     jnp.asarray(skip8), jnp.asarray(idx), 5)
    for x, yy in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(yy))


def test_e2e_cdef_parity():
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
    enc = Encoder(EncoderConfig(width=W, height=H, qp=52, intra_period=63,
                                pred_structure=0, enable_cdef=True))
    for f in frames:
        enc.send_picture(f)
    pkts = [enc.get_packet() for _ in frames]
    dec = Decoder()
    for i, p in enumerate(pkts):
        df = dec.decode_temporal_unit(p.payload)
        assert np.array_equal(df.y, p.recon.y), i
        assert np.array_equal(df.u, p.recon.u), i
        assert np.array_equal(df.v, p.recon.v), i
