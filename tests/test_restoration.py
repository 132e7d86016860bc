"""Loop restoration (luma Wiener): filter math, stripe handling, RU
search, per-SB syntax, and e2e mirror-decode parity.

Ref parity: av1_wiener_convolve_add_src_c (convolve.c:115),
setup_processing_stripe_boundary / save_deblock_boundary_lines
(EbRestoration.c), write_wiener_filter (EbEntropyCoding.c:4444),
search_wiener (EbPickRestoration.c).
"""

import numpy as np

from svt_av1_tpu import EncoderConfig
from svt_av1_tpu.decoder import Decoder
from svt_av1_tpu.io import synthetic_frame
from svt_av1_tpu.ops import restoration as R
from svt_av1_tpu.pipeline.encoder import Encoder


def test_wiener_block_scalar_parity():
    rng = np.random.default_rng(0)
    ext = rng.integers(0, 256, (24, 30)).astype(np.int32)
    th, tv = (2, -5, 11), (1, -3, 9)
    out = R.wiener_block(ext, th, tv)
    kx, ky = R.wiener_kernel(th), R.wiener_kernel(tv)
    im = np.zeros((24, 24), np.int32)
    for y in range(24):
        for x in range(24):
            s = sum(int(kx[i]) * int(ext[y, x + i]) for i in range(7))
            s += (int(ext[y, x + 3]) << 7) + (1 << 14)
            im[y, x] = min(max((s + 4) >> 3, 0), (1 << 13) - 1)
    ref = np.zeros((18, 24), np.int32)
    for y in range(18):
        for x in range(24):
            s = sum(int(ky[i]) * int(im[y + i, x]) for i in range(7))
            s += (int(im[y + 3, x]) << 7) - (1 << 18)
            ref[y, x] = min(max((s + 1024) >> 11, 0), 255)
    np.testing.assert_array_equal(out, ref)


def test_stripe_spans_and_boundaries():
    # luma: first stripe 56 rows, then 64s (offset 8)
    assert R._stripe_spans(160, 0) == [(0, 56), (56, 120), (120, 160)]
    assert R._stripe_spans(40, 0) == [(0, 40)]
    cdef = np.arange(200 * 8).reshape(200, 8).astype(np.int32) % 251
    deb = cdef + 1000
    ext = R._extend_stripe(cdef, deb, 56, 120)
    # above rows: [a0 a0 a1] from DEBLOCKED rows 54, 55
    np.testing.assert_array_equal(ext[0, 3:-3], deb[54])
    np.testing.assert_array_equal(ext[1, 3:-3], deb[54])
    np.testing.assert_array_equal(ext[2, 3:-3], deb[55])
    # below rows: [b0 b1 b1] from deblocked rows 120, 121
    np.testing.assert_array_equal(ext[-3, 3:-3], deb[120])
    np.testing.assert_array_equal(ext[-2, 3:-3], deb[121])
    np.testing.assert_array_equal(ext[-1, 3:-3], deb[121])


def test_wiener_search_denoises():
    rng = np.random.default_rng(1)
    yy, xx = np.mgrid[0:144, 0:192]
    src = (120 + 60 * np.sin(xx / 9.0) * np.cos(yy / 7.0)).astype(np.int32)
    deg = np.clip(src + rng.normal(0, 6, src.shape), 0, 255).astype(
        np.int32)
    use, taps = R.search_wiener_plane(src, deg, deg.copy(), 64, 0)
    assert use.any()
    out = R.apply_wiener_plane(deg, deg.copy(), 64, 0, use, taps)
    assert ((out - src) ** 2).sum() < 0.5 * ((deg - src) ** 2).sum()


def _lr_on_count(dec) -> int:
    if dec.lr is None:
        return 0
    return sum(int(pl["use"].sum()) for pl in dec.lr if pl is not None)


def test_restoration_e2e_bit_exact():
    W, H = 192, 160   # three stripes
    for ip in (-2, 63):
        cfg = EncoderConfig(width=W, height=H, qp=50, intra_period=ip,
                            pred_structure=0, enable_restoration=True,
                            enable_cdef=False,
                            scene_change_detection=False)
        enc, dec = Encoder(cfg), Decoder()
        base = synthetic_frame(W, H, seed=0, kind="noise")
        n_on = 0
        for i in range(2):
            f = synthetic_frame(W, H, seed=0, kind="noise")
            f.y[:] = np.roll(base.y, (i, 2 * i), (0, 1))
            f.u[:] = np.roll(base.u, (0, i), (0, 1))
            f.v[:] = np.roll(base.v, (0, i), (0, 1))
            enc.send_picture(f)
            pkt = enc.get_packet()
            d = dec.decode_temporal_unit(pkt.payload)
            np.testing.assert_array_equal(d.y, pkt.recon.y)
            np.testing.assert_array_equal(d.u, pkt.recon.u)
            np.testing.assert_array_equal(d.v, pkt.recon.v)
            n_on += _lr_on_count(dec)
        assert n_on > 0, "Wiener never engaged on noisy content"


def test_restoration_with_cdef_e2e():
    """LR composes with CDEF: stripe context rows come from the
    DEBLOCKED pre-CDEF planes (spec save_deblock_boundary_lines; ref
    EbCdefProcess.c:545-558) while the filter input is the CDEF output.
    Round-1 forced CDEF off under LR; this covers the composition."""
    W, H = 192, 160
    cfg = EncoderConfig(width=W, height=H, qp=50, intra_period=63,
                        pred_structure=0, enable_restoration=True,
                        enable_cdef=True, scene_change_detection=False)
    assert cfg.enable_cdef
    enc, dec = Encoder(cfg), Decoder()
    base = synthetic_frame(W, H, seed=0, kind="noise")
    n_on = 0
    for i in range(3):
        f = synthetic_frame(W, H, seed=0, kind="noise")
        f.y[:] = np.roll(base.y, (i, 2 * i), (0, 1))
        f.u[:] = np.roll(base.u, (0, i), (0, 1))
        f.v[:] = np.roll(base.v, (0, i), (0, 1))
        enc.send_picture(f)
        pkt = enc.get_packet()
        d = dec.decode_temporal_unit(pkt.payload)
        np.testing.assert_array_equal(d.y, pkt.recon.y)
        np.testing.assert_array_equal(d.u, pkt.recon.u)
        np.testing.assert_array_equal(d.v, pkt.recon.v)
        n_on += _lr_on_count(dec)
    assert n_on > 0


def test_restoration_chroma_planes():
    """Chroma-noisy content engages LR on U/V (32-sample chroma RUs,
    lr_uv_shift=1) and mirror-decodes bit-exactly."""
    rng = np.random.default_rng(7)
    W, H = 192, 160
    f = synthetic_frame(W, H, seed=1)
    f.u[:] = np.clip(f.u.astype(np.int32)
                     + rng.normal(0, 8, f.u.shape), 0, 255).astype(np.uint8)
    f.v[:] = np.clip(f.v.astype(np.int32)
                     + rng.normal(0, 8, f.v.shape), 0, 255).astype(np.uint8)
    enc = Encoder(EncoderConfig(width=W, height=H, qp=30,
                                enable_restoration=True,
                                scene_change_detection=False))
    enc.send_picture(f)
    pkt = enc.get_packet()
    dec = Decoder()
    d = dec.decode_temporal_unit(pkt.payload)
    np.testing.assert_array_equal(d.y, pkt.recon.y)
    np.testing.assert_array_equal(d.u, pkt.recon.u)
    np.testing.assert_array_equal(d.v, pkt.recon.v)
    assert dec.lr is not None
    assert any(pl is not None and pl["use"].any()
               for pl in dec.lr[1:]), "chroma LR never engaged"


def test_restoration_hier_b_e2e():
    """LR on a hierarchical-B mini-GOP: restored frames are the
    references (spec: LR output lands in the ref buffer), every coded
    frame mirror-decodes bit-exactly in display order."""
    from svt_av1_tpu.io.yuv import Frame
    W, H, N = 128, 96, 5
    rng = np.random.default_rng(9)
    base = synthetic_frame(W, H, seed=3, kind="noise")
    cfg = EncoderConfig(width=W, height=H, qp=45, intra_period=-1,
                        pred_structure=2, hierarchical_levels=2,
                        enable_restoration=True, compound_mode=1,
                        scene_change_detection=False)
    enc, dec = Encoder(cfg), Decoder()
    frames = [Frame(np.roll(base.y, (i, 2 * i), (0, 1)),
                    np.roll(base.u, (0, i), (0, 1)),
                    np.roll(base.v, (0, i), (0, 1))) for i in range(N)]
    pkts = list(enc.encode_all(frames))
    shown = []
    for p in pkts:
        f = dec.decode_temporal_unit(p.payload)
        if f is not None:
            shown.append(f)
    assert len(shown) == N
    recs = {p.display_idx: p.recon for p in pkts if p.recon is not None}
    for d in range(N):
        np.testing.assert_array_equal(shown[d].y, recs[d].y,
                                      err_msg=f"frame {d}")
        np.testing.assert_array_equal(shown[d].u, recs[d].u,
                                      err_msg=f"frame {d}")


def test_sgr_search_and_apply_roundtrip():
    """SGR ops: search denoises; apply is shared encoder/decoder."""
    from svt_av1_tpu.ops import restoration as R
    rng = np.random.default_rng(2)
    h, w = 96, 128
    clean = (np.mgrid[0:h, 0:w][0] * 2 + 40).astype(np.int32)
    noisy = np.clip(clean + rng.normal(0, 4, (h, w)), 0,
                    255).astype(np.int32)
    use, ep, xqd, _ = R.search_sgr_plane(clean, noisy, noisy.copy(), 64, 0)
    assert use.any()
    out = R.apply_sgr_plane(noisy, noisy.copy(), 64, 0, use, ep, xqd)
    assert ((out - clean) ** 2).sum() < ((noisy - clean) ** 2).sum()


def test_sgr_e2e_mirror_decode():
    """A noisy keyframe picks SGRPROJ (or Wiener) and mirror-decodes
    bit-exactly, including the per-RU sgr syntax."""
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.decoder import Decoder
    from svt_av1_tpu.pipeline.encoder import Encoder
    rng = np.random.default_rng(4)
    W, H = 192, 128
    f = synthetic_frame(W, H, seed=2)
    f.y[:] = np.clip(f.y.astype(np.int32)
                     + rng.normal(0, 5, f.y.shape), 0, 255).astype(np.uint8)
    enc = Encoder(EncoderConfig(width=W, height=H, qp=30,
                                enable_restoration=True,
                                scene_change_detection=False))
    enc.send_picture(f)
    pkt = enc.get_packet()
    d = Decoder().decode_temporal_unit(pkt.payload)
    np.testing.assert_array_equal(d.y, pkt.recon.y)
    np.testing.assert_array_equal(d.u, pkt.recon.u)


def test_sgr_syntax_roundtrip():
    """code_sgr_filter write/read parity across ep classes (both radii,
    r0-only, r1-only)."""
    from svt_av1_tpu.entropy import syntax as S
    from svt_av1_tpu.entropy.range_coder import RangeDecoder, RangeEncoder
    cases = [(4, (-20, 60)), (11, (0, 40)), (15, (-90, 31)), (0, (31, 95))]
    enc = RangeEncoder()
    ref = list(S.SGR_XQD_MID)
    for ep, xqd in cases:
        _, out = S.code_sgr_filter(enc, None, ref, ep, xqd)
        ref = list(out)
    data = enc.done()
    dec = RangeDecoder(data)
    ref = list(S.SGR_XQD_MID)
    for ep, xqd in cases:
        ep2, got = S.code_sgr_filter(None, dec, ref)
        ref = list(got)
        assert ep2 == ep
        from svt_av1_tpu.ops.restoration import SGR_PARAMS
        r0, r1 = SGR_PARAMS[ep][0], SGR_PARAMS[ep][1]
        if r0 and r1:
            assert got == xqd


def test_restoration_10bit_e2e():
    """10-bit LR: highbd Wiener rounding (offsets 1<<(bd+6)/-(1<<(bd+10)),
    clamp (1<<(bd+5))-1; ref av1_highbd_wiener_convolve_add_src_c,
    convolve.c:145-222) + SGR at bd=10, mirror-decoded bit-exactly."""
    rng = np.random.default_rng(5)
    W, H = 192, 128
    f = synthetic_frame(W, H, seed=4, bit_depth=10)
    f.y[:] = np.clip(f.y.astype(np.int32)
                     + rng.normal(0, 20, f.y.shape), 0, 1023).astype(
                         np.uint16)
    enc = Encoder(EncoderConfig(width=W, height=H, qp=30, bit_depth=10,
                                enable_restoration=True,
                                scene_change_detection=False))
    enc.send_picture(f)
    pkt = enc.get_packet()
    dec = Decoder()
    d = dec.decode_temporal_unit(pkt.payload)
    assert d.y.dtype == np.uint16
    np.testing.assert_array_equal(d.y, pkt.recon.y)
    np.testing.assert_array_equal(d.u, pkt.recon.u)
    np.testing.assert_array_equal(d.v, pkt.recon.v)
    assert _lr_on_count(dec) > 0, "LR never engaged on noisy 10-bit"


def test_restoration_with_tiles():
    """LR with 2x1 tile columns on inter frames: RU syntax is coded by
    the tile whose SB contains the RU start with FRAME-absolute RU
    mapping (spec read_lr MiRow/MiCol are frame coordinates) and
    per-tile tap references (spec decode_tile resets RefLrWiener /
    RefSgrXqd).  ref: tile-parallel EC over LR syntax,
    EbEntropyCoding.c + EbRestorationPick.c."""
    rng = np.random.default_rng(11)
    W, H = 384, 160   # 2 tile columns x 1 row -> 3 luma RUs per tile
    cfg = EncoderConfig(width=W, height=H, qp=50, intra_period=63,
                        pred_structure=0, enable_restoration=True,
                        enable_cdef=False, tile_columns_log2=1,
                        scene_change_detection=False)
    enc, dec = Encoder(cfg), Decoder()
    base = synthetic_frame(W, H, seed=0, kind="noise")
    n_on = 0
    for i in range(3):
        f = synthetic_frame(W, H, seed=0, kind="noise")
        f.y[:] = np.clip(np.roll(base.y, (i, 2 * i), (0, 1)).astype(np.int32)
                         + rng.normal(0, 6, f.y.shape), 0, 255).astype(
                             np.uint8)
        f.u[:] = np.roll(base.u, (0, i), (0, 1))
        f.v[:] = np.roll(base.v, (0, i), (0, 1))
        enc.send_picture(f)
        pkt = enc.get_packet()
        d = dec.decode_temporal_unit(pkt.payload)
        np.testing.assert_array_equal(d.y, pkt.recon.y)
        np.testing.assert_array_equal(d.u, pkt.recon.u)
        np.testing.assert_array_equal(d.v, pkt.recon.v)
        n_on += _lr_on_count(dec)
    assert n_on > 0, "LR never engaged with tiles"
