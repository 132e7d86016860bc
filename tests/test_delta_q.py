"""Per-superblock delta-q AQ (spec 5.9.17 / read_delta_qindex).

Hier-B frames with enable_adaptive_quantization code an absolute per-SB
qindex map as spec delta_q syntax: the device quantizes each SB's
residuals with its own qindex, the entropy stage codes the per-SB
deltas (after the cdef index, skipping SB-sized skip blocks), and the
decoder tracks CurrentQIndex for dequant.  ref analog: per-SB QP from
the source-based classifiers (EbSourceBasedOperationsProcess.c:89-703).
"""

import numpy as np

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.decoder import Decoder
from svt_av1_tpu.io.yuv import synthetic_frame
from svt_av1_tpu.pipeline.encoder import Encoder

W, H = 192, 128


def _mixed_clip(n):
    """Half flat / half busy frames: the variance map is strongly
    bimodal, so the AQ map carries real nonzero deltas."""
    rng = np.random.default_rng(7)
    base = synthetic_frame(W, H, seed=3)
    base.y[:, : W // 2] = 64          # flat left half
    base.y[:, W // 2:] = rng.integers(0, 256, (H, W - W // 2))
    out = []
    for i in range(n):
        f = synthetic_frame(W, H, seed=3)
        f.y[:] = np.roll(base.y, (i, 2 * i), (0, 1))
        out.append(f)
    return out


def test_delta_q_hier_bit_exact_and_signaled():
    frames = _mixed_clip(9)
    enc = Encoder(EncoderConfig(width=W, height=H, qp=40, intra_period=-1,
                                pred_structure=2, hierarchical_levels=2,
                                enable_adaptive_quantization=2,
                                scene_change_detection=False))
    for f in frames:
        enc.send_picture(f)
    enc.flush()
    dec = Decoder()
    shown, recons = [], {}
    saw_delta_q = False
    while True:
        pkt = enc.get_packet()
        if pkt is None:
            break
        out = dec.decode_temporal_unit(pkt.payload)
        if getattr(dec, "fp", None) is not None and dec.fp.delta_q_res:
            saw_delta_q = True
        if out is not None:
            shown.append(out)
        if pkt.recon is not None:
            recons[pkt.display_idx] = pkt.recon
    assert saw_delta_q, "no frame signaled delta_q_present"
    assert len(shown) == 9
    for i, fr in enumerate(shown):
        r = recons[i]
        assert (fr.y == r.y).all(), f"frame {i} luma mismatch"
        assert (fr.u == r.u).all() and (fr.v == r.v).all(), i


def test_delta_q_syntax_roundtrip():
    """code_delta_q write/read pairs across the abs encoding ranges
    (small symbols, the golomb-style >3 escape, signs)."""
    from svt_av1_tpu.entropy.cdf_model import FrameContext
    from svt_av1_tpu.entropy.range_coder import RangeDecoder, RangeEncoder
    from svt_av1_tpu.entropy import syntax as S

    vals = [0, 1, -1, 2, 3, -3, 4, -4, 5, 7, 8, 15, -16, 31, -40, 63]
    fc_e = FrameContext(100)
    enc = RangeEncoder()
    for v in vals:
        S.code_delta_q(enc, None, fc_e, v)
    data = enc.done()
    fc_d = FrameContext(100)
    dec = RangeDecoder(data)
    got = [S.code_delta_q(None, dec, fc_d) for _ in vals]
    assert got == vals, got


def test_content_classifiers_protect_skin_dark_grass():
    """Grass/skin/dark SBs (ref EbSourceBasedOperationsProcess.c:394-470
    mean windows) get a finer qindex in the AQ map than equally-flat
    neutral SBs."""
    import numpy as np

    from svt_av1_tpu.pipeline.analysis import analyze, aq_sb_qmap

    h = w = 256                      # 4x4 SBs
    rng = np.random.default_rng(3)
    y = np.full((h, w), 160, np.uint8)
    u = np.full((h // 2, w // 2), 128, np.uint8)
    v = np.full((h // 2, w // 2), 128, np.uint8)
    # equal mild texture everywhere so variance masking is uniform
    t = rng.integers(-6, 7, (h, w))
    y = np.clip(y.astype(np.int32) + t, 0, 255).astype(np.uint8)
    # SB (0,0): skin tones; SB (1,1): dark; SB (2,2): grass
    y[0:64, 0:64] = np.clip(100 + t[0:64, 0:64], 0, 255)
    u[0:32, 0:32] = 110
    v[0:32, 0:32] = 150
    y[64:128, 64:128] = np.clip(30 + t[64:128, 64:128], 0, 255)
    y[128:192, 128:192] = np.clip(100 + t[128:192, 128:192], 0, 255)
    u[64:96, 64:96] = 100
    v[64:96, 64:96] = 120

    st = analyze(y, u, v)
    assert st.protect_sb is not None
    assert st.protect_sb[0, 0] and st.protect_sb[1, 1] \
        and st.protect_sb[2, 2]
    assert not st.protect_sb[3, 3]
    import dataclasses
    qm = aq_sb_qmap(st, 120, res=2)
    qm0 = aq_sb_qmap(dataclasses.replace(st, protect_sb=None), 120,
                     res=2)
    # protected SBs are coded at least one delta-q step finer than the
    # same content without the classifier; neutral SBs are untouched
    assert qm[0, 0] < qm0[0, 0]
    assert qm[1, 1] < qm0[1, 1]
    assert qm[2, 2] < qm0[2, 2]
    assert qm[3, 3] == qm0[3, 3]

    # luma-only analysis keeps the classifier off (no chroma evidence)
    st2 = analyze(y)
    assert st2.protect_sb is None
