"""Auxiliary subsystems (SURVEY §5): checkpoint/resume, elastic per-GOP
retry, stage tracing."""

import numpy as np

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.io.yuv import synthetic_frame
from svt_av1_tpu.parallel import GopShardedEncoder, gop_mesh
from svt_av1_tpu.pipeline.encoder import Encoder

W, H = 128, 96


def _clip(n, seed=4):
    base = synthetic_frame(W, H, seed=seed)
    out = []
    for i in range(n):
        f = synthetic_frame(W, H, seed=seed)
        f.y[:] = np.roll(base.y, (i, 2 * i), (0, 1))
        out.append(f)
    return out


def _cfg():
    return EncoderConfig(width=W, height=H, qp=40, intra_period=3,
                         pred_structure=0, scene_change_detection=False)


def test_checkpoint_resume_bit_identical():
    """Resume at a GOP boundary reproduces the uninterrupted stream."""
    frames = _clip(8)
    ref = [p.payload for p in Encoder(_cfg()).encode_all(frames)]

    enc1 = Encoder(_cfg())
    got = [p.payload for p in enc1.encode_all(frames[:4])]
    st = enc1.checkpoint()
    enc2 = Encoder(_cfg())        # fresh process stand-in
    enc2.restore(st)
    got += [p.payload for p in enc2.encode_all(frames[4:])]
    assert got == ref


def test_checkpoint_midgop_stays_decodable():
    """A mid-GOP resume restarts with a keyframe (elastic recovery)."""
    from svt_av1_tpu.decoder import Decoder
    frames = _clip(6)
    enc1 = Encoder(_cfg())
    pkts = [p for p in enc1.encode_all(frames[:3])]
    st = enc1.checkpoint()        # mid-GOP (intra_period=3)
    enc2 = Encoder(_cfg())
    enc2.restore(st)
    pkts += [p for p in enc2.encode_all(frames[3:])]
    dec = Decoder()
    for p in pkts:
        out = dec.decode_temporal_unit(p.payload)
        np.testing.assert_array_equal(out.y, p.recon.y)
    assert pkts[3].is_keyframe     # the resume point restarted intra


def test_gop_retry_recovers(monkeypatch):
    """One super-GOP failure re-encodes on a fresh lockstep encoder."""
    frames = _clip(8)
    enc = GopShardedEncoder(_cfg(), 2, 4, mesh=gop_mesh(2))
    orig = enc._encode_chunks
    state = {"fails": 1}

    def flaky(chunks):
        if state["fails"]:
            state["fails"] -= 1
            raise RuntimeError("injected device loss")
        return orig(chunks)

    monkeypatch.setattr(enc, "_encode_chunks", flaky)
    pkts = list(enc.encode_all(frames))
    assert len(pkts) == 8
    ref = [p.payload for p in
           GopShardedEncoder(_cfg(), 2, 4,
                             mesh=gop_mesh(2)).encode_all(frames)]
    assert [p.payload for p in pkts] == ref


def test_tracer_records_stages(tmp_path):
    from svt_av1_tpu.utils.trace import Tracer
    enc = Encoder(_cfg())
    enc._tracer = Tracer()
    for p in enc.encode_all(_clip(2)):
        pass
    summ = enc._tracer.summary()
    assert "dispatch" in summ and "entropy+packetize" in summ
    out = tmp_path / "trace.json"
    enc._tracer.dump(str(out))
    import json
    ev = json.loads(out.read_text())["traceEvents"]
    assert any(e["name"] == "fetch" for e in ev)


def test_picture_analysis_stats():
    from svt_av1_tpu.pipeline.analysis import analyze, aq_frame_offset
    flat = synthetic_frame(W, H, seed=0, kind="flat")
    busy = synthetic_frame(W, H, seed=0, kind="noise")
    sa, sb = analyze(flat.y), analyze(busy.y)
    assert sa.variance < sb.variance
    assert sa.pyr4.shape == (H // 4, W // 4)
    assert sa.pyr16.shape == (H // 16, W // 16)
    assert sa.hist.sum() == W * H
    assert sa.noise < sb.noise
    # variance masking: busy content gets a HIGHER (cheaper) q offset
    assert aq_frame_offset(sa) < aq_frame_offset(sb)


def test_adaptive_quantization_e2e():
    """AQ on: flat frames get lower q (more bits/quality) than busy
    frames at the same configured qp; streams stay decodable."""
    from svt_av1_tpu.decoder import Decoder
    cfg = EncoderConfig(width=W, height=H, qp=40, intra_period=-1,
                        pred_structure=0, scene_change_detection=False,
                        enable_adaptive_quantization=True)
    enc = Encoder(cfg)
    dec = Decoder()
    frames = [synthetic_frame(W, H, seed=0, kind="flat"),
              synthetic_frame(W, H, seed=1, kind="noise")]
    for pkt in enc.encode_all(frames):
        out = dec.decode_temporal_unit(pkt.payload)
        np.testing.assert_array_equal(out.y, pkt.recon.y)
