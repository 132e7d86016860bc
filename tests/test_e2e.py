"""End-to-end: encode -> IVF -> mirror-decode -> bit-exact recon parity.

Mirrors the reference's e2e strategy (SvtAv1E2EFramework: encode, decode
with a reference decoder, compare recon; SURVEY.md §4.3) with this repo's
own decoder standing in for libaom (not present in this environment).
"""

import io

import numpy as np
import pytest

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.decoder import Decoder
from svt_av1_tpu.io.ivf import IvfReader, IvfWriter
from svt_av1_tpu.io.yuv import synthetic_frame
from svt_av1_tpu.pipeline.encoder import Encoder


def _roundtrip(width, height, qp, nframes=2, kind="mix"):
    cfg = EncoderConfig(width=width, height=height, qp=qp, stat_report=True)
    enc = Encoder(cfg)
    dec = Decoder()
    results = []
    for i in range(nframes):
        src = synthetic_frame(width, height, seed=i, kind=kind)
        enc.send_picture(src)
        pkt = enc.get_packet()
        decoded = dec.decode_temporal_unit(pkt.payload)
        results.append((src, pkt, decoded))
    return results


@pytest.mark.parametrize("qp", [20, 45, 60])
def test_encode_decode_bitexact_recon(qp):
    for src, pkt, decoded in _roundtrip(128, 96, qp):
        assert (decoded.y == pkt.recon.y).all(), "luma recon mismatch"
        assert (decoded.u == pkt.recon.u).all(), "cb recon mismatch"
        assert (decoded.v == pkt.recon.v).all(), "cr recon mismatch"


def test_quality_and_size_sane():
    res = _roundtrip(192, 128, 24, nframes=1)
    src, pkt, decoded = res[0]
    y_psnr = pkt.psnr[0]
    assert y_psnr > 33, f"y psnr {y_psnr}"
    # compressed below raw size
    raw = 192 * 128 * 3 // 2
    assert len(pkt.payload) < raw


def test_nonmultiple_of_8_dimensions():
    for src, pkt, decoded in _roundtrip(100, 72, 40, nframes=1):
        assert decoded.y.shape == (72, 100)
        assert (decoded.y == pkt.recon.y).all()
        assert (decoded.u == pkt.recon.u).all()


def test_higher_qp_smaller_stream():
    lo = _roundtrip(128, 96, 16, nframes=1)[0][1]
    hi = _roundtrip(128, 96, 60, nframes=1)[0][1]
    assert len(hi.payload) < len(lo.payload)


def test_ivf_container_roundtrip(tmp_path):
    cfg = EncoderConfig(width=128, height=96, qp=40)
    enc = Encoder(cfg)
    buf = io.BytesIO()
    w = IvfWriter(buf, 128, 96)
    for i in range(3):
        enc.send_picture(synthetic_frame(128, 96, seed=i))
        pkt = enc.get_packet()
        w.write_frame(pkt.payload, pkt.pts)
    w.finalize()
    buf.seek(0)
    dec = Decoder()
    frames = dec.decode_ivf(buf)
    assert len(frames) == 3
    assert frames[0].y.shape == (96, 128)
