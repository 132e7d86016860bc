"""Full-RD partition merge (enc_mode <= 7) tests.

The RD path residual-codes every size against its own prediction and
merges on J = recon SSE + lambda * estimated bits (inter_encoder rdo
path); preset 8 keeps the fast SAD merge.  Both must mirror-decode
bit-exactly; the RD path must not lose quality-per-bit on textured
motion content.
"""

import numpy as np

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.decoder import Decoder
from svt_av1_tpu.io.yuv import synthetic_frame
from svt_av1_tpu.pipeline.encoder import Encoder

W, H = 192, 128


def _clip(n):
    base = synthetic_frame(W, H, seed=5)
    out = []
    for i in range(n):
        f = synthetic_frame(W, H, seed=5)
        f.y[:] = np.roll(base.y, (i, 2 * i), (0, 1))
        f.u[:] = np.roll(base.u, (0, i), (0, 1))
        f.v[:] = np.roll(base.v, (0, i), (0, 1))
        out.append(f)
    return out


def _encode(enc_mode, frames, **kw):
    enc = Encoder(EncoderConfig(width=W, height=H, qp=40, intra_period=-1,
                                enc_mode=enc_mode, stat_report=True,
                                scene_change_detection=False, **kw))
    dec = Decoder()
    bits, psnr = 0, []
    for pkt in enc.encode_all(frames):
        out = dec.decode_temporal_unit(pkt.payload)
        if out is not None and pkt.recon is not None:
            np.testing.assert_array_equal(out.y, pkt.recon.y)
            np.testing.assert_array_equal(out.u, pkt.recon.u)
            np.testing.assert_array_equal(out.v, pkt.recon.v)
        bits += len(pkt.payload) * 8
        if pkt.psnr:
            psnr.append(pkt.psnr[0])
    return bits, float(np.mean(psnr))


def test_rdo_p_mirror_decode_parity():
    frames = _clip(4)
    bits_rd, psnr_rd = _encode(4, frames, pred_structure=0)
    bits_fast, psnr_fast = _encode(8, frames, pred_structure=0)
    # the RD merge optimizes J = D + lambda*R: at matched q it must not
    # be worse on BOTH axes simultaneously
    assert not (bits_rd > bits_fast * 1.02 and psnr_rd < psnr_fast - 0.05), \
        (bits_rd, bits_fast, psnr_rd, psnr_fast)


def test_rdo_hier_compound_parity():
    frames = _clip(9)
    _encode(4, frames, pred_structure=2, hierarchical_levels=2,
            compound_mode=1)
