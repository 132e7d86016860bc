"""Multi-stream batched encoding: S lockstep IPPP streams share one
vmapped device step (ref multi-channel instances, EbSvtAv1Enc.h:292);
every stream must stay bit-exact against its own mirror decode."""

import numpy as np

from svt_av1_tpu import EncoderConfig
from svt_av1_tpu.decoder import Decoder
from svt_av1_tpu.io import synthetic_frame
from svt_av1_tpu.pipeline.multistream import MultiStreamEncoder


def test_multistream_bit_exact_per_stream():
    W, H, S = 192, 128, 3
    cfg = EncoderConfig(width=W, height=H, qp=45, intra_period=63,
                        pred_structure=0, scene_change_detection=False)
    ms = MultiStreamEncoder(cfg, S)
    decs = [Decoder() for _ in range(S)]
    bases = [synthetic_frame(W, H, seed=s) for s in range(S)]
    for i in range(3):
        frames = []
        for s in range(S):
            f = synthetic_frame(W, H, seed=s)
            f.y[:] = np.roll(bases[s].y, (i, 2 * i + s), (0, 1))
            f.u[:] = np.roll(bases[s].u, (0, i), (0, 1))
            f.v[:] = np.roll(bases[s].v, (0, i), (0, 1))
            frames.append(f)
        pkts = ms.send(frames)
        assert len(pkts) == S
        for s in range(S):
            d = decs[s].decode_temporal_unit(pkts[s].payload)
            np.testing.assert_array_equal(d.y, pkts[s].recon.y)
            np.testing.assert_array_equal(d.u, pkts[s].recon.u)
            np.testing.assert_array_equal(d.v, pkts[s].recon.v)
        # streams are independent: payloads differ
        assert len({p.payload for p in pkts}) == S
