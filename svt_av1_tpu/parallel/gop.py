"""GOP-parallel encoding over a device mesh.

Each mesh slot encodes an independent frame (GOP shard / stream); inputs
and outputs are sharded over the 'gop' axis so no collective traffic is
needed in steady state (GOPs are independent given keyframes —
SURVEY.md §5 "elastic unit").  Scaling to hosts rides the same mesh over
DCN; reference-plane exchange for future intra-GOP frame parallelism
will use ICI collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["gop_mesh", "sharded_frame_encoder", "GopShardedEncoder"]


def gop_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devs = devices if devices is not None else jax.devices()[:n_devices]
    return Mesh(np.array(devs), axis_names=("gop",))


class GopShardedEncoder:
    """Single-stream GOP-parallel encoder over a device mesh.

    Buffers ``n_shards`` consecutive GOPs (``gop_length`` frames each,
    every GOP opening with a keyframe) and encodes them in LOCKSTEP:
    mesh slot g holds GOP g; step t encodes frame t of every GOP as one
    sharded device program — pure data parallelism over the 'gop' axis
    (GOPs are independent given keyframes), so steady state needs no
    collective traffic and scaling to hosts rides the same mesh over
    DCN.  Packets come out in stream (display) order.

    ref analog: multi-channel instances (EbAppMain.c:196-215) applied to
    GOP chunks of one stream; BASELINE config 5 / the >=85% 4-host
    scaling target.  Exposed through ``EncoderConfig.num_gop_shards``
    via the CLI (app/enc_app.py).
    """

    def __init__(self, config, n_shards: int, gop_length: int,
                 mesh: Mesh | None = None) -> None:
        from svt_av1_tpu.pipeline.multistream import MultiStreamEncoder

        assert gop_length >= 2 and n_shards >= 1
        self.L = gop_length
        self.G = n_shards
        self.mesh = mesh if mesh is not None else gop_mesh(n_shards)
        self._cfg = config.replace(intra_period=gop_length - 1,
                                   scene_change_detection=False,
                                   num_gop_shards=1)
        self._ms = MultiStreamEncoder(self._cfg, n_shards, mesh=self.mesh)
        self._buf: list = []
        self._packets: list = []
        self._emitted = 0

    def send_picture(self, frame) -> None:
        """Queue one source frame (None = end of stream / flush)."""
        if frame is None:
            self.flush()
            return
        self._buf.append(frame)
        if len(self._buf) == self.G * self.L:
            self._process(len(self._buf))

    def flush(self) -> None:
        if not self._buf:
            return
        n_real = len(self._buf)
        # pad the tail with copies of the last frame to fill the slot
        # grid; padding packets (strictly after the real tail in stream
        # order) are dropped below
        while len(self._buf) < self.G * self.L:
            self._buf.append(self._buf[-1])
        self._process(n_real)

    def _process(self, n_real: int) -> None:
        chunks = [self._buf[g * self.L : (g + 1) * self.L]
                  for g in range(self.G)]
        self._buf = []
        # GOPs are the elastic-recovery unit (SURVEY §5): a failure mid
        # super-GOP discards only this super-GOP's device state; one
        # retry re-encodes it from the buffered source frames on a fresh
        # lockstep encoder before giving up.
        from svt_av1_tpu.pipeline.multistream import MultiStreamEncoder
        for attempt in range(2):
            try:
                per_slot = self._encode_chunks(chunks)
                break
            except Exception:
                if attempt:
                    raise
                self._ms = MultiStreamEncoder(self._cfg, self.G,
                                              mesh=self.mesh)
        base = self._emitted
        for g in range(self.G):
            for t, p in enumerate(per_slot[g]):
                if g * self.L + t >= n_real:
                    break
                p.pts = base + g * self.L + t
                p.display_idx = p.pts
                self._packets.append(p)
        self._emitted += n_real

    def _encode_chunks(self, chunks) -> list:
        per_slot = [[] for _ in range(self.G)]
        # reset lockstep state: every super-GOP restarts at a keyframe
        self._ms._idx = 0
        self._ms._refs = None
        for t in range(self.L):
            pkts = self._ms.send([chunks[g][t] for g in range(self.G)])
            for g, p in enumerate(pkts):
                per_slot[g].append(p)
        return per_slot

    def get_packet(self):
        return self._packets.pop(0) if self._packets else None

    def encode_all(self, frames):
        """Convenience: push all frames, yield packets in stream order."""
        for f in frames:
            self.send_picture(f)
            while self._packets:
                yield self._packets.pop(0)
        self.flush()
        while self._packets:
            yield self._packets.pop(0)


def sharded_frame_encoder(nbh: int, nbw: int, qindex: int, mesh: Mesh):
    """Jit a batched frame-encode step with batch sharded over 'gop'.

    fn(src_y [G,nbh,nbw,8,8], src_u [G,nbh,nbw,4,4], src_v) -> tuple of
    per-frame outputs, all sharded over the leading axis.
    """
    from svt_av1_tpu.pipeline.intra_encoder import frame_step

    step = frame_step(nbh, nbw, qindex)
    batched = jax.vmap(step)
    shard = NamedSharding(mesh, P("gop"))
    return jax.jit(batched,
                   in_shardings=(shard, shard, shard),
                   out_shardings=shard)
