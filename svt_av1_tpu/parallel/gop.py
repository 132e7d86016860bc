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


def gop_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devs = devices if devices is not None else jax.devices()[:n_devices]
    return Mesh(np.array(devs), axis_names=("gop",))


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
