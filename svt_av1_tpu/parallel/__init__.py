"""Scale-out: device meshes and GOP sharding.

The reference scales by threads + FIFO fabric on one host and by running
N independent encoder instances for multi-stream (SURVEY.md §5, channel_id
EbSvtAv1Enc.h:292).  The TPU build scales by sharding independent GOPs /
streams over a ``jax.sharding.Mesh`` — pure data parallelism over the
'gop' axis (frames of different GOPs share nothing in intra/keyframe
bounds), with XLA placing each frame's wavefront program on its device.
"""

from svt_av1_tpu.parallel.gop import (  # noqa: F401
    GopShardedEncoder, gop_mesh, sharded_frame_encoder)
