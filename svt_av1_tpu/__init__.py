"""svt_av1_tpu — a TPU-native AV1 encoder framework.

A from-scratch re-design of the capabilities of SVT-AV1 (reference:
Scalable Video Technology AV1 encoder) for TPU hardware:

- Compute path (prediction, transforms, quantization, reconstruction,
  distortion, motion search) runs as batched JAX/XLA/Pallas programs over
  whole-frame superblock batches — the reference's 40-thread wavefront
  pipeline (``EbEncHandle.c``, ``EbSystemResourceManager.c``) becomes a
  handful of ``jit``-compiled sweeps over SB anti-diagonals.
- Serial/branchy parts (daala range coder, OBU syntax, rate control state)
  run on the host (Python + C++), tile-parallel where AV1 allows.
- Scale-out is GOP sharding over a ``jax.sharding.Mesh`` (ICI/DCN
  collectives), not FIFO fabrics.

Package map (mirrors SURVEY.md §2 component inventory):
  io/        Y4M/YUV readers, IVF writer            (ref: Source/App/EncApp)
  tables/    normative AV1 spec constant tables     (ref: EbCabacContextModel.c data)
  ops/       transforms, quant, intra, distortion   (ref: EbTransforms.c, EbFullLoop.c, ...)
  entropy/   range coder, CDF model, symbol layer,  (ref: EbBitstreamUnit.c,
             OBU writers                                  EbEntropyCoding.c)
  pipeline/  frame encode orchestration             (ref: Eb*Process.c stages)
  decoder/   mirror AV1 decoder for validation      (ref decoder is a stub)
  parallel/  mesh / GOP sharding                    (ref: EbSystemResourceManager.c)
  utils/     bit I/O, scan orders, helpers          (ref: EbUtility.c)
"""

__version__ = "0.1.0"

from svt_av1_tpu.config import EncoderConfig  # noqa: F401
