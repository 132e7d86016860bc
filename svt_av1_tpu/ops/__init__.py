"""Device compute ops (JAX/XLA/Pallas): transforms, quant, intra, distortion.

The reference implements these as per-ISA SIMD kernel families dispatched via
function-pointer tables (SURVEY.md §2.4).  Here each op is a single batched
JAX program over all blocks of a frame at once; XLA lowers to MXU/VPU, and
the hottest paths get Pallas kernels.
"""
