"""Motion estimation (device): batched full-pel SAD search.

The reference's ME is a per-segment multi-threaded HME/SAD sweep
(MotionEstimationKernel, EbMotionEstimationProcess.c:374;
open_loop_me_fullpel_search_sblock, EbMotionEstimation.c:3251).  The TPU
formulation evaluates EVERY block of the frame against EVERY candidate
offset as one dense tensor program: for each offset d in a (2R+1)^2
window, |src - shift(ref, d)| is reduced per aligned block by a reshape
block-sum — no per-block control flow, all MXU/VPU-friendly.

SAD tie-breaking follows raster order over (dy, dx), matching a
'first-best-wins' scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fullpel_search(src, ref_pad, block: int, search_range: int):
    """Exhaustive full-pel SAD search on aligned blocks.

    src:      [H, W] int32 source plane (H, W multiples of `block`)
    ref_pad:  [H + 2R, W + 2R] int32 edge-padded reference plane
    returns:  (mv [nbh, nbw, 2] int32 full-pel (row, col), sad [nbh, nbw])
    """
    H, W = src.shape
    R = search_range
    n = 2 * R + 1
    nbh, nbw = H // block, W // block

    def body(k, state):
        best_sad, best_k = state
        dy = k // n
        dx = k % n
        win = jax.lax.dynamic_slice(ref_pad, (dy, dx), (H, W))
        d = jnp.abs(src - win)
        sad = d.reshape(nbh, block, nbw, block).sum((1, 3))
        better = sad < best_sad
        return (jnp.where(better, sad, best_sad),
                jnp.where(better, k, best_k))

    init = (jnp.full((nbh, nbw), 2**30, jnp.int32),
            jnp.zeros((nbh, nbw), jnp.int32))
    best_sad, best_k = jax.lax.fori_loop(0, n * n, body, init)
    mv = jnp.stack([best_k // n - R, best_k % n - R], axis=-1)
    return mv, best_sad


def gather_blocks(plane_pad, mv, block: int, pad: int):
    """Motion-compensated block gather from a padded plane.

    plane_pad: [H + 2*pad, W + 2*pad]; mv: [nbh, nbw, 2] integer offsets
    (in this plane's pixels).  Returns [nbh, nbw, block, block].
    """
    nbh, nbw = mv.shape[:2]
    base_r = jnp.arange(nbh)[:, None] * block + pad + mv[..., 0]
    base_c = jnp.arange(nbw)[None, :] * block + pad + mv[..., 1]
    rr = base_r[:, :, None, None] + jnp.arange(block)[None, None, :, None]
    cc = base_c[:, :, None, None] + jnp.arange(block)[None, None, None, :]
    return plane_pad[rr, cc]
