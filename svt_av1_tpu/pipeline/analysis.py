"""Picture analysis: decimation pyramids, block variance, histograms,
noise estimation — feeding adaptive quantization and the lookahead.

ref picture_analysis_kernel (EbPictureAnalysisProcess.c:5010): the
reference builds 1/4 + 1/16 decimated planes (DecimateInputPicture:4907),
per-block means/variances (ComputeBlockMeanComputeVariance:2066), luma
histograms (:4146) and a noise level (DetectInputPictureNoise:3261) on
its picture-analysis thread pool.  Here the same statistics are batched
array ops (xp-generic: numpy on host, jax.numpy on device) — one call
per frame, no wavefronts or segment queues.

Adaptive quantization (ref SourceBasedOperationsProcess.c content
classifiers -> QP scaling): a frame-level q offset derived from spatial
activity (variance masking: busy frames hide quantization noise, flat
frames band) and the noise floor.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class PictureStats:
    """Per-frame analysis products (ref PictureParentControlSet's
    pa fields)."""
    mean: float            # luma mean
    variance: float        # frame mean of per-SB variance
    var_sb: np.ndarray     # [sb_rows, sb_cols] per-64x64 luma variance
    hist: np.ndarray       # [64] 4-bit-binned luma histogram
    noise: float           # high-frequency noise level estimate
    pyr4: np.ndarray       # 1/4-decimated luma
    pyr16: np.ndarray      # 1/16-decimated luma


def decimate(xp, plane, factor: int):
    """Box-filtered decimation (ref Decimation2D, EbPictureAnalysis
    Process.c:170 uses subsampling; the box filter is the quality
    variant the reference gates behind DOWN_SAMPLING_FILTER_MODE)."""
    h, w = plane.shape
    h2, w2 = h // factor * factor, w // factor * factor
    p = plane[:h2, :w2].reshape(h2 // factor, factor, w2 // factor, factor)
    return p.astype(xp.int32).sum((1, 3)) // (factor * factor)


def block_variance(xp, plane, bs: int = 64):
    """Per-[bs x bs]-block luma variance (integer, like the reference's
    variance16x16..64x64 ladder)."""
    h, w = plane.shape
    ph, pw = -(-h // bs) * bs, -(-w // bs) * bs
    if (ph, pw) != (h, w):
        p32 = plane.astype(xp.int64)
        pad = ((0, ph - h), (0, pw - w))
        p32 = xp.pad(p32, pad, mode="edge")
    else:
        p32 = plane.astype(xp.int64)
    b = p32.reshape(ph // bs, bs, pw // bs, bs)
    n = bs * bs
    s = b.sum((1, 3))
    s2 = (b * b).sum((1, 3))
    return (s2 // n - (s // n) ** 2).astype(xp.int32)


def luma_histogram(xp, plane):
    """64-bin (>>2) luma histogram (ref SubSampleLumaGeneratePixel
    IntensityHistogramBins subsamples 4:1; full count here)."""
    if xp is np:
        return np.bincount((plane >> 2).reshape(-1), minlength=64)[:64]
    import jax.numpy as jnp
    return jnp.bincount((plane >> 2).reshape(-1), length=64)


def noise_level(xp, plane):
    """Noise estimate: mean |laplacian|/6 on the interior (the same
    high-pass family the reference's DetectInputPictureNoise uses)."""
    p = plane.astype(xp.int32)
    lap = (4 * p[1:-1, 1:-1] - p[:-2, 1:-1] - p[2:, 1:-1]
           - p[1:-1, :-2] - p[1:-1, 2:])
    return xp.abs(lap).mean() / 6.0


def analyze(frame_y: np.ndarray) -> PictureStats:
    """Host-side picture analysis of one luma plane."""
    y = np.asarray(frame_y)
    var_sb = block_variance(np, y, 64)
    return PictureStats(
        mean=float(y.mean()),
        variance=float(var_sb.mean()),
        var_sb=var_sb,
        hist=np.asarray(luma_histogram(np, y)),
        noise=float(noise_level(np, y)),
        pyr4=np.asarray(decimate(np, y, 4)),
        pyr16=np.asarray(decimate(np, y, 16)),
    )


def aq_frame_offset(stats: PictureStats, bd: int = 8) -> int:
    """Frame-level adaptive-q offset (qindex units, +-12).

    Variance masking: high spatial activity hides coding noise -> spend
    fewer bits (positive offset); flat content bands -> spend more
    (negative offset).  Noise lifts the floor so grain is not chased.
    ref analog: SourceBasedOperationsProcess QP scaling inputs
    (EbSourceBasedOperationsProcess.c:89-283) reduced to frame level.
    """
    sc = 1 << (2 * (bd - 8))
    act = max(1.0, stats.variance / sc - 4.0 * stats.noise ** 2)
    # ~0 offset at var 1000; +-3 qindex per octave away from it
    off = 3.0 * (np.log2(act) - np.log2(1000.0))
    return int(np.clip(round(off), -12, 12))
