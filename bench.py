#!/usr/bin/env python3
"""Driver benchmark: BASELINE configs 1-5, headline-first and budgeted.

Prints the driver-contract JSON line {"metric", "value", "unit",
"vs_baseline"} for the headline config (config 3: 1080p 8-bit
hierarchical-B, compound prediction, CDEF + DLF) **immediately after it
is measured** — before any other config runs — then runs configs
1/2/4/5 under explicit wall-clock budgets and re-prints the same line
enriched with an "extra" object.  Both lines carry identical
metric/value, so the driver's parse is correct whether it takes the
first or the last JSON line, and a kill mid-extras still leaves the
headline on stdout.  A SIGALRM watchdog prints whatever has been
measured and exits 0 if the total budget is exceeded (round 3 shipped
rc=124/parsed:null by printing nothing until all configs finished).

Reproducibility invariant (round-4 fix): every timed section counts
XLA compilations (a logging hook on jax's dispatch logger).  A compile
inside a timed region invalidates the measurement — the run is redone
once (now warm) and the pollution is recorded in "extra".  The repo
ships a committed TPU persistent-compile cache (.jax_cache/tpu,
populated by tools/prewarm.py) so a fresh container starts warm; the
in-run warmups remain as the safety net.

vs_baseline is the ratio to a 30 fps real-time floor (the reference's
VOD/live positioning, README.md:7; the reference repo publishes no
absolute fps — BASELINE.md "published: none").

`python bench.py --smoke` proves the JSON contract on a tiny config in
well under 60 s (guarded by tests/test_bench_contract.py).

Runs on whatever backend the environment provides (real TPU under the
driver; CPU fallback elsewhere).  Measures the full hybrid pipeline:
device encode + host entropy + packetization, steady-state (compile
excluded via warmup).
"""

from __future__ import annotations

import json
import logging
import os
import signal
import sys
import time

import numpy as np

# persistent XLA compile cache: the remote AOT compile of the big frame
# steps costs minutes; the TPU cache ships IN THE REPO (.jax_cache/tpu)
# so driver runs in fresh containers start warm
import jax  # noqa: E402

from svt_av1_tpu.utils.cache import setup_jax_cache

# test harnesses force CPU without fighting sitecustomize's axon env
if os.environ.get("SVT_BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["SVT_BENCH_PLATFORM"])
setup_jax_cache(jax)


class _CompileCounter(logging.Handler):
    """Counts XLA compilations via jax's dispatch log records — the
    bench invariant is ZERO compiles inside any timed section."""

    def __init__(self) -> None:
        super().__init__(level=logging.DEBUG)
        self.count = 0

    def emit(self, record: logging.LogRecord) -> None:
        if "Finished XLA compilation" in record.getMessage():
            self.count += 1


_compiles = _CompileCounter()
_dispatch_logger = logging.getLogger("jax._src.dispatch")
_dispatch_logger.addHandler(_compiles)
_dispatch_logger.setLevel(logging.DEBUG)
_dispatch_logger.propagate = False


class timed:
    """Timed-section guard: wall clock + compile count."""

    def __enter__(self):
        self.compiles0 = _compiles.count
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.dt = time.perf_counter() - self.t0
        self.compiles = _compiles.count - self.compiles0
        return False


def synthetic_clip(w: int, h: int, n: int):
    """Moving synthetic content: textured base + drifting overlays so ME
    has real work and residuals are nontrivial."""
    from svt_av1_tpu.io.yuv import synthetic_frame

    base = synthetic_frame(w, h, seed=7)
    frames = []
    for i in range(n):
        f = synthetic_frame(w, h, seed=7)
        f.y[:] = np.roll(base.y, (2 * i, 3 * i), (0, 1))
        f.u[:] = np.roll(base.u, (i, i), (0, 1))
        f.v[:] = np.roll(base.v, (i, -i), (0, 1))
        # a local moving patch breaks pure global motion
        yy, xx = (17 * i) % max(1, h - 64), (29 * i) % max(1, w - 64)
        f.y[yy : yy + 48, xx : xx + 48] = (f.y[yy : yy + 48, xx : xx + 48]
                                           // 2 + 64)
        frames.append(f)
    return frames


def run_intra_480p():
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.io.yuv import synthetic_frame
    from svt_av1_tpu.pipeline.encoder import Encoder

    W, H, N = 854, 480, 64
    enc = Encoder(EncoderConfig(width=W, height=H, qp=40, device_batch=32,
                                recon_output=False))
    frames = [synthetic_frame(W, H, seed=i) for i in range(N)]
    for f in frames[:32]:
        enc.send_picture(f)
    for _ in range(32):
        enc.get_packet()
    with timed() as t:
        for f in frames:
            enc.send_picture(f)
        for _ in frames:
            enc.get_packet()
    return N / t.dt, t


def run_ldp_720p():
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.pipeline.encoder import Encoder

    W, H, N = 1280, 720, 48
    frames = synthetic_clip(W, H, N)
    enc = Encoder(EncoderConfig(width=W, height=H, qp=40, intra_period=-1,
                                pred_structure=0, recon_output=False,
                                scene_change_detection=False))
    for f in frames[:4]:          # warmup: compile key + P steps
        enc.send_picture(f)
    for _ in range(4):
        enc.get_packet()
    with timed() as t:
        for f in frames:
            enc.send_picture(f)
        n = 0
        while n < N:
            if enc.get_packet() is not None:
                n += 1
    return N / t.dt, t


def run_hierb_1080p():
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.pipeline.encoder import Encoder

    W, H, N = 1920, 1080, 33
    frames = synthetic_clip(W, H, N)
    cfg = dict(width=W, height=H, qp=40, intra_period=-1,
               pred_structure=2, hierarchical_levels=3, compound_mode=1,
               enable_cdef=True, enable_deblocking=True,
               recon_output=False, scene_change_detection=False)
    enc = Encoder(EncoderConfig(**cfg))
    for f in frames[:9]:          # warmup: key + one full mini-GOP
        enc.send_picture(f)
    enc.flush()
    while enc.get_packet() is not None:
        pass
    enc2 = Encoder(EncoderConfig(**cfg))
    with timed() as t:
        for f in frames:
            enc2.send_picture(f)
        enc2.flush()
        while enc2.get_packet() is not None:
            pass
    return N / t.dt, t


def run_vod_4k10():
    """Config 4: 4K 10-bit VOD — hier-B, full-RD preset, adaptive
    quantization, restoration.  Few frames: the point is a truthful
    per-frame rate for the heaviest configuration, not a long run."""
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.io.yuv import synthetic_frame
    from svt_av1_tpu.pipeline.encoder import Encoder

    W, H, N = 3840, 2160, 9
    base = synthetic_frame(W, H, seed=5, bit_depth=10)
    frames = []
    for i in range(N):
        f = synthetic_frame(W, H, seed=5, bit_depth=10)
        f.y[:] = np.roll(base.y, (2 * i, 3 * i), (0, 1))
        frames.append(f)
    cfg = dict(width=W, height=H, qp=40, bit_depth=10, intra_period=-1,
               pred_structure=2, hierarchical_levels=3, compound_mode=1,
               enc_mode=6, enable_restoration=True,
               enable_adaptive_quantization=True, recon_output=False,
               scene_change_detection=False)
    enc = Encoder(EncoderConfig(**cfg))
    for f in frames:
        enc.send_picture(f)
    enc.flush()
    while enc.get_packet() is not None:     # warmup incl. compile
        pass
    enc2 = Encoder(EncoderConfig(**cfg))
    with timed() as t:
        for f in frames:
            enc2.send_picture(f)
        enc2.flush()
        while enc2.get_packet() is not None:
            pass
    return N / t.dt, t


def run_live_4x1080():
    """Config 5 (single-chip form): 4 x 1080p live streams batched
    through one vmapped device step (pipeline/multistream.py — the
    multi-channel-instances analog; cross-host GOP sharding is the
    other axis, exercised by parallel.GopShardedEncoder on meshes).
    Returns AGGREGATE frames/s across the 4 streams."""
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.io.yuv import synthetic_frame
    from svt_av1_tpu.pipeline.multistream import MultiStreamEncoder

    W, H, S, N = 1920, 1080, 4, 12
    cfg = EncoderConfig(width=W, height=H, qp=40, intra_period=-1,
                        pred_structure=0, recon_output=False,
                        scene_change_detection=False,
                        enable_global_motion=False)
    bases = [synthetic_frame(W, H, seed=s) for s in range(S)]

    def slot(i):
        out = []
        for s in range(S):
            f = synthetic_frame(W, H, seed=s)
            f.y[:] = np.roll(bases[s].y, (i, 2 * i + s), (0, 1))
            out.append(f)
        return out

    ms = MultiStreamEncoder(cfg, S)
    for i in range(2):                      # warmup: key + P compile
        ms.send(slot(i))
    with timed() as t:
        for i in range(2, 2 + N):
            ms.send(slot(i))
    return S * N / t.dt, t


def run_smoke():
    """Tiny all-intra config: proves the end-to-end path + JSON contract
    in seconds (no separate warmup encoder, minimal frames)."""
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.io.yuv import synthetic_frame
    from svt_av1_tpu.pipeline.encoder import Encoder

    W, H, N = 320, 192, 4
    enc = Encoder(EncoderConfig(width=W, height=H, qp=40, device_batch=N,
                                recon_output=False))
    frames = [synthetic_frame(W, H, seed=i) for i in range(N)]
    with timed() as t:
        for f in frames:
            enc.send_picture(f)
        for _ in frames:
            enc.get_packet()
    return N / t.dt, t


HEADLINE = "1080p_hierB_compound_cdef_fps"
_result: dict = {"metric": HEADLINE, "value": None, "unit": "frames/s",
                 "vs_baseline": None, "extra": {}}


def _emit() -> None:
    print(json.dumps(_result), flush=True)


def _watchdog(signum, frame):  # pragma: no cover - timing dependent
    _result["extra"]["watchdog"] = "budget exceeded"
    _emit()
    os._exit(0)


def _measure(name: str, fn, remaining, est: float):
    """Run one config with the compile invariant: a compile inside the
    timed section voids the measurement — rerun once (warm now) when
    budget allows, and record the pollution either way."""
    fps, t = fn()
    if t.compiles:
        _result["extra"][name + "_compiles_timed"] = t.compiles
        if remaining() > est:
            fps2, t2 = fn()
            if not t2.compiles:
                _result["extra"][name + "_cold_fps"] = round(fps, 3)
                return fps2
    return fps


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if "--smoke" in argv:
        fps, _t = run_smoke()
        _result["metric"] = "smoke_allintra_fps"
        _result["value"] = round(fps, 3)
        _result["vs_baseline"] = round(fps / 30.0, 4)
        _emit()
        return 0

    budget = float(os.environ.get("SVT_BENCH_BUDGET_S", "1260"))
    t_start = time.monotonic()
    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(int(budget))

    def remaining() -> float:
        return budget - (time.monotonic() - t_start)

    # Headline FIRST; a failure falls back to a shorter run so the
    # driver always records a number for the graded metric.
    try:
        fps3 = _measure(HEADLINE, run_hierb_1080p, remaining, 60.0)
    except Exception as e:             # pragma: no cover
        _result["extra"]["headline_error"] = f"{type(e).__name__}: {e}"
        fps3 = 0.0
    _result["value"] = round(fps3, 3)
    _result["vs_baseline"] = round(fps3 / 30.0, 4)
    _emit()                            # land the number NOW

    # configs 1-2, then 4 BEFORE 5 (4K never recorded a number in
    # rounds 1-4; it gets budget priority now that the committed
    # compile cache removes its cold-compile cost) — each gated on
    # remaining budget and individually failure-isolated.  Estimates
    # are warm-cache run times + margin; a cold-cache container pays
    # compiles in the warmup phases, which the per-config gate absorbs
    # by skipping later configs rather than dying (watchdog backstop).
    for name, fn, est in (
        ("480p_allintra_cqp_fps", run_intra_480p, 60.0),
        ("720p_lowdelayP_fps", run_ldp_720p, 90.0),
        ("4k10_vod_rdo_lr_fps", run_vod_4k10, 420.0),
        ("4x1080p_live_agg_fps", run_live_4x1080, 120.0),
    ):
        if remaining() < est:
            _result["extra"][name] = "skipped: budget"
            continue
        try:
            _result["extra"][name] = round(
                _measure(name, fn, remaining, est), 3)
        except Exception as e:         # pragma: no cover
            _result["extra"][name] = f"error: {type(e).__name__}"
    signal.alarm(0)
    _emit()                            # enriched line, same metric/value
    return 0


if __name__ == "__main__":
    sys.exit(main())
