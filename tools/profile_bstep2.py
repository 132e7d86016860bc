#!/usr/bin/env python3
"""Round-4 B-step profiler: preset-true flags, FLOP/MFU accounting,
and a vmap batch-scaling probe (1/2/4) to size the layer-batched
mini-GOP dispatch.

Answers, on the real device:
  - what does the bench's ACTUAL B step cost (enc_mode=8: rdo off)?
  - XLA's FLOP estimate for the step -> MFU vs the chip peak
  - does batching frames via vmap amortize per-call overhead?
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from svt_av1_tpu.utils.cache import jax_cache_dir

jax.config.update("jax_compilation_cache_dir", jax_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from svt_av1_tpu.pipeline import inter_encoder as PE

W, H = 1920, 1080
PH = -(-H // 64) * 64
PW = -(-W // 64) * 64
MI_R, MI_C = H // 4, W // 4

# v5e peak: ~394 TFLOP/s bf16, ~197 TFLOP/s f32-ish via passes; use the
# f32 number for a conservative MFU denominator
PEAK_FLOPS = 197e12


def mk_inputs(rng, batch=None):
    def plane(h, w):
        a = rng.integers(0, 256, (h, w) if batch is None else (batch, h, w))
        return jnp.asarray(a, jnp.uint8)
    sy, su, sv = plane(PH, PW), plane(PH // 2, PW // 2), plane(PH // 2, PW // 2)
    r = [plane(PH, PW), plane(PH // 2, PW // 2), plane(PH // 2, PW // 2)]
    r2 = [plane(PH, PW), plane(PH // 2, PW // 2), plane(PH // 2, PW // 2)]
    if batch is None:
        dyn = (jnp.int32(100), jnp.int32(7), jnp.int32(3), jnp.int32(3))
    else:
        dyn = tuple(jnp.full((batch,), v, jnp.int32) for v in (100, 7, 3, 3))
    return (sy, su, sv, *r, *r2, *dyn)


def timeit(fn, args, rep=6, chain=None):
    """Through the axon tunnel block_until_ready returns at enqueue;
    only a device_get proves execution.  Chained mode: feed each call's
    recon planes back as the next call's refs (true data dependency),
    fetch once at the end -> per-rep ~= step time + RTT/rep."""
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])   # warm + sync
    t0 = time.perf_counter()
    a = list(args)
    for _ in range(rep):
        out = fn(*a)
        if chain is not None:
            for dst, src in chain:
                a[dst] = out[src]
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / rep * 1e3


def build(rdo: bool):
    fn = PE.p_frame_step(PH, PW, None, nrefs=2, compound=True, bd=8,
                         rdo=rdo, txs=False, filt=0, lr=False, rect=False)
    fn.bind_masks(MI_R, MI_C, False, True)
    return jax.jit(fn)


def report(name, fn, args, rep=6, chain=((3, 5), (4, 6), (5, 7))):
    try:
        comp = fn.lower(*args).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        fl = ca.get("flops", float("nan"))
        by = ca.get("bytes accessed", float("nan"))
    except Exception as e:
        fl = by = float("nan")
        print("cost_analysis failed:", type(e).__name__, e)
    ms = timeit(fn, args, rep=rep, chain=chain)
    print(f"{name}: {ms:7.1f} ms   XLA flops={fl/1e9:.1f} G  "
          f"bytes={by/1e9:.2f} G  MFU={fl/(ms/1e3)/PEAK_FLOPS*100:.1f}%  "
          f"HBM={by/(ms/1e3)/819e9*100:.1f}%", flush=True)


def main():
    import os as _os
    rng = np.random.default_rng(0)
    args = mk_inputs(rng)
    for impl in ("mm", "pallas"):
        _os.environ["SVT_GATHER"] = impl
        jax.clear_caches()   # gather impl is chosen at trace time
        for rdo in (False,) if impl == "pallas" else (False, True):
            try:
                report(f"B step rdo={int(rdo)} gather={impl}",
                       build(rdo), args)
            except Exception as e:   # pallas probe: libtpu-dependent
                print(f"B step rdo={int(rdo)} gather={impl}: FAILED "
                      f"{type(e).__name__}", flush=True)
    _os.environ.pop("SVT_GATHER")
    jax.clear_caches()

    # vmap batch probe on the bench path (rdo=False)
    base = PE.p_frame_step(PH, PW, None, nrefs=2, compound=True, bd=8,
                           rdo=False, txs=False, filt=0, lr=False,
                           rect=False)
    base.bind_masks(MI_R, MI_C, False, True)
    for b in (2, 4):
        vfn = jax.jit(jax.vmap(base))
        bargs = mk_inputs(rng, batch=b)
        report(f"vmap batch={b} (total)", vfn, bargs, rep=4,
               chain=((3, 5), (4, 6), (5, 7)))


if __name__ == "__main__":
    main()
