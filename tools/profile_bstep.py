#!/usr/bin/env python3
"""Minimal 1080p B-step profile: compile ONE step variant and measure
upload / chained device step / packed fetch / C++ entropy in isolation
(tools/profile_1080.py measures the full-encoder e2e; this one keeps
the compile budget to a single program so it fits a cold cache)."""
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

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.pipeline import inter_encoder as PE
from svt_av1_tpu.pipeline import intra_encoder as IE
from svt_av1_tpu.pipeline.encoder import Encoder

W, H = 1920, 1080


def main():
    enc = Encoder(EncoderConfig(width=W, height=H, qp=40, intra_period=-1,
                                pred_structure=2, hierarchical_levels=3,
                                compound_mode=1, recon_output=False,
                                scene_change_detection=False))
    seq = enc.seq
    ph, pw = seq.mi_rows * 4, seq.mi_cols * 4
    ph32, pw32 = -(-ph // 64) * 64, -(-pw // 64) * 64
    rng = np.random.default_rng(1)
    yy = rng.integers(0, 255, (H, W), dtype=np.uint8)
    uu = rng.integers(0, 255, (H // 2, W // 2), dtype=np.uint8)
    vv = rng.integers(0, 255, (H // 2, W // 2), dtype=np.uint8)

    sy = jnp.asarray(IE.pad_plane(yy, ph32, pw32))
    jax.block_until_ready(sy)                  # backend init billed here
    t0 = time.perf_counter()
    sy = jnp.asarray(IE.pad_plane(yy, ph32, pw32))
    su = jnp.asarray(IE.pad_plane(uu, ph32 // 2, pw32 // 2))
    sv = jnp.asarray(IE.pad_plane(vv, ph32 // 2, pw32 // 2))
    jax.block_until_ready([sy, su, sv])
    up_ms = (time.perf_counter() - t0) * 1e3

    # reference = shifted source: realistic residual + ME work
    refs = (jnp.asarray(IE.pad_plane(np.roll(yy, 5, 1), ph32, pw32)),
            jnp.asarray(IE.pad_plane(np.roll(uu, 2, 1), ph32 // 2,
                                     pw32 // 2)),
            jnp.asarray(IE.pad_plane(np.roll(vv, 2, 1), ph32 // 2,
                                     pw32 // 2)))
    t0 = time.perf_counter()
    fnB = PE.build_b_frame_encoder_dyn(
        ph32, pw32, seq.mi_rows, seq.mi_cols, cdef=True, compound=True,
        bd=8, rdo=True, txs=False, filt=0, lr=False, rect=False)
    lvls = enc._lf_levels(100, False)
    dyn = (jnp.int32(100), jnp.int32(lvls[0]), jnp.int32(lvls[2]),
           jnp.int32(lvls[3]))
    out = fnB(sy, su, sv, *refs, *refs, *dyn)
    jax.block_until_ready(out)
    print(f"compile+first step: {time.perf_counter() - t0:.1f} s",
          flush=True)

    REP = 8
    t0 = time.perf_counter()
    o = out
    for _ in range(REP):
        r = enc._as_ref_planes(o[5][:ph, :pw], o[6][: ph // 2, : pw // 2],
                               o[7][: ph // 2, : pw // 2])
        o = fnB(sy, su, sv, *r, *refs, *dyn)
    jax.block_until_ready(o)
    step_ms = (time.perf_counter() - t0) / REP * 1e3
    # step alone, same refs every time (no as_ref_planes pads in chain)
    t0 = time.perf_counter()
    for _ in range(REP):
        o = fnB(sy, su, sv, *refs, *refs, *dyn)
    jax.block_until_ready(o)
    step_alone_ms = (time.perf_counter() - t0) / REP * 1e3
    print(f"B step (fixed refs):      {step_alone_ms:8.1f} ms")

    lay = PE.inter_layout(2, True, False, lv8=True, lr=False, rect=False)
    arrs = enc._fetch_inter_arrs(out, lay)     # compile packer
    t0 = time.perf_counter()
    for _ in range(4):
        arrs = enc._fetch_inter_arrs(out, lay)
    fetch_ms = (time.perf_counter() - t0) / 4 * 1e3

    from svt_av1_tpu.io.yuv import Frame
    frame = Frame(yy, uu, vv)
    meta = {"display": 1, "show": False, "nrefs": 2, "compound": True,
            "ref_types": (1, 7), "order_hint": 1, "refresh": 2,
            "ref_idx": (0,) * 7, "ref_hints": (0,) * 7}
    pkt = enc._make_inter_packet(frame, None, 100, meta, 0, lay=lay,
                                 arrs=dict(arrs))
    t0 = time.perf_counter()
    for _ in range(4):
        pkt = enc._make_inter_packet(frame, None, 100, meta, 0, lay=lay,
                                     arrs=dict(arrs))
    ec_ms = (time.perf_counter() - t0) / 4 * 1e3
    print(f"upload (3 planes, first): {up_ms:8.1f} ms")
    print(f"B step (chained):         {step_ms:8.1f} ms")
    print(f"packed fetch:             {fetch_ms:8.1f} ms")
    print(f"entropy+packetize:        {ec_ms:8.1f} ms "
          f"(bytes={len(pkt.payload)})")


if __name__ == "__main__":
    main()
