#!/usr/bin/env python3
"""Per-stage breakdown of the 1080p hier-B path (bench config 3).

Splits a steady-state mini-GOP into its cost components on the real
device: source upload, device step (chained, RTT-corrected), packed
fetch, host entropy, and the e2e interleaved number — so perf work
attacks the real bottleneck instead of a guess.
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

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.pipeline import inter_encoder as PE
from svt_av1_tpu.pipeline import intra_encoder as IE
from svt_av1_tpu.pipeline.encoder import Encoder
from bench import synthetic_clip

W, H = 1920, 1080
N = 17


def main():
    frames = synthetic_clip(W, H, N)
    cfg = dict(width=W, height=H, qp=40, intra_period=-1,
               pred_structure=2, hierarchical_levels=3, compound_mode=1,
               enable_cdef=True, enable_deblocking=True,
               recon_output=False, scene_change_detection=False)
    enc = Encoder(EncoderConfig(**cfg))
    # warmup: compile key + P + B steps
    for f in frames[:9]:
        enc.send_picture(f)
    enc.flush()
    while enc.get_packet() is not None:
        pass

    seq = enc.seq
    ph, pw = seq.mi_rows * 4, seq.mi_cols * 4
    ph32, pw32 = -(-ph // 64) * 64, -(-pw // 64) * 64

    # 1. upload cost: pad + jnp.asarray + block
    t0 = time.perf_counter()
    ups = []
    for f in frames[1:5]:
        sy = jnp.asarray(IE.pad_plane(f.y.astype(np.uint8), ph32, pw32))
        su = jnp.asarray(IE.pad_plane(f.u.astype(np.uint8), ph32 // 2,
                                      pw32 // 2))
        sv = jnp.asarray(IE.pad_plane(f.v.astype(np.uint8), ph32 // 2,
                                      pw32 // 2))
        ups.append((sy, su, sv))
    for t in ups:
        for a in t:
            a.block_until_ready()
    up_ms = (time.perf_counter() - t0) / 4 * 1e3

    # 2. device step chained (B step, compound): feed output recon back
    fnB = PE.build_b_frame_encoder_dyn(
        ph32, pw32, seq.mi_rows, seq.mi_cols, cdef=True, compound=True,
        bd=8, rdo=enc._rdo, txs=enc._txs, filt=0, lr=False,
        rect=enc._rect)
    refs = enc._store[max(enc._store)]["dev"] if enc._store else None
    sy, su, sv = ups[0]
    lvls = enc._lf_levels(100, False)
    dyn = (jnp.int32(100), jnp.int32(lvls[0]), jnp.int32(lvls[2]),
           jnp.int32(lvls[3]))
    out = fnB(sy, su, sv, *refs, *refs, *dyn)
    jax.block_until_ready(out)
    REP = 10
    t0 = time.perf_counter()
    o = out
    for _ in range(REP):
        r = enc._as_ref_planes(o[5][:ph, :pw], o[6][: ph // 2, : pw // 2],
                               o[7][: ph // 2, : pw // 2])
        o = fnB(sy, su, sv, *r, *refs, *dyn)
    jax.block_until_ready(o)
    step_ms = (time.perf_counter() - t0) / REP * 1e3

    # 3. packed fetch cost
    lay = PE.inter_layout(2, True, False, lv8=True, lr=False, rect=False)
    t0 = time.perf_counter()
    for _ in range(4):
        arrs = enc._fetch_inter_arrs(out, lay)
    fetch_ms = (time.perf_counter() - t0) / 4 * 1e3

    # 4. host entropy cost (C++ tile coder via _make_inter_packet)
    meta = {"display": 1, "show": False, "nrefs": 2, "compound": True,
            "ref_types": (1, 7), "order_hint": 1, "refresh": 2,
            "ref_idx": (0,) * 7, "ref_hints": (0,) * 7}
    t0 = time.perf_counter()
    for _ in range(4):
        pkt = enc._make_inter_packet(frames[1], None, 100, meta, 0,
                                     lay=lay, arrs=dict(arrs))
    ec_ms = (time.perf_counter() - t0) / 4 * 1e3

    # 5. e2e steady state
    enc2 = Encoder(EncoderConfig(**cfg))
    for f in frames[:9]:
        enc2.send_picture(f)
    enc2.flush()
    while enc2.get_packet() is not None:
        pass
    enc3 = Encoder(EncoderConfig(**cfg))
    t0 = time.perf_counter()
    for f in frames:
        enc3.send_picture(f)
    enc3.flush()
    n = 0
    while enc3.get_packet() is not None:
        n += 1
    e2e = time.perf_counter() - t0
    print(f"upload/frame:     {up_ms:8.1f} ms")
    print(f"B step (chained): {step_ms:8.1f} ms")
    print(f"packed fetch:     {fetch_ms:8.1f} ms")
    print(f"entropy+pack:     {ec_ms:8.1f} ms  (bytes={len(pkt.payload)})")
    print(f"e2e: {N / e2e:.2f} fps ({e2e / N * 1e3:.0f} ms/frame, n={n})")


if __name__ == "__main__":
    main()
