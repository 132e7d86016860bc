#!/usr/bin/env python3
"""Generate golden test vectors from the REFERENCE C implementation.

BASELINE.md requires the TPU kernels be validated against the reference
repo's FwdTxfm2d / InvTxfm2d / Quant unit-test vectors
(test/FwdTxfm2dAsmTest.cc:41-60, test/QuantAsmTest.cc:233-307,
test/ref/TxfmRef.cc).  The full reference build needs yasm (absent in
this image), but the transform/quant C sources are self-contained:
this tool compiles EbTransforms.c + EbFullLoop.c with gcc into a
scratch shared library, drives the C entry points via ctypes, and
writes tests/data/golden_ref.npz.  tests/test_golden_ref.py then pins
ops/transforms.py and ops/quant.py against those vectors — the same
asm-vs-C cross-validation pattern as the reference's own unit tests,
with the C reference on one side and the JAX/numpy kernels on the
other.

Reference code is used ONLY at generation time to produce data; no
reference source is shipped or linked into the package.

Entry points used (reference file:line):
  Av1TransformTwoD_{4x4..64x64}_c      EbTransforms.c:4410-4533
  av1_fwd_txfm2d_{rect}_c              EbTransforms.c:4560-4895
  av1_inv_txfm2d_add_{all}_c           EbTransforms.c:8277-8480
  aom_quantize_b[_32x32,_64x64]_c_II   EbFullLoop.c:107-140
  aom_highbd_quantize_b[...]_c         EbFullLoop.c:298-340
  quant table build (ported inline)    EbModeDecisionConfigurationProcess.c:429
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from svt_av1_tpu import tables
from svt_av1_tpu.ops import transforms as T

REF = "/root/reference/Source/Lib/Common"
BUILD = "/tmp/svt_ref_golden"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "golden_ref.npz")

SQ = {T.TX_4X4: "4x4", T.TX_8X8: "8x8", T.TX_16X16: "16x16",
      T.TX_32X32: "32x32", T.TX_64X64: "64x64"}
RECT = {T.TX_4X8: "4x8", T.TX_8X4: "8x4", T.TX_8X16: "8x16",
        T.TX_16X8: "16x8", T.TX_16X32: "16x32", T.TX_32X16: "32x16",
        T.TX_32X64: "32x64", T.TX_64X32: "64x32", T.TX_4X16: "4x16",
        T.TX_16X4: "16x4", T.TX_8X32: "8x32", T.TX_32X8: "32x8",
        T.TX_16X64: "16x64", T.TX_64X16: "64x16"}


def build_lib() -> ctypes.CDLL:
    os.makedirs(BUILD, exist_ok=True)
    glue = os.path.join(BUILD, "glue.c")
    with open(glue, "w") as fh:
        fh.write('#define RTCD_C\n#include "aom_dsp_rtcd.h"\n')
    so = os.path.join(BUILD, "libreftx.so")
    srcs = [glue, f"{REF}/Codec/EbTransforms.c", f"{REF}/Codec/EbFullLoop.c"]
    incs = [f"-I{REF}/Codec", "-I/root/reference/Source/API",
            f"-I{REF}/C_DEFAULT", f"-I{REF}/ASM_SSE2", f"-I{REF}/ASM_SSSE3",
            f"-I{REF}/ASM_SSE4_1", f"-I{REF}/ASM_AVX2"]
    if (not os.path.exists(so)
            or any(os.path.getmtime(s) > os.path.getmtime(so) for s in srcs)):
        subprocess.run(["gcc", "-O2", "-fPIC", "-shared", "-o", so,
                        *srcs, *incs], check=True, capture_output=True)
        # the objects reference SIMD kernels / MD helpers from files we
        # do not compile; none are reachable from the _c entry points we
        # call, but dlopen resolves data relocations eagerly — stub them.
        undef = subprocess.run(
            ["nm", "-D", "--undefined-only", so], check=True,
            capture_output=True, text=True).stdout.split()
        syms = [s for s in undef
                if s not in {"U", "w"} and not s.startswith("_")
                and "@" not in s and s not in dir(ctypes)]
        libc_like = {"memcpy", "memset", "malloc", "free", "calloc",
                     "abort", "log", "log2", "exp", "pow", "sqrt",
                     "lround", "round", "fprintf", "printf", "stderr",
                     "assert", "puts", "rand", "tan", "cos", "sin"}
        syms = [s for s in syms if s not in libc_like]
        stubs = os.path.join(BUILD, "stubs.c")
        with open(stubs, "w") as fh:
            for s in syms:
                fh.write(f"void *{s}[64];\n")
        subprocess.run(["gcc", "-O2", "-fPIC", "-shared", "-o", so,
                        *srcs, stubs, *incs], check=True,
                       capture_output=True)
    return ctypes.CDLL(so)


def types_for(tx_size: int) -> list[int]:
    w, h = T.TX_W[tx_size], T.TX_H[tx_size]
    if max(w, h) == 64:
        return [T.DCT_DCT]
    if max(w, h) == 32:
        return [T.DCT_DCT, T.IDTX]
    return list(range(T.TX_TYPES))


def fwd_c(lib, x: np.ndarray, tx_size: int, tx_type: int,
          bd: int) -> np.ndarray:
    h, w = x.shape
    name = (f"Av1TransformTwoD_{SQ[tx_size]}_c" if tx_size in SQ
            else f"av1_fwd_txfm2d_{RECT[tx_size]}_c")
    fn = getattr(lib, name)
    inp = np.ascontiguousarray(x, np.int16)
    out = np.zeros(h * w, np.int32)
    fn(inp.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
       out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
       ctypes.c_uint32(w), ctypes.c_int(tx_type), ctypes.c_uint8(bd))
    return out.reshape(h, w)


def inv_c(lib, co: np.ndarray, tx_size: int, tx_type: int, bd: int,
          base: np.ndarray) -> np.ndarray:
    h, w = co.shape
    name = f"av1_inv_txfm2d_add_{SQ.get(tx_size, RECT.get(tx_size))}_c"
    fn = getattr(lib, name)
    # dim-64 C entries consume the packed low-band (32-col stride) region
    if max(h, w) == 64:
        ch, cw = min(32, h), min(32, w)
        inp = np.ascontiguousarray(co[:ch, :cw], np.int32)
    else:
        inp = np.ascontiguousarray(co, np.int32)
    out = np.array(base, np.uint16)   # copy: fn adds in place
    args = [inp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            ctypes.c_int32(w), ctypes.c_int(tx_type)]
    if tx_size not in SQ:
        args.append(ctypes.c_int(tx_size))   # rect entries take TxSize
        # most rect entries (not 4x8/8x4/4x16/16x4) also take an unused
        # eob arg (EbTransforms.c:8331-8453)
        if tx_size not in (T.TX_4X8, T.TX_8X4, T.TX_4X16, T.TX_16X4):
            args.append(ctypes.c_int32(h * w))
    args.append(ctypes.c_int32(bd))
    fn(*args)
    return out


def invert_quant(d: int) -> tuple[int, int]:
    """ref invert_quant, EbModeDecisionConfigurationProcess.c:322."""
    t, l = d, 0
    while t > 1:
        t >>= 1
        l += 1
    m = 1 + (1 << (16 + l)) // d
    return m - (1 << 16), 1 << (16 - l)


def quant_tables(q: int, bd: int):
    """y-plane quantizer tables (ref av1_build_quantizer, zero deltas)."""
    dc, ac = tables.dc_q(q, bd), tables.ac_q(q, bd)
    dc3, _ = tables.dc_q(q, bd), 0   # Q3 tables only feed qzbin_factor
    # get_qzbin_factor uses av1_dc_quant_Q3(q,0,bd) = dc_q table * 8ths:
    # Q3 is the pre-TX-scale domain: dc_quant_Q3(q) == dc_qlookup[q]
    quant_q3 = dc3
    thr = {8: 148, 10: 592}[bd]
    qzbin_factor = 64 if q == 0 else (84 if quant_q3 < thr else 80)
    qrounding_factor = 64 if q == 0 else 48
    zbin, rnd, qnt, shift, deq = [], [], [], [], []
    for qv in (dc, ac):
        qq, ss = invert_quant(qv)
        qnt.append(qq)
        shift.append(ss)
        zbin.append((qzbin_factor * qv + 64) >> 7)
        rnd.append((qrounding_factor * qv) >> 7)
        deq.append(qv)
    mk = lambda v: np.array(v + [v[1]] * 6, np.int16)
    return mk(zbin), mk(rnd), mk(qnt), mk(shift), mk(deq)


def quant_c(lib, coeff: np.ndarray, q: int, bd: int, log_scale: int):
    n = coeff.size
    zbin, rnd, qnt, shift, deq = quant_tables(q, bd)
    qcoeff = np.zeros(n, np.int32)
    dqcoeff = np.zeros(n, np.int32)
    eob = ctypes.c_uint16(0)
    scan = np.arange(n, dtype=np.int16)       # identity scan: eob-only diff
    name = ("aom_highbd_quantize_b" if bd > 8 else "aom_quantize_b")
    name += {0: "", 1: "_32x32", 2: "_64x64"}[log_scale]
    name += "_c" if bd > 8 else "_c_II"
    fn = getattr(lib, name)
    i16p = ctypes.POINTER(ctypes.c_int16)
    fn(np.ascontiguousarray(coeff.reshape(-1), np.int32)
       .ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
       ctypes.c_ssize_t(n), ctypes.c_int32(0),
       zbin.ctypes.data_as(i16p), rnd.ctypes.data_as(i16p),
       qnt.ctypes.data_as(i16p), shift.ctypes.data_as(i16p),
       qcoeff.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
       dqcoeff.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
       deq.ctypes.data_as(i16p), ctypes.byref(eob),
       scan.ctypes.data_as(i16p), scan.ctypes.data_as(i16p))
    return qcoeff.reshape(coeff.shape), dqcoeff.reshape(coeff.shape)


def main() -> int:
    lib = build_lib()
    rng = np.random.default_rng(20260820)
    data = {}
    n_vec = 0
    for tx_size in list(SQ) + list(RECT):
        h, w = T.TX_H[tx_size], T.TX_W[tx_size]
        for bd in (8, 10):
            hi = (1 << bd) - 1
            for tx_type in types_for(tx_size):
                for k in range(2):
                    x = rng.integers(-hi, hi + 1, size=(h, w)).astype(np.int16)
                    co = fwd_c(lib, x, tx_size, tx_type, bd)
                    base = rng.integers(0, hi + 1, size=(h, w)).astype(np.uint16)
                    rec = inv_c(lib, co, tx_size, tx_type, bd, base)
                    tag = f"t{tx_size}_y{tx_type}_b{bd}_{k}"
                    data[f"in_{tag}"] = x
                    data[f"co_{tag}"] = co
                    data[f"base_{tag}"] = base
                    data[f"rec_{tag}"] = rec
                    n_vec += 1
    # quant vectors: coefficients from real transforms at three tx sizes
    for tx_size, log_scale in ((T.TX_16X16, 0), (T.TX_32X32, 1),
                               (T.TX_64X64, 2)):
        h, w = T.TX_H[tx_size], T.TX_W[tx_size]
        for bd in (8, 10):
            hi = (1 << bd) - 1
            for q in (8, 60, 120, 200, 255):
                x = rng.integers(-hi, hi + 1, size=(h, w)).astype(np.int16)
                co = fwd_c(lib, x, tx_size, T.DCT_DCT, bd)
                qc, dqc = quant_c(lib, co, q, bd, log_scale)
                tag = f"q{tx_size}_{q}_b{bd}"
                data[f"qin_{tag}"] = co
                data[f"qlv_{tag}"] = qc
                data[f"qdq_{tag}"] = dqc
                n_vec += 1
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **data)
    print(f"wrote {OUT}: {n_vec} vectors, "
          f"{os.path.getsize(OUT) / 1e6:.1f} MB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
