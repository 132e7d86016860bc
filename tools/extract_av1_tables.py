#!/usr/bin/env python3
"""Extract normative AV1-specification constant tables into a binary .npz.

The AV1 bitstream specification (AoM, "AV1 Bitstream & Decoding Process
Specification") normatively defines large constant tables — default symbol
CDFs (spec §, Default CDF tables) and quantizer step lookup tables (spec
§7.12.2 dc_q/ac_q).  Every conformant AV1 codec ships bit-identical values.

This script reads those *numeric constants* out of the reference snapshot's
data files (EbCabacContextModel.c, EbModeDecisionConfigurationProcess.c —
themselves copies of the spec tables) and stores them as plain numpy arrays
in ``svt_av1_tpu/tables/data/av1_tables.npz``.  Only data is extracted; all
code in this repository that consumes the tables is original.

CDF representation convention in the .npz:
  * arrays are uint16 with trailing axis = max_symbols
  * entry [..., i] is the *cumulative* probability Q15 of symbols <= i
    (the AOM_CDFn macro arguments, with the implicit final 32768 included)
  * contexts with fewer than max_symbols valid symbols are padded with 32768
  * adaptation counters are NOT stored (runtime model initializes to 0)

Run:  python tools/extract_av1_tables.py [--reference /root/reference]
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

import numpy as np

# (c_table_name, leading_shape, max_nsym)
CDF_MANIFEST = [
    ("default_kf_y_mode_cdf", (5, 5), 13),
    ("default_angle_delta_cdf", (8,), 7),
    ("default_uv_mode_cdf", (2, 13), 14),
    ("default_partition_cdf", (20,), 10),
    ("default_skip_cdfs", (3,), 2),
    ("default_intra_ext_tx_cdf", (3, 4, 13), 16),
    ("default_inter_ext_tx_cdf", (4, 4), 16),
    ("default_tx_size_cdf", (4, 3), 3),
    ("default_delta_q_cdf", (1,), 4),
    ("default_filter_intra_mode_cdf", (1,), 5),
    ("default_filter_intra_cdfs", (22,), 2),  # BlockSizes in this snapshot
    ("default_intrabc_cdf", (1,), 2),
    ("default_cfl_sign_cdf", (1,), 8),
    ("default_cfl_alpha_cdf", (6,), 16),
    # coefficient coding families (q-context dependent, TOKEN_CDF_Q_CTXS=4)
    ("av1_default_dc_sign_cdfs", (4, 2, 3), 2),
    ("av1_default_txb_skip_cdfs", (4, 5, 13), 2),
    ("av1_default_eob_extra_cdfs", (4, 5, 2, 22), 2),
    ("av1_default_eob_multi16_cdfs", (4, 2, 2), 5),
    ("av1_default_eob_multi32_cdfs", (4, 2, 2), 6),
    ("av1_default_eob_multi64_cdfs", (4, 2, 2), 7),
    ("av1_default_eob_multi128_cdfs", (4, 2, 2), 8),
    ("av1_default_eob_multi256_cdfs", (4, 2, 2), 9),
    ("av1_default_eob_multi512_cdfs", (4, 2, 2), 10),
    ("av1_default_eob_multi1024_cdfs", (4, 2, 2), 11),
    ("av1_default_coeff_lps_multi_cdfs", (4, 5, 2, 21), 4),
    ("av1_default_coeff_base_multi_cdfs", (4, 5, 2, 42), 4),
    ("av1_default_coeff_base_eob_multi_cdfs", (4, 5, 2, 4), 3),
    # inter symbol families (spec Default CDF tables)
    ("default_if_y_mode_cdf", (4,), 13),
    ("default_newmv_cdf", (6,), 2),
    ("default_zeromv_cdf", (2,), 2),
    ("default_refmv_cdf", (6,), 2),
    ("default_drl_cdf", (3,), 2),
    ("default_intra_inter_cdf", (4,), 2),
    ("default_comp_inter_cdf", (5,), 2),
    ("default_single_ref_cdf", (3, 6), 2),
    ("default_comp_ref_cdf", (3, 3), 2),
    ("default_comp_bwdref_cdf", (3, 2), 2),
    ("default_comp_ref_type_cdf", (5,), 2),
    ("default_uni_comp_ref_cdf", (3, 3), 2),
    ("default_skip_mode_cdfs", (3,), 2),
    ("default_switchable_interp_cdf", (16,), 3),
    ("default_switchable_restore_cdf", (1,), 3),
    ("default_wiener_restore_cdf", (1,), 2),
    ("default_sgrproj_restore_cdf", (1,), 2),
    ("default_inter_compound_mode_cdf", (8,), 8),
    ("default_motion_mode_cdf", (22,), 3),
    ("default_obmc_cdf", (22,), 2),
    ("default_compound_idx_cdfs", (6,), 2),
    ("default_comp_group_idx_cdfs", (6,), 2),
    ("default_txfm_partition_cdf", (21,), 2),
]

# nmv_context struct members, in declaration-order of their AOM_CDF macros
# within `default_nmv_context` (EbCabacContextModel.c:899): per component —
# classes(11), class0_fp 2x(4), fp(4), sign(2), class0_hp(2), hp(2),
# class0(2), bits 10x(2); preceded by joints(4).
NMV_MEMBERS = [
    ("nmv_classes", 1, 11),
    ("nmv_class0_fp", 2, 4),
    ("nmv_fp", 1, 4),
    ("nmv_sign", 1, 2),
    ("nmv_class0_hp", 1, 2),
    ("nmv_hp", 1, 2),
    ("nmv_class0", 1, 2),
    ("nmv_bits", 10, 2),
]


def parse_nmv_context(text: str) -> dict:
    """Extract default_nmv_context struct into nmv_* arrays ([2, ...] comps)."""
    m = re.search(r"default_nmv_context\s*=\s*\{", text)
    start = text.index("{", m.start())
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                block = text[start : i + 1]
                break
    cdfs = []
    for mm in re.finditer(r"AOM_CDF(\d+)\s*\(([^)]*)\)", block):
        k = int(mm.group(1))
        vals = [eval(v.strip(), {}, {})
                for v in mm.group(2).replace("\n", " ").split(",") if v.strip()]
        assert len(vals) == k - 1
        cdfs.append((k, vals))
    per_comp = sum(n for _, n, _ in NMV_MEMBERS)
    assert len(cdfs) == 1 + 2 * per_comp, len(cdfs)
    out = {}
    k, vals = cdfs[0]
    assert k == 4
    out["nmv_joints"] = np.array([vals + [32768]], np.uint16).reshape(4)
    idx = 1
    comp_data = {name: [] for name, _, _ in NMV_MEMBERS}
    for _comp in range(2):
        for name, count, nsym in NMV_MEMBERS:
            rows = []
            for _ in range(count):
                k, vals = cdfs[idx]
                idx += 1
                assert k == nsym, (name, k, nsym)
                rows.append(vals + [32768])
            comp_data[name].append(rows)
    for name, count, nsym in NMV_MEMBERS:
        arr = np.array(comp_data[name], np.uint16)  # [2, count, nsym]
        out[name] = arr[:, 0] if count == 1 else arr
    return out

# plain int16 tables: (c_name, out_name, length)
QLOOKUP_MANIFEST = [
    ("dc_qlookup_Q3", "dc_qlookup_8", 256),
    ("dc_qlookup_10_Q3", "dc_qlookup_10", 256),
    ("dc_qlookup_12_Q3", "dc_qlookup_12", 256),
    ("ac_qlookup_Q3", "ac_qlookup_8", 256),
    ("ac_qlookup_10_Q3", "ac_qlookup_10", 256),
    ("ac_qlookup_12_Q3", "ac_qlookup_12", 256),
]

_CDF_OR_ZERO = re.compile(r"AOM_CDF(\d+)\s*\(([^)]*)\)|\{\s*0\s*\}", re.S)


def _table_block(text: str, name: str) -> str:
    """Return the initializer text of `name[...] = { ... };`."""
    m = re.search(re.escape(name) + r"\s*\[", text)
    if not m:
        raise KeyError(f"table {name} not found")
    eq = text.index("=", m.end())
    start = text.index("{", eq)
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                return text[start : i + 1]
    raise ValueError(f"unbalanced braces in {name}")


def parse_cdf_table(text: str, name: str, shape, nsym: int) -> np.ndarray:
    block = _table_block(text, name)
    records = []
    for m in _CDF_OR_ZERO.finditer(block):
        if m.group(1) is None:  # "{ 0 }" placeholder (unused context)
            records.append([32768] * nsym)
            continue
        k = int(m.group(1))
        def _ev(tok: str) -> int:  # plain int or "a * b" product (dc_sign tables)
            parts = [int(p) for p in tok.split("*")]
            v = 1
            for p in parts:
                v *= p
            return v

        vals = [_ev(v) for v in m.group(2).replace("\n", " ").split(",") if v.strip()]
        assert len(vals) == k - 1, (name, k, vals)
        cum = vals + [32768] * (nsym - len(vals))
        assert all(0 < c <= 32768 for c in cum), (name, cum)
        assert all(a < b for a, b in zip(vals, vals[1:])), (name, vals)
        records.append(cum)
    want = int(np.prod(shape))
    if len(records) != want:
        raise ValueError(f"{name}: parsed {len(records)} cdfs, expected {want}")
    return np.array(records, dtype=np.uint16).reshape(*shape, nsym)


def parse_int_table(text: str, name: str, length: int) -> np.ndarray:
    block = _table_block(text, name)
    block = re.sub(r"//[^\n]*", "", block)   # strip line comments
    vals = [int(v) for v in re.findall(r"-?\d+", block)]
    if len(vals) != length:
        raise ValueError(f"{name}: parsed {len(vals)} ints, expected {length}")
    return np.array(vals, dtype=np.int32)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument(
        "--out",
        default=str(Path(__file__).resolve().parents[1]
                    / "svt_av1_tpu/tables/data/av1_tables.npz"),
    )
    args = ap.parse_args()

    ref = Path(args.reference)
    cabac = (ref / "Source/Lib/Common/Codec/EbCabacContextModel.c").read_text()
    mdconf = (
        ref / "Source/Lib/Common/Codec/EbModeDecisionConfigurationProcess.c"
    ).read_text()
    interp = (ref / "Source/Lib/Common/Codec/EbInterPrediction.c").read_text()

    out = {}
    for name, shape, nsym in CDF_MANIFEST:
        out[name] = parse_cdf_table(cabac, name, shape, nsym)
        print(f"  {name}: {out[name].shape}")
    for cname, oname, length in QLOOKUP_MANIFEST:
        out[oname] = parse_int_table(mdconf, cname, length)
        print(f"  {oname}: {out[oname].shape}")
    for name, arr in parse_nmv_context(cabac).items():
        out[name] = arr
        print(f"  {name}: {arr.shape}")
    # normative interpolation-filter kernels (spec Subpel_Filters; 16 phases x 8 taps)
    for cname, oname in (("sub_pel_filters_8", "subpel_filters_regular"),
                         ("sub_pel_filters_4", "subpel_filters_regular_4"),
                         ("sub_pel_filters_8smooth", "subpel_filters_smooth"),
                         ("sub_pel_filters_8sharp", "subpel_filters_sharp"),
                         ("sub_pel_filters_4smooth",
                          "subpel_filters_smooth_4")):
        out[oname] = parse_int_table(interp, cname, 16 * 8).reshape(16, 8)
        print(f"  {oname}: {out[oname].shape}")
    # film grain gaussian sequence (spec Gaussian_Sequence, 2048 entries)
    grain = (ref / "Source/Lib/Common/Codec/grainSynthesis.c").read_text()
    out["gaussian_sequence"] = parse_int_table(grain, "gaussian_sequence",
                                               2048)
    print(f"  gaussian_sequence: {out['gaussian_sequence'].shape}")
    # warped-motion tables (spec 7.11.3.7 Warp_Filter — 193 phases x 8
    # taps — and the spec Division table div_lut, 257 entries).  The
    # initializer holds a PREC_BITS==6 and a PREC_BITS==5 branch under
    # #if/#else (the build uses 6) and writes negatives as "- 1".
    warp = (ref / "Source/Lib/Common/Codec/EbWarpedMotion.c").read_text()
    wblk = _table_block(warp, "warped_filter")
    wblk = wblk[: wblk.index("#elif")]
    wblk = re.sub(r"//[^\n]*", "", wblk)
    wvals = [int(v.replace(" ", ""))
             for v in re.findall(r"-?\s*\d+", wblk)]
    assert len(wvals) == 193 * 8 + 1, len(wvals)   # +1: the "#if ... 6"
    out["warped_filter"] = np.array(wvals[1:], np.int32).reshape(193, 8)
    print(f"  warped_filter: {out['warped_filter'].shape}")
    out["warp_div_lut"] = parse_int_table(warp, "div_lut", 257)
    print(f"  warp_div_lut: {out['warp_div_lut'].shape}")

    outp = Path(args.out)
    outp.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(outp, **out)
    print(f"wrote {outp} ({outp.stat().st_size} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
