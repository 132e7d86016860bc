"""Validate normative AV1 constant tables and generated scan orders.

Mirrors the reference's AdaptiveScanTest (test/AdaptiveScanTest.cc): scan
tables must match the spec data tables exactly.
"""

import re
from pathlib import Path

import numpy as np
import pytest

from svt_av1_tpu import tables

REF = Path("/root/reference/Source/Lib/Common/Codec/EbTransforms.h")

# spec Default_Scan_4x4 (AV1 spec section "Scan tables")
SPEC_SCAN_4X4 = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]


def test_cdf_tables_load_and_are_valid():
    t = tables.spec_tables()
    assert t["default_kf_y_mode_cdf"].shape == (5, 5, 13)
    assert t["av1_default_coeff_base_multi_cdfs"].shape == (4, 5, 2, 42, 4)
    # every CDF must be strictly increasing up to 32768 over its valid prefix
    for name, arr in t.items():
        if not name.endswith(("_cdf", "_cdfs")):
            continue
        flat = arr.reshape(-1, arr.shape[-1]).astype(np.int64)
        assert flat[..., -1].max() == 32768, name
        d = np.diff(flat, axis=-1)
        assert (d >= 0).all(), name  # non-decreasing (padding repeats 32768)


def test_qlookup_spec_values():
    # known anchors from the AV1 spec dc_q/ac_q tables
    assert tables.dc_q(0, 8) == 4
    assert tables.dc_q(255, 8) == 1336
    assert tables.ac_q(255, 8) == 1828
    assert tables.ac_q(0, 10) == 4
    assert tables.dc_q(255, 10) == 5347


def test_cospi():
    c = tables.cospi_arr(12)
    assert c[0] == 4096 and c[1] == 4095 and c[32] == 2896
    c13 = tables.cospi_arr(13)
    assert c13[0] == 8192 and c13[32] == 5793  # NewSqrt2 anchor


def test_scan_4x4_matches_spec():
    assert tables.default_scan(4, 4).tolist() == SPEC_SCAN_4X4


def _parse_ref_scan(name: str):
    text = REF.read_text()
    m = re.search(re.escape(name) + r"\[\d+\]\)\s*=\s*\{([^}]*)\}", text, re.S)
    if not m:
        return None
    return [int(v) for v in re.findall(r"\d+", m.group(1))]


@pytest.mark.skipif(not REF.exists(), reason="reference snapshot not mounted")
@pytest.mark.parametrize(
    "name,rows,cols",
    [
        ("default_scan_4x4", 4, 4),
        ("default_scan_8x8", 8, 8),
        ("default_scan_16x16", 16, 16),
        ("default_scan_32x32", 32, 32),
        ("default_scan_4x8", 8, 4),   # ref naming: 4 cols x 8 rows
        ("default_scan_8x4", 4, 8),
        ("default_scan_8x32", 32, 8),
        ("default_scan_16x8", 8, 16),
    ],
)
def test_scan_matches_reference_spec_tables(name, rows, cols):
    ref = _parse_ref_scan(name)
    if ref is None:
        pytest.skip(f"{name} not in reference header")
    got = tables.default_scan(rows, cols).tolist()
    assert got == ref, name


def test_mrow_mcol_scans():
    assert tables.row_scan(4, 8).tolist() == list(range(32))
    assert tables.col_scan(2, 3).tolist() == [0, 3, 1, 4, 2, 5]
