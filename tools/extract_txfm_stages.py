#!/usr/bin/env python3
"""Extract the normative AV1 1-D transform butterfly structure as data.

The AV1 spec defines the integer transforms (§7.13.3 inverse; the forward
transforms are their conventional mirrors) as sequences of butterfly stages.
This script parses the reference snapshot's scalar C implementations of those
normative algorithms (EbTransforms.c av1_{i,f}{dct,adst}N_new) into a compact
stage-table JSON:

    {"idct4": [stage, stage, ...], ...}
    stage = {"kind_per_lane": [...], "a": [...], "b": [...],
             "wa": [[sign, cospi_idx]...], "sa": [...], "sb": [...]}

Lane kinds: "c" copy (y = sa*x[a]), "a" add (y = sa*x[a] + sb*x[b],
clamped on the inverse side), "m" multiply
(y = round_shift(wa*x[a] + wb*x[b], cos_bit), w = sign * cospi[idx]).

The execution engine that consumes these tables (svt_av1_tpu/ops/
transforms.py) is original, vectorized, batched code — the tables are
behavioral data describing spec-mandated arithmetic.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

FUNCS = {
    # name in EbTransforms.c -> our key
    "av1_idct4_new": "idct4",
    "av1_idct8_new": "idct8",
    "av1_idct16_new": "idct16",
    "av1_idct32_new": "idct32",
    "av1_idct64_new": "idct64",
    "av1_iadst8_new": "iadst8",
    "av1_iadst16_new": "iadst16",
    "av1_fdct4_new": "fdct4",
    "av1_fdct8_new": "fdct8",
    "av1_fdct16_new": "fdct16",
    "av1_fdct32_new": "fdct32",
    "av1_fdct64_new": "fdct64",
    "av1_fadst8_new": "fadst8",
    "av1_fadst16_new": "fadst16",
}

_STMT = re.compile(r"bf1\[(\d+)\]\s*=\s*([^;]+);", re.S)
_HALF_BTF = re.compile(
    r"half_btf\(\s*(-?)cospi\[(\d+)\]\s*,\s*(?:bf0|input)\[(\d+)\]\s*,\s*"
    r"(-?)cospi\[(\d+)\]\s*,\s*(?:bf0|input)\[(\d+)\]\s*,\s*cos_bit\s*\)"
)
_CLAMP = re.compile(
    r"clamp_value\(\s*(-?)\s*(?:bf0|input)\[(\d+)\]\s*([+-])\s*(?:bf0|input)\[(\d+)\]\s*,"
)
_ADD = re.compile(
    r"^\s*(-?)\s*(?:bf0|input)\[(\d+)\]\s*([+-])\s*(?:bf0|input)\[(\d+)\]\s*$"
)
_COPY = re.compile(r"^\s*(-?)\s*(?:bf0|input)\[(\d+)\]\s*$")


def _fn_body(text: str, name: str) -> str:
    m = re.search(r"void\s+" + re.escape(name) + r"\s*\(", text)
    if not m:
        raise KeyError(name)
    start = text.index("{", m.end())
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                return text[start : i + 1]
    raise ValueError(name)


def _strip_comments(s: str) -> str:
    s = re.sub(r"/\*.*?\*/", "", s, flags=re.S)
    return re.sub(r"//[^\n]*", "", s)


def parse_fn(text: str, name: str, size: int):
    body = _strip_comments(_fn_body(text, name))
    chunks = body.split("stage++;")[1:]  # text after each stage boundary
    stages = []
    for chunk in chunks:
        lanes = {}
        for m in _STMT.finditer(chunk):
            out_i = int(m.group(1))
            rhs = m.group(2).strip()
            hb = _HALF_BTF.search(rhs)
            if hb:
                sa, wa, a, sb, wb, b = hb.groups()
                lanes[out_i] = ("m", int(a), int(b),
                                [-1 if sa else 1, int(wa)],
                                [-1 if sb else 1, int(wb)])
                continue
            cl = _CLAMP.search(rhs)
            if cl:
                neg, a, op, b = cl.groups()
                sa = -1 if neg else 1
                sb = -1 if op == "-" else 1
                lanes[out_i] = ("a", int(a), int(b), sa, sb)
                continue
            ad = _ADD.match(rhs)
            if ad:
                neg, a, op, b = ad.groups()
                sa = -1 if neg else 1
                sb = -1 if op == "-" else 1
                lanes[out_i] = ("a", int(a), int(b), sa, sb)
                continue
            cp = _COPY.match(rhs)
            if cp:
                neg, a = cp.groups()
                lanes[out_i] = ("c", int(a), int(a), -1 if neg else 1, 0)
                continue
            raise ValueError(f"{name}: unparsed statement: bf1[{out_i}] = {rhs}")
        if not lanes:
            continue
        if sorted(lanes) != list(range(size)):
            raise ValueError(f"{name}: stage covers lanes {sorted(lanes)}")
        stages.append([lanes[i] for i in range(size)])
    if not stages:
        raise ValueError(f"{name}: no stages parsed")
    return stages


def main() -> int:
    ref = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference")
    text = (ref / "Source/Lib/Common/Codec/EbTransforms.c").read_text()
    out = {}
    for cname, key in FUNCS.items():
        size = int(re.search(r"\d+", key).group())
        out[key] = parse_fn(text, cname, size)
        print(f"  {key}: {len(out[key])} stages")
    dst = (Path(__file__).resolve().parents[1]
           / "svt_av1_tpu/tables/data/txfm_stages.json")
    dst.write_text(json.dumps(out))
    print(f"wrote {dst} ({dst.stat().st_size} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
