"""Guard the driver benchmark contract.

Round 3 shipped BENCH_r03.json rc=124/parsed:null because bench.py
printed nothing until every config finished.  This test proves, on every
fast-tier run, that `bench.py --smoke` emits a parseable driver JSON
line within a strict wall-clock budget, and that the full-mode module
wires the watchdog + headline-first ordering (static checks, no run).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _parse_json_lines(text: str):
    out = []
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return out


def test_smoke_prints_contract_json_fast():
    env = dict(os.environ)
    env["SVT_BENCH_PLATFORM"] = "cpu"
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--smoke"],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO)
    assert p.returncode == 0, p.stderr[-2000:]
    objs = _parse_json_lines(p.stdout)
    assert objs, f"no JSON line on stdout: {p.stdout!r}"
    o = objs[-1]
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in o, f"missing {key}: {o}"
    assert isinstance(o["value"], (int, float)) and o["value"] > 0


def test_full_mode_emits_headline_before_extras():
    """Static shape of main(): headline measured and emitted before any
    extra config runs, under a SIGALRM watchdog."""
    src = open(os.path.join(REPO, "bench.py")).read()
    i_alarm = src.index("signal.alarm")
    i_headline = src.index("run_hierb_1080p, remaining")
    i_first_emit = src.index("_emit()                            # land the number NOW")
    i_extras = src.index("run_intra_480p, ")
    assert i_alarm < i_headline < i_first_emit < i_extras
