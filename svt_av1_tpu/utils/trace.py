"""Encoder stage tracing: a chrome://tracing-compatible timeline.

The reference has only ad-hoc fprintf tracing (commented out in
AssignEncDecSegments, EbEncDecProcess.c:407) plus app-side wall-clock
(EbTime.c).  SURVEY §5 names a per-stage timeline as the TPU
equivalent; this module provides it: ``Tracer`` records (stage, t0, t1)
spans per frame and dumps Chrome trace-event JSON (load in
chrome://tracing or Perfetto).

Enable with ``SVT_TRACE=/path/out.json`` in the environment or by
passing a Tracer to the encoder; zero overhead when disabled (the
module-level ``span`` no-ops).
"""

from __future__ import annotations

import json
import os
import threading
import time
from contextlib import contextmanager
from typing import Optional


class Tracer:
    def __init__(self) -> None:
        self.events: list = []
        self._lock = threading.Lock()
        self._t0 = time.perf_counter()

    @contextmanager
    def span(self, stage: str, frame: Optional[int] = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            t1 = time.perf_counter()
            with self._lock:
                self.events.append({
                    "name": stage,
                    "cat": "encode",
                    "ph": "X",
                    "ts": (t0 - self._t0) * 1e6,
                    "dur": (t1 - t0) * 1e6,
                    "pid": 0,
                    "tid": threading.get_ident() % 10000,
                    "args": {} if frame is None else {"frame": frame},
                })

    def summary(self) -> dict:
        """Total wall-clock per stage (seconds)."""
        out: dict = {}
        for e in self.events:
            out[e["name"]] = out.get(e["name"], 0.0) + e["dur"] / 1e6
        return out

    def dump(self, path: str) -> None:
        with open(path, "w") as fh:
            json.dump({"traceEvents": self.events}, fh)


class _Noop:
    @contextmanager
    def span(self, stage: str, frame: Optional[int] = None):
        yield

    def summary(self) -> dict:
        return {}

    def dump(self, path: str) -> None:
        pass


_GLOBAL: Optional[Tracer] = None


def global_tracer():
    """Process-wide tracer, enabled by the SVT_TRACE env var (value =
    output path, written at interpreter exit)."""
    global _GLOBAL
    if _GLOBAL is None:
        path = os.environ.get("SVT_TRACE")
        if path:
            _GLOBAL = Tracer()
            import atexit
            atexit.register(lambda: _GLOBAL.dump(path))
        else:
            _GLOBAL = _Noop()  # type: ignore[assignment]
    return _GLOBAL
