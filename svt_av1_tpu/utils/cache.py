"""Machine-keyed JAX persistent-compile-cache location.

XLA:CPU serializes AOT executables with the COMPILE machine's feature
set; loading them on a host with different features is only a warning
("This could lead to execution errors such as SIGILL") — and in
practice segfaulted the test suite and produced bit-different encodes
when a cache written on an avx512/amx machine was read on a plainer
host.  Keying the cache directory by a hash of the local CPU features
makes foreign entries invisible instead of fatal.
"""

from __future__ import annotations

import hashlib
import platform


def _cpu_key() -> str:
    feats = ""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    feats = line
                    break
    except OSError:
        pass
    raw = f"{platform.machine()}|{feats}".encode()
    return hashlib.sha256(raw).hexdigest()[:12]


def jax_cache_dir(base: str = "/tmp/svt_av1_tpu_jax_cache") -> str:
    return f"{base}_{_cpu_key()}"
