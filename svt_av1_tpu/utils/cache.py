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
import os
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


def repo_tpu_cache_dir() -> str:
    """Repo-committed TPU compile-cache directory.

    TPU executables are produced by the device compiler and do not embed
    host-CPU features, so (unlike the XLA:CPU entries above) they are
    portable across hosts that share the jax/XLA build and device kind —
    which is exactly the driver-benchmark situation: a fresh container,
    the same image, the same chip.  Shipping the cache in the repo is
    the moral equivalent of the reference pre-building its kernels at
    package time (EbEncHandle.c:917 installs every kernel pointer at
    init): without it, each cold remote compile costs minutes and lands
    inside the driver's wall-clock budget.

    Overridable via SVT_TPU_CACHE_DIR (tests, foreign checkouts)."""
    env = os.environ.get("SVT_TPU_CACHE_DIR")
    if env:
        return env
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, ".jax_cache", "tpu")


def setup_jax_cache(jax) -> str:
    """Point jax's persistent compile cache at the right directory for
    the active backend: the repo-committed dir on TPU-like backends, the
    CPU-feature-keyed /tmp dir on CPU.  Returns the chosen dir."""
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "cpu"
    d = jax_cache_dir() if backend == "cpu" else repo_tpu_cache_dir()
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return d
