"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on a virtual CPU mesh (same XLA partitioner), and the driver
separately dry-runs the multi-chip path (see __graft_entry__.py).

Note: the environment's sitecustomize imports jax at interpreter startup
with JAX_PLATFORMS=axon (a tunneled TPU backend), so env vars set here are
too late — the backend must be forced via jax.config before any device is
initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite compiles many (geometry, path)
# variants; cache them across runs/processes.  The dir is keyed by the
# host CPU's feature set: XLA:CPU AOT results from a DIFFERENT machine
# load with only a warning and then segfault (observed: zstandard
# put_executable crash + bit-level result drift from avx512-built
# executables on a non-avx512 host).
from svt_av1_tpu.utils.cache import jax_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", jax_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
