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
# variants; cache them across runs/processes
jax.config.update("jax_compilation_cache_dir", "/tmp/svt_av1_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
