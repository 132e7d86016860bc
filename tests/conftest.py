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

# ---------------------------------------------------------------------------
# fast/slow tiers: `-m "not slow"` is the CI-speed subset run before
# every commit; the names below measured >30 s on the 1-core reference
# box (pytest --durations, round 4).  New expensive e2e tests should be
# added here or marked slow directly.
import pytest  # noqa: E402

_SLOW = (
    "test_rdo.py", "test_restoration.py", "test_bd10.py",
    "test_parallel.py", "test_warp.py", "test_tiles.py",
    "test_intra_part16.py", "test_multistream.py",
    # round-5 re-tier (VERDICT: fast tier <= 3 min): the six largest
    # fast-tier tests by measured --durations move to slow; the paths
    # they cover keep smaller fast-tier guards (hier e2e, delta-q unit,
    # entropy-backend parity, film grain 8-bit, conformance pass)
    "test_multiref.py::test_three_ref_hier_bit_exact",
    "test_rect.py::test_rect_hier_b_compound_bitexact",
    "test_delta_q.py::test_delta_q_hier_bit_exact_and_signaled",
    "test_rate_control.py::test_model_rc_converges",
    "test_film_grain.py::test_film_grain_10bit_e2e",
    "test_conformance.py::test_checker_catches_seeded_corruption",
    "test_rect.py::test_rect_ippp_bitexact",
    "test_rect.py::test_device_step_picks_rect_leaves",
    "test_rate_control.py::test_vbr_converges_and_parity",
    "test_rate_control.py::test_vbr_intra_only_batch",
    "test_rate_control.py::test_gop_rc_hier_vbr_hits_target",
    "test_aux.py::test_gop_retry_recovers",
    "test_aux.py::test_adaptive_quantization_e2e",
    "test_lookahead.py::test_lookahead_e2e_bit_exact_varying_q",
    "test_deblock.py::test_e2e_deblock_parity",
    "test_cdef.py::test_e2e_cdef_parity",
    "test_film_grain.py::test_film_grain_e2e_output_parity",
    "test_ibc.py::test_ibc_keyframe_then_inter",
    "test_conformance.py::test_streams_pass_independent_checker",
    "test_inter.py::test_ippp_keyframe_interval",
    "test_inter.py::test_global_motion_e2e",
    "test_hier.py::test_hier_keyframe_interval_flushes_gop",
    "test_multiref.py::test_multi_ref_improves_or_matches_rate",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(tag in item.nodeid for tag in _SLOW):
            item.add_marker(pytest.mark.slow)
