"""Test configuration: force an 8-device virtual CPU platform (the TPU-world
"fake backend" per SURVEY.md §4) and enable x64.

The axon environment registers a TPU backend via sitecustomize and sets
jax_platforms programmatically (env vars alone are overridden), so the config
update below must happen before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import slampp_tpu  # noqa: E402,F401  (enables x64 at import)


# ---------------------------------------------------------------- quick tier
# One representative test per subsystem (pytest -m quick, target < 90 s) —
# runs on every commit; the full suite stays the pre-snapshot gate.
_QUICK = {
    ("test_containers", "test_block_sparse_matrix_ops"),
    ("test_geometry", "test_se2_jacobians_match_autodiff"),
    ("test_solvers_se2", "test_parser_manhattan_roundtrip"),
    ("test_solvers_se2", "test_gn_reduces_chi2_and_matches_scipy_oracle"),
    ("test_partitioned", "test_v3_exact_matches_dense_oracle[120-16]"),
    ("test_schur_sparse", "test_sparse_schur_step_matches_dense_oracle"),
    ("test_marginals", "test_dense_marginals_is_inverse"),
    ("test_mvg", "test_triangulation_exact"),
    ("test_sim3_robust", "test_sim3_compose_inverse"),
    ("test_block_unit", "test_random_gemm_vs_dense"),
    ("test_block_unit", "test_random_block_cholesky_vs_dense"),
    ("test_rocv_spheron", "test_rocv_end_to_end"),
}


# ---------------------------------------------------------------- slow tier
# Subprocess-heavy / multi-minute tests: excluded from the MEDIUM tier
# (pytest -m "not slow", target < 5 min — the per-feature iteration gate);
# the full suite (with them) remains the pre-snapshot gate.
_SLOW_MODULES = {
    "test_bench_smoke",     # spawns 3 bench child processes (compiles)
    "test_mesh_scaling",    # 10-rep subprocess scaling run
    "test_examples",        # runs every example script end-to-end
}

# individual multi-minute tests (mostly multichip shard_map compiles that
# the driver's dryrun_multichip exercises anyway)
_SLOW_TESTS = {
    ("test_distributed", "test_graft_dryrun_multichip"),        # 144 s
    ("test_distributed_ba", "test_distributed_ba_step_matches_single_device"),  # 100 s
    ("test_distributed", "test_distributed_gn_matches_single_device"),  # 47 s
    ("test_incremental_windowed", "test_windowed_live_system_is_bounded"),  # 35 s
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        keys = {(mod, item.name), (mod, item.name.split("[")[0])}
        if keys & _QUICK:
            item.add_marker(_pytest.mark.quick)
        if mod in _SLOW_MODULES or keys & _SLOW_TESTS:
            item.add_marker(_pytest.mark.slow)
