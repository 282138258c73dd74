#!/usr/bin/env python
"""TPU smoke-test tier — MUST pass on the real chip before any snapshot
commit (the analog of the reference's in-binary unit tests, `-rmut`,
src/slam_app/Main.cpp:89-98; VERDICT round-2 item #2).

Runs in a few minutes on warm caches:
  1. Pallas dense kernels vs the lax oracle (Cholesky + TRSM)
  2. grouped segment reductions vs a NumPy oracle at 1e5 scale
  3. v3 fused Manhattan-500 solve with a chi2 pin vs the f64 CPU oracle
  4. a BigBASolver LM step at ~50k observations (chi2 decreases)
  5. __graft_entry__.entry() compiles (optional: SMOKE_SKIP_ENTRY=1)

Usage:  timeout 1800 python scripts/tpu_smoke.py     (exit 0 = pass)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import slampp_tpu  # noqa: F401  (x64)
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

FAILURES = []


def check(name, fn):
    t0 = time.perf_counter()
    try:
        fn()
        print(f"[smoke] {name}: PASS ({time.perf_counter() - t0:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        FAILURES.append(name)
        print(f"[smoke] {name}: FAIL ({e!r:.300s})", flush=True)


def smoke_device():
    dev = jax.devices()[0]
    assert dev.platform != "cpu", f"smoke tier must run on the TPU, got {dev}"
    print(f"[smoke] device: {dev}", flush=True)


def smoke_pallas_kernels():
    from slampp_tpu.ops import dense_kernels as dk

    rng = np.random.default_rng(0)
    K, M = 4, dk.PB
    A = rng.normal(size=(K, M, M))
    A = A @ A.transpose(0, 2, 1) + M * np.eye(M)
    Aj = jnp.asarray(A, jnp.float32)
    L = jax.jit(dk.chol_batched)(Aj)
    L_ref = jax.vmap(jax.lax.linalg.cholesky)(Aj)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref), atol=2e-3)
    B = jnp.asarray(rng.normal(size=(K, M, 8)), jnp.float32)
    X = jax.jit(dk.trsm_lower_batched)(L, B)
    X_ref = jax.vmap(
        lambda l, b: jax.lax.linalg.triangular_solve(l, b, left_side=True, lower=True)
    )(L_ref, B)
    np.testing.assert_allclose(np.asarray(X), np.asarray(X_ref), atol=2e-2)


def smoke_grouped_segsum():
    from slampp_tpu.ops.segments import grouped_segsum_last, plan_grouped_segments

    rng = np.random.default_rng(1)
    m, n = 100_000, 503
    ids = np.sort(rng.integers(0, n, m))
    starts = np.searchsorted(ids, np.arange(n))
    ends = np.searchsorted(ids, np.arange(n) + 1)
    data = rng.normal(size=(12, m))
    ref = np.zeros((12, n))
    np.add.at(ref.T, ids, data.T)
    plan = plan_grouped_segments(starts, ends, m)
    out = jax.jit(lambda d: grouped_segsum_last(d, plan))(jnp.asarray(data))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-9)


def smoke_v3_manhattan():
    import tempfile

    from slampp_tpu.io.datasets import make_manhattan
    from slampp_tpu.io.parser import build_system, parse_file
    from slampp_tpu.linear.partitioned import PartitionedSolver

    text, _ = make_manhattan(n_poses=500, loop_prob=0.1, seed=0)
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        system = build_system(parse_file(path))
    finally:
        os.unlink(path)
    ps = PartitionedSolver(system, mixed_precision=True, refine_iters=0)
    ps.symbolic()
    graph = system.snapshot()
    states, dxn, chi2_init, chi2_final = ps.optimize_fused(graph, n_iters=5)
    chi2_final = float(chi2_final)
    # f64 oracle chi2 for this exact generated graph (verified on CPU:
    # PartitionedSolver mixed_precision=False, 5 fused GN iterations)
    expected = 26.095453
    assert abs(chi2_final - expected) / expected < 5e-3, (
        f"chi2 {chi2_final} != pinned {expected}")


def smoke_big_ba_step():
    from slampp_tpu.io.datasets import make_venice_ba_arrays
    from slampp_tpu.linear.ba_schur import BigBASolver

    cams, lms, oc, ol, uv, info, _ = make_venice_ba_arrays(
        n_cams=100, n_points=8000, mean_track=6, seed=0
    )
    solver = BigBASolver.from_arrays(cams, lms, oc, ol, uv, info, sc_f64=False)
    solver._make_step()
    chi0 = float(solver._chi2_fn(solver.plan, solver._cams, solver._lms))
    nc, nl, dxn, chi2, denom = solver._step(solver._cams, solver._lms, 1e-3)
    chi1 = float(solver._chi2_fn(solver.plan, nc, nl))
    assert np.isfinite(chi1) and chi1 < chi0, f"BA step did not descend: {chi0} -> {chi1}"


def smoke_venice_full_scale_compiles():
    """COMPILE the BA step at the FULL venice871 shape (871 cams, 1.1M
    observations).  The round-3 failure was a compile-time memory-assignment
    OOM (an 18 GB tiled broadcast) that the 50k-obs smoke could not see —
    the smoke must cover the shape the round is graded on (VERDICT r3 #3).
    Compile-only: no 16 GB of live observation data is touched."""
    from slampp_tpu.io.datasets import make_venice_ba_arrays
    from slampp_tpu.linear.ba_schur import (
        ba_schur_lm_step,
        build_ba_schur_plan_arrays,
    )

    cams, lms, oc, ol, uv, info, _ = make_venice_ba_arrays(
        n_cams=871, n_points=110_000, mean_track=10, seed=0
    )
    plan = build_ba_schur_plan_arrays(871, len(lms), oc, ol, uv, info)
    step = jax.jit(ba_schur_lm_step, static_argnames=("sc_f64", "pair_f32"))
    step.lower(
        plan, jnp.asarray(cams), jnp.asarray(lms), 1e-3,
        sc_f64=False, pair_f32=True,
    ).compile()


def smoke_graft_entry():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)


def main():
    check("device", smoke_device)
    check("pallas_kernels", smoke_pallas_kernels)
    check("grouped_segsum", smoke_grouped_segsum)
    check("v3_manhattan500", smoke_v3_manhattan)
    check("big_ba_step_50k", smoke_big_ba_step)
    if os.environ.get("SMOKE_SKIP_VENICE_FULL", "") != "1":
        check("venice_full_scale_compiles", smoke_venice_full_scale_compiles)
    if os.environ.get("SMOKE_SKIP_ENTRY", "") != "1":
        check("graft_entry", smoke_graft_entry)
    if FAILURES:
        print(f"[smoke] FAILED: {FAILURES}", flush=True)
        return 1
    print("[smoke] ALL PASS", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
