"""Observation-driven (Venice-class) BA Schur solver tests."""

import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slampp_tpu.core import assembly
from slampp_tpu.io.datasets import make_ba_scene
from slampp_tpu.io.parser import build_system, parse_file
from slampp_tpu.linear.ba_schur import BigBASolver, ba_schur_lm_step, build_ba_schur_plan
from slampp_tpu.linear.schur import build_schur_plan, schur_solve
from slampp_tpu.solvers import LevenbergMarquardtSolver


def _system(n_cams=6, n_points=64, seed=2):
    text, _ = make_ba_scene(n_cams=n_cams, n_points=n_points, obs_per_point=4, seed=seed)
    with tempfile.NamedTemporaryFile("w", suffix=".g2o", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        return build_system(parse_file(path))
    finally:
        os.unlink(path)


def test_ba_schur_step_matches_dense_path():
    system = _system()
    plan = build_ba_schur_plan(system)
    cam_ids = sorted(v for v, (t, _) in system.vertex_index.items() if t == "cam")
    lm_ids = sorted(v for v, (t, _) in system.vertex_index.items() if t == "xyz")
    cams = jnp.asarray(np.stack([system.vertex_state(v) for v in cam_ids]))
    lms = jnp.asarray(np.stack([system.vertex_state(v) for v in lm_ids]))
    alpha = 1e-2

    nc, nl, dxn, chi2, denom = jax.jit(
        lambda c, l: ba_schur_lm_step(plan, c, l, alpha, pair_f32=False)
    )(cams, lms)
    # the fast path (f32 pair products) must agree to f32-level tolerance
    nc32, nl32, _, _, _ = jax.jit(
        lambda c, l: ba_schur_lm_step(plan, c, l, alpha, pair_f32=True)
    )(cams, lms)
    np.testing.assert_allclose(np.asarray(nc32), np.asarray(nc), atol=1e-2)
    np.testing.assert_allclose(np.asarray(nl32), np.asarray(nl), atol=1e-2)

    # dense-H reference with the same damping/anchor
    graph = system.snapshot()
    H, g, chi2_ref = jax.jit(assembly.assemble_dense)(graph)
    dplan = build_schur_plan(system)
    dx_ref = schur_solve(H, g, dplan, alpha=alpha)
    ref_states = assembly.apply_update(graph, dx_ref)

    assert abs(float(chi2) - float(chi2_ref)) < 1e-6 * float(chi2_ref)
    # mixed-precision SC solve: compare states to modest tolerance
    for i, v in enumerate(cam_ids):
        _, li = system.vertex_index[v]
        np.testing.assert_allclose(
            np.asarray(nc)[i], np.asarray(ref_states["cam"][li]), atol=5e-6
        )
    for i, v in enumerate(lm_ids):
        _, li = system.vertex_index[v]
        np.testing.assert_allclose(
            np.asarray(nl)[i], np.asarray(ref_states["xyz"][li]), atol=5e-6
        )


def test_big_ba_solver_converges_like_lm():
    system1 = _system(seed=5)
    system2 = _system(seed=5)
    big = BigBASolver(system1)
    chi0 = big.chi2()
    big.optimize(10, 1e-6)
    chi_big = big.chi2()

    lm = LevenbergMarquardtSolver(system2, use_schur=True)
    lm.optimize(10, 1e-6)
    chi_lm = lm.chi2()
    assert chi_big < 0.05 * chi0
    dof = system1.chi2_dof()
    assert chi_big < 3.0 * dof
    # same optimum within a loose band (different damping trajectories)
    assert abs(chi_big - chi_lm) < 0.05 * max(chi_lm, 1.0)


def test_mis_fallback_schur_on_pose_only_graph():
    """Pose-only graph (no landmark-typed vertices): the MIS fallback ordering
    (reference CSchurOrdering, LinearSolver_Schur.h:275) must produce a valid
    elimination set and the Schur solve must equal the dense solve."""
    from slampp_tpu.io.datasets import make_manhattan
    from slampp_tpu.linear.dense import solve_spd

    text, _ = make_manhattan(n_poses=80, loop_prob=0.4, seed=5)
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        system = build_system(parse_file(path))
    finally:
        os.unlink(path)

    plan = build_schur_plan(system)  # falls back to MIS
    n_l = int(plan.lm_offsets.shape[0])
    assert n_l > 0
    # MIS on a pose chain with loop closures should eliminate a sizable chunk
    assert n_l >= len(system.vertex_index) // 4

    graph = system.snapshot()
    H, g, _ = jax.jit(assembly.assemble_dense)(graph)
    alpha = 1e-3
    dx_schur = schur_solve(H, g, plan, alpha=alpha)
    dx_dense = solve_spd(
        H + alpha * jnp.eye(H.shape[0], dtype=H.dtype), -g
    )
    np.testing.assert_allclose(
        np.asarray(dx_schur), np.asarray(dx_dense), atol=1e-8
    )


def test_mis_first_fit_is_independent_and_maximal():
    from scipy import sparse as sp

    from slampp_tpu.core.ordering import mis_first_fit

    rng = np.random.default_rng(0)
    n = 200
    i = rng.integers(0, n, 600)
    j = rng.integers(0, n, 600)
    m = i != j
    adj = sp.csr_matrix(
        (np.ones(m.sum() * 2, np.int8),
         (np.concatenate([i[m], j[m]]), np.concatenate([j[m], i[m]]))),
        shape=(n, n),
    )
    adj.data[:] = 1
    mis = mis_first_fit(adj)
    dense = adj.toarray()
    # independent: no edges within the set
    assert not dense[np.ix_(mis, mis)].any()
    # maximal: every vertex outside the set has a neighbour inside
    outside = np.setdiff1d(np.arange(n), mis)
    assert all(dense[v, mis].any() for v in outside)


def test_lm_engine_big_ba_and_cli_autoselect(tmp_path, monkeypatch):
    """LM engine="big_ba" reaches the same optimum as the dense path, and the
    CLI auto-routes large mono BA through it (no dense H ever assembled;
    reference -us BA at any scale, Main.cpp:203-207)."""
    system1 = _system(seed=7)
    system2 = _system(seed=7)
    lm_big = LevenbergMarquardtSolver(system1, engine="big_ba")
    lm_big.optimize(10, 1e-6)
    chi_big = lm_big.chi2()
    assert lm_big._big is not None  # the engine actually ran

    lm_dense = LevenbergMarquardtSolver(system2, use_schur=True)
    lm_dense.optimize(10, 1e-6)
    chi_dense = lm_dense.chi2()
    assert abs(chi_big - chi_dense) < 0.05 * max(chi_dense, 1.0)

    # CLI auto-select: set the threshold below this scene's edge count, fail
    # hard if the dense assembly path is entered
    from slampp_tpu.apps.main import main as cli_main
    from slampp_tpu.core import assembly as asm

    text, _ = make_ba_scene(n_cams=6, n_points=64, obs_per_point=4, seed=7)
    g2o = tmp_path / "ba.g2o"
    g2o.write_text(text)
    monkeypatch.setenv("SLAMPP_BIGBA_THRESHOLD", "10")

    def _boom(*a, **k):
        raise AssertionError("dense Hessian assembled on the big_ba CLI path")

    monkeypatch.setattr(asm, "assemble_dense", _boom)
    rc = cli_main(["-i", str(g2o), "-ns", "-nb", "--json"])
    assert rc == 0
