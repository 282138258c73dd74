"""End-to-end SE(3) pose-graph and bundle-adjustment tests (synthetic
sphere2500-like and venice-like problems; BASELINE.md configs 2-3)."""

import os
import tempfile

import numpy as np
import pytest

from slampp_tpu.io.datasets import make_ba_scene, make_sphere
from slampp_tpu.io.parser import build_system, detect_problem, parse_file
from slampp_tpu.solvers import GaussNewtonSolver, LevenbergMarquardtSolver


def _system_from_text(text, expect=None):
    with tempfile.NamedTemporaryFile("w", suffix=".g2o", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        recs = parse_file(path)
        if expect:
            assert detect_problem(recs) == expect
        return build_system(recs)
    finally:
        os.unlink(path)


def test_sphere_se3_batch_convergence():
    text, gt = make_sphere(n_poses=200, n_rings=10, seed=0)
    system = _system_from_text(text, expect="se3")
    assert system.n_vertices == 200
    solver = GaussNewtonSolver(system)
    chi2_0 = solver.chi2()
    solver.optimize(max_iterations=5, min_dx_norm=0.01)
    chi2 = solver.chi2()
    dof = system.chi2_dof()
    assert chi2 < chi2_0
    assert chi2 < 3.0 * dof

    from slampp_tpu.eval import ate_rmse

    est = np.stack([system.vertex_state(v) for v in range(200)])
    assert ate_rmse(est[:, :3], gt[:, :3]) < 1.0


def test_ba_lm_schur_convergence():
    text, (gt_cams, gt_pts) = make_ba_scene(
        n_cams=8, n_points=60, obs_per_point=5, point_init_noise=0.2, seed=0
    )
    system = _system_from_text(text, expect="ba")
    assert system.edge_count("edge_p2c") > 100

    solver = LevenbergMarquardtSolver(system, use_schur=False)
    chi2_0 = solver.chi2()
    solver.optimize(max_iterations=10, min_dx_norm=1e-6)
    chi2_plain = solver.chi2()
    assert chi2_plain < chi2_0

    # Schur path must reach the same optimum (under LM damping — mono BA has
    # a scale gauge freedom, which is why the reference auto-upgrades BA to
    # LM, Main.cpp:203-207)
    system2 = _system_from_text(text)
    solver2 = LevenbergMarquardtSolver(system2, use_schur=True)
    solver2.optimize(max_iterations=10, min_dx_norm=1e-6)
    chi2_schur = solver2.chi2()
    assert chi2_schur < chi2_0
    # both near the pixel-noise-consistent optimum
    dof = system.chi2_dof()
    assert chi2_plain < 3.0 * dof
    assert abs(chi2_schur - chi2_plain) < 1e-3 * max(1.0, chi2_plain)


def test_schur_solve_matches_dense():
    """Schur elimination is algebraically exact: dx must equal the plain
    dense solve (the reference's __GPU_SCHUR_VERIFY_RESULT pattern)."""
    import jax

    from slampp_tpu.core import assembly
    from slampp_tpu.linear.dense import solve_dense
    from slampp_tpu.linear.schur import build_schur_plan, schur_solve

    import jax.numpy as jnp

    from slampp_tpu.linear.dense import solve_spd

    text, _ = make_ba_scene(n_cams=5, n_points=30, obs_per_point=4, seed=1)
    system = _system_from_text(text)
    graph = system.snapshot()
    plan = build_schur_plan(system)
    H, g, _ = assembly.assemble_dense(graph)
    # damp to lift the mono-BA scale gauge (both paths identically)
    alpha = 1e-3
    Hd = H + alpha * jnp.eye(H.shape[0], dtype=H.dtype)
    dx_dense = solve_spd(Hd, -np.asarray(g))
    dx_schur = schur_solve(H, g, plan, alpha=alpha)
    np.testing.assert_allclose(
        np.array(dx_schur), np.array(dx_dense), rtol=1e-7, atol=1e-9
    )
