"""Marginal-covariance tests vs dense NumPy oracles (the reference verifies
its recursive/incremental marginals against Calculate_DenseMarginals_Ref)."""

import os
import tempfile

import numpy as np

import jax
import jax.numpy as jnp

from slampp_tpu.core import assembly
from slampp_tpu.io.datasets import make_ba_scene, make_manhattan
from slampp_tpu.io.parser import build_system, parse_file
from slampp_tpu.marginals import MarginalCovariance, dense_marginals, schur_marginals
from slampp_tpu.models import se2 as m_se2
from slampp_tpu.solvers import GaussNewtonSolver


def _manhattan_system(n=60, seed=4):
    text, _ = make_manhattan(
        n_poses=n, loop_prob=0.5, loop_separation=8, loop_radius=4.0, seed=seed
    )
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        return build_system(parse_file(path))
    finally:
        os.unlink(path)


def test_dense_marginals_is_inverse():
    system = _manhattan_system()
    GaussNewtonSolver(system).optimize(5, 0.01)
    graph = system.snapshot()
    H, _, _ = jax.jit(assembly.assemble_dense)(graph)
    Sigma = dense_marginals(H)
    np.testing.assert_allclose(
        np.array(Sigma) @ np.array(H), np.eye(H.shape[0]), atol=1e-6
    )


def test_marginal_cache_and_incremental_update():
    system = _manhattan_system()
    GaussNewtonSolver(system).optimize(10, 1e-8)
    marg = MarginalCovariance(system)
    marg.update_batch()
    sigma_0_before = marg.block_diag[0].copy()
    assert sigma_0_before.shape == (3, 3)
    # covariance of the anchored vertex should be small & PSD
    assert np.all(np.linalg.eigvalsh(sigma_0_before) > 0)

    # add a strong loop-closure edge at the SAME linearization point and
    # compare the Woodbury update against a batch recompute
    vids = (10, 50)
    x0 = system.vertex_state(vids[0])
    x1 = system.vertex_state(vids[1])
    from slampp_tpu.geometry import se2 as g_se2

    meas = np.asarray(g_se2.absolute_to_relative(jnp.asarray(x0), jnp.asarray(x1)))
    info = np.eye(3) * 100.0

    # stacked jacobian rows of the new edge in the global state layout
    offsets, total = system._layout()
    J = np.zeros((3, total))
    _, j0, j1 = g_se2.absolute_to_relative_jacobians(jnp.asarray(x0), jnp.asarray(x1))
    # residual r = z - h  ->  J_err = -J_h
    J[:, offsets[vids[0]] : offsets[vids[0]] + 3] = -np.asarray(j0)
    J[:, offsets[vids[1]] : offsets[vids[1]] + 3] = -np.asarray(j1)

    assert marg.prefer_incremental(3)
    marg.update_incremental(J, info)
    inc_blocks = {v: b.copy() for v, b in marg.block_diag.items()}

    system.add_edge("edge_pose2d", vids, meas, info, m_se2.POSE_POSE_INITIALIZERS)
    marg2 = MarginalCovariance(system)
    marg2.update_batch()

    for vid in (0, 10, 30, 50):
        np.testing.assert_allclose(
            inc_blocks[vid], marg2.block_diag[vid], atol=1e-8
        )


def test_schur_marginals_match_dense():
    from slampp_tpu.linear.schur import build_schur_plan

    text, _ = make_ba_scene(n_cams=6, n_points=40, obs_per_point=4, seed=3)
    with tempfile.NamedTemporaryFile("w", suffix=".g2o", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        system = build_system(parse_file(path))
    finally:
        os.unlink(path)
    graph = system.snapshot()
    plan = build_schur_plan(system)
    H, _, _ = jax.jit(assembly.assemble_dense)(graph)
    alpha = 1e-2  # lift the BA gauge identically in both paths
    Sigma_cc, Sigma_ll = schur_marginals(H, plan, alpha=alpha)

    Hd = np.array(H) + alpha * np.eye(H.shape[0])
    Sigma_ref = np.linalg.inv(Hd)
    cam = np.array(plan.cam_idx)
    np.testing.assert_allclose(
        np.array(Sigma_cc), Sigma_ref[np.ix_(cam, cam)], atol=1e-7
    )
    offs = np.array(plan.lm_offsets)
    d = plan.lm_dim
    for k in range(len(offs)):
        np.testing.assert_allclose(
            np.array(Sigma_ll[k]),
            Sigma_ref[offs[k] : offs[k] + d, offs[k] : offs[k] + d],
            atol=1e-7,
        )
