"""Distributed (landmark-sharded) Schur BA vs the single-device path."""

import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slampp_tpu.core import assembly
from slampp_tpu.io.datasets import make_ba_scene
from slampp_tpu.io.parser import build_system, parse_file
from slampp_tpu.linear.schur import build_schur_plan, schur_solve
from slampp_tpu.parallel.distributed import make_mesh
from slampp_tpu.parallel.distributed_ba import build_ba_shards, distributed_ba_lm_step


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_distributed_ba_step_matches_single_device():
    text, _ = make_ba_scene(n_cams=6, n_points=64, obs_per_point=4, seed=2)
    with tempfile.NamedTemporaryFile("w", suffix=".g2o", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        system = build_system(parse_file(path))
    finally:
        os.unlink(path)

    alpha = 1e-2

    # single-device reference: dense assembly + Schur with identical damping
    graph = system.snapshot()
    H, g, chi2_ref = jax.jit(assembly.assemble_dense)(graph)
    plan = build_schur_plan(system)
    dx_ref = schur_solve(H, g, plan, alpha=alpha)

    mesh = make_mesh(len(jax.devices()), axis="lm")
    shards = build_ba_shards(system, mesh)
    new_cams, new_lms, dx_norm, chi2, denom = distributed_ba_lm_step(
        shards, mesh, alpha
    )

    assert abs(float(chi2) - float(chi2_ref)) < 1e-6 * float(chi2_ref)
    np.testing.assert_allclose(
        float(dx_norm), float(jnp.linalg.norm(dx_ref)), rtol=1e-8
    )

    # states must match the single-device update exactly
    ref_states = assembly.apply_update(graph, dx_ref)
    cam_ids = sorted(v for v, (t, _) in system.vertex_index.items() if t == "cam")
    lm_ids = sorted(v for v, (t, _) in system.vertex_index.items() if t == "xyz")
    cams_np = np.asarray(new_cams)
    lms_np = np.asarray(new_lms)
    for i, v in enumerate(cam_ids):
        _, li = system.vertex_index[v]
        np.testing.assert_allclose(
            cams_np[i], np.asarray(ref_states["cam"][li]), atol=1e-9
        )
    for i, v in enumerate(lm_ids):
        _, li = system.vertex_index[v]
        np.testing.assert_allclose(
            lms_np[i], np.asarray(ref_states["xyz"][li]), atol=1e-9
        )


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_distributed_big_ba_step_matches_obs_driven_single_device():
    """Venice-class path: landmark-sharded observation-driven Schur step must
    equal linear/ba_schur.py's single-device step."""
    from slampp_tpu.linear.ba_schur import build_ba_schur_plan, ba_schur_lm_step
    from slampp_tpu.parallel.distributed_ba import (
        build_big_ba_shards,
        distributed_big_ba_step,
    )

    text, _ = make_ba_scene(n_cams=6, n_points=67, obs_per_point=4, seed=3)
    with tempfile.NamedTemporaryFile("w", suffix=".g2o", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        system = build_system(parse_file(path))
    finally:
        os.unlink(path)

    alpha = 1e-2
    plan = build_ba_schur_plan(system)
    cam_ids = sorted(v for v, (t, _) in system.vertex_index.items() if t == "cam")
    lm_ids = sorted(v for v, (t, _) in system.vertex_index.items() if t == "xyz")
    cams = jnp.asarray(np.stack([system.vertex_state(v) for v in cam_ids]))
    lms = jnp.asarray(np.stack([system.vertex_state(v) for v in lm_ids]))
    ref_cams, ref_lms, ref_norm, ref_chi2, ref_denom = jax.jit(
        ba_schur_lm_step, static_argnames=("sc_f64", "pair_f32")
    )(plan, cams, lms, alpha, pair_f32=False)

    mesh = make_mesh(len(jax.devices()), axis="lm")
    shards = build_big_ba_shards(system, mesh)
    new_cams, new_lms, dx_norm, chi2, denom = distributed_big_ba_step(
        shards, mesh, alpha
    )

    assert abs(float(chi2) - float(ref_chi2)) < 1e-9 * max(1.0, float(ref_chi2))
    np.testing.assert_allclose(float(dx_norm), float(ref_norm), rtol=1e-9)
    np.testing.assert_allclose(float(denom), float(ref_denom), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(new_cams), np.asarray(ref_cams), atol=1e-9)
    lms_np = np.asarray(new_lms).reshape(-1, 3)[: len(lm_ids)]
    np.testing.assert_allclose(lms_np, np.asarray(ref_lms), atol=1e-9)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_distributed_big_ba_solver_converges():
    from slampp_tpu.parallel.distributed_ba import DistributedBigBASolver

    text, _ = make_ba_scene(n_cams=5, n_points=40, obs_per_point=4, seed=4)
    with tempfile.NamedTemporaryFile("w", suffix=".g2o", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        system = build_system(parse_file(path))
    finally:
        os.unlink(path)

    graph = system.snapshot()
    chi2_0 = float(jax.jit(assembly.graph_chi2)(graph))
    mesh = make_mesh(len(jax.devices()), axis="lm")
    solver = DistributedBigBASolver(system, mesh)
    applied = solver.optimize(max_iterations=10, min_dx_norm=1e-8)
    assert applied > 0
    chi2_1 = float(jax.jit(assembly.graph_chi2)(system.snapshot()))
    assert chi2_1 < chi2_0 * 0.5


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_distributed_marginals_match_single_device():
    """Mesh-parallel block-diagonal marginals == the single-device
    Schur-based recovery (marginals/ba_marginals.py; BAMarginals.h:43 role).
    Camera blocks replicated from the psum-ed SC; landmark blocks
    shard-local (SURVEY §2.12 'distributed marginals')."""
    from slampp_tpu.marginals.ba_marginals import schur_marginals
    from slampp_tpu.parallel.distributed_ba import (
        build_big_ba_shards,
        distributed_big_ba_marginals,
    )

    text, _ = make_ba_scene(n_cams=6, n_points=67, obs_per_point=4, seed=3)
    with tempfile.NamedTemporaryFile("w", suffix=".g2o", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        system = build_system(parse_file(path))
    finally:
        os.unlink(path)

    alpha = 1e-2
    graph = system.snapshot()
    H, _, _ = jax.jit(assembly.assemble_dense)(graph)
    plan = build_schur_plan(system)
    cov_cam_ref, cov_lm_ref = schur_marginals(H, plan, alpha=alpha)
    cov_cam_ref = np.asarray(cov_cam_ref)
    cov_lm_ref = np.asarray(cov_lm_ref)

    mesh = make_mesh(len(jax.devices()), axis="lm")
    shards = build_big_ba_shards(system, mesh)
    cam_cov, lm_cov = distributed_big_ba_marginals(shards, mesh, alpha=alpha)
    cam_cov = np.asarray(cam_cov)
    lm_cov = np.asarray(lm_cov).reshape(-1, 3, 3)

    # map orderings by scalar offset: shards order cams/landmarks by vid,
    # the dense plan orders by layout offset
    offsets, _ = system._layout()
    cam_ids = sorted(v for v, (t, _) in system.vertex_index.items() if t == "cam")
    lm_ids = sorted(v for v, (t, _) in system.vertex_index.items() if t == "xyz")
    lm_offs = np.asarray(plan.lm_offsets)
    # camera diag blocks of Sigma_cc in the dense plan's cam_idx order:
    # cam scalars are contiguous per camera in offset order
    cam_off_sorted = np.argsort([offsets[v] for v in cam_ids])
    n_c = len(cam_ids)
    Scc = cov_cam_ref.reshape(n_c, 6, n_c, 6).transpose(0, 2, 1, 3)
    for k, v in enumerate(cam_ids):
        pos = int(np.searchsorted(
            np.sort([offsets[c] for c in cam_ids]), offsets[v]
        ))
        np.testing.assert_allclose(
            cam_cov[k], Scc[pos, pos], rtol=1e-6, atol=1e-8
        )
    for g, v in enumerate(lm_ids):
        pos = int(np.searchsorted(lm_offs, offsets[v]))
        np.testing.assert_allclose(
            lm_cov[g], cov_lm_ref[pos], rtol=1e-6, atol=1e-8
        )
