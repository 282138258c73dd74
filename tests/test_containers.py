"""BlockSparseMatrix container, SciPy backend, A solver, const vertices,
and SE(3) hyperedge tests."""

import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slampp_tpu.core import assembly
from slampp_tpu.core.bsm import BlockSparseMatrix
from slampp_tpu.graph.system import GraphSystem
from slampp_tpu.io.datasets import make_manhattan
from slampp_tpu.io.parser import build_system, parse_file
from slampp_tpu.models import se2 as m_se2
from slampp_tpu.solvers import GaussNewtonSolver


def test_block_sparse_matrix_ops(tmp_path):
    rng = np.random.default_rng(0)
    A = BlockSparseMatrix(3, 4, 2, 3)
    blocks = {}
    for i, j in [(0, 0), (0, 2), (1, 1), (2, 3), (2, 0)]:
        b = rng.normal(0, 1, (2, 3))
        blocks[(i, j)] = b
        A.append_block(i, j, b)
    Ad = A.to_dense()
    assert Ad.shape == (6, 12)
    np.testing.assert_allclose(A.find_block(0, 2), blocks[(0, 2)])
    # matvec
    x = rng.normal(0, 1, 12)
    np.testing.assert_allclose(A.matvec(x), Ad @ x, atol=1e-12)
    # AtA
    np.testing.assert_allclose(A.ata().to_dense(), Ad.T @ Ad, atol=1e-12)
    # GEMM
    B = BlockSparseMatrix(4, 2, 3, 2)
    for i, j in [(0, 0), (2, 1), (3, 0)]:
        B.append_block(i, j, rng.normal(0, 1, (3, 2)))
    np.testing.assert_allclose(
        A.multiply(B).to_dense(), Ad @ B.to_dense(), atol=1e-12
    )
    # add with factor
    np.testing.assert_allclose(A.add(A, 0.5).to_dense(), 1.5 * Ad, atol=1e-12)
    # BSR + matrix market + from_sparse roundtrip
    bsr = A.to_bsr()
    np.testing.assert_allclose(bsr.toarray(), Ad, atol=1e-12)
    mm = tmp_path / "a.mtx"
    A.save_matrix_market(str(mm))
    assert mm.exists()
    A2 = BlockSparseMatrix.from_sparse(bsr.tocsr(), 2, 3)
    np.testing.assert_allclose(A2.to_dense(), Ad, atol=1e-12)
    # permutation
    P = A.permute(np.array([2, 0, 1]), np.arange(4))
    assert P.find_block(1, 0) is not None or P.find_block(0, 0) is not None


def test_scipy_backend_matches_dense():
    from slampp_tpu.linear.scipy_solver import ScipySolver

    rng = np.random.default_rng(1)
    n = 40
    M = rng.normal(0, 1, (n, n))
    H = M @ M.T + n * np.eye(n)
    b = rng.normal(0, 1, n)
    s = ScipySolver()
    x1 = s.solve_pos_def(H, b)
    x2 = s.solve_pos_def_blocky(H, b)
    x_ref = np.linalg.solve(H, b)
    np.testing.assert_allclose(x1, x_ref, atol=1e-9)
    np.testing.assert_allclose(x2, x_ref, atol=1e-9)


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


def test_a_solver_matches_lambda():
    from slampp_tpu.solvers.a_solver import ASolver

    sys_a = _manhattan_system()
    sys_l = _manhattan_system()
    a = ASolver(sys_a)
    l = GaussNewtonSolver(sys_l, linear_solver="dense")
    a.optimize(8, 1e-9)
    l.optimize(8, 1e-9)
    assert abs(a.chi2() - l.chi2()) < 1e-6 * max(1.0, l.chi2())
    # exported Jacobian satisfies A^T A == lambda (up to the unary factor)
    A = np.array(a.r_A())
    H, g, _ = jax.jit(assembly.assemble_dense)(sys_l.snapshot())
    H_from_A = A.T @ A
    Hn = np.array(H).copy()
    Hn[:3, :3] -= np.eye(3)  # remove the unary gauge block
    np.testing.assert_allclose(H_from_A, Hn, atol=1e-6)


def test_const_vertices_stay_fixed():
    """Const vertices (reference: const-vertex pool, FlatSystem.h:114-130)
    contribute residuals but are excluded from the state."""
    system = GraphSystem()
    info = np.eye(3) * 100.0
    system.add_vertex("pose2d", 0, np.zeros(3), const=True)
    for i in range(1, 10):
        system.add_edge(
            "edge_pose2d", (i - 1, i), np.array([1.0, 0.01 * i, 0.0]), info,
            m_se2.POSE_POSE_INITIALIZERS,
        )
    system.add_edge("edge_pose2d", (0, 9), np.array([9.0, 0.0, 0.0]), info)
    assert system.state_dim == 27  # 9 free poses, const pose excluded
    solver = GaussNewtonSolver(system, linear_solver="dense")
    solver.optimize(10, 1e-10)
    np.testing.assert_allclose(system.vertex_state(0), np.zeros(3))  # unchanged
    assert solver.chi2() < 10.0


def test_se3_ternary_hyperedge():
    """Arbitrary-arity edges (reference hyperedge CEdgePose3D_Ternary,
    SE3_Types.h:338): a 3-vertex consistency factor optimizes correctly."""
    from slampp_tpu.graph.types import EdgeType, register_edge_type
    from slampp_tpu.geometry import se3 as g_se3

    try:
        from slampp_tpu.graph.types import get_edge_type

        get_edge_type("edge_pose3d_ternary")
    except KeyError:
        register_edge_type(
            EdgeType(
                name="edge_pose3d_ternary",
                vertex_types=("pose3d", "pose3d", "pose3d"),
                res_dim=6,
                meas_dim=6,
                # residual: measured (a->c) vs composed (a->b)*(b->c)
                error_fn=lambda xs, z: g_se3.pose_pose_error(xs[0], xs[2], z),
            )
        )

    rng = np.random.default_rng(0)
    system = GraphSystem()
    info6 = np.eye(6) * 100.0
    poses = [np.zeros(6)]
    for i in range(1, 4):
        poses.append(poses[-1] + rng.normal(0, 0.1, 6))
        system.add_vertex("pose3d", i - 1, poses[i - 1])
    system.add_vertex("pose3d", 3, poses[3])
    for i in range(1, 4):
        z = np.asarray(g_se3.absolute_to_relative(jnp.asarray(poses[i - 1]), jnp.asarray(poses[i])))
        system.add_edge("edge_pose3d", (i - 1, i), z, info6)
    z02 = np.asarray(g_se3.absolute_to_relative(jnp.asarray(poses[0]), jnp.asarray(poses[2])))
    system.add_edge("edge_pose3d_ternary", (0, 1, 2), z02, info6)
    solver = GaussNewtonSolver(system, linear_solver="dense")
    solver.optimize(5, 1e-10)
    assert solver.chi2() < 1e-9
