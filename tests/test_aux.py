"""Auxiliary-subsystem tests: checkpoint/resume, eigenvalues, FLOP
accounting, memory usage, mixed-precision solves."""

import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slampp_tpu.core import assembly
from slampp_tpu.io.datasets import make_manhattan
from slampp_tpu.io.parser import build_system, parse_file
from slampp_tpu.solvers import GaussNewtonSolver


def _system(n=80, seed=3):
    text, _ = make_manhattan(
        n_poses=n, loop_prob=0.5, loop_separation=10, loop_radius=4.0, seed=seed
    )
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        return build_system(parse_file(path))
    finally:
        os.unlink(path)


def test_checkpoint_roundtrip(tmp_path):
    from slampp_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    system = _system()
    GaussNewtonSolver(system).optimize(3, 0.01)
    chi2_before = GaussNewtonSolver(system).chi2()

    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, system, extra={"round": 1})
    system2, extra = load_checkpoint(path)
    assert extra == {"round": 1}
    assert system2.n_vertices == system.n_vertices
    assert system2.n_edges == system.n_edges
    assert system2.state_dim == system.state_dim
    chi2_after = GaussNewtonSolver(system2).chi2()
    assert abs(chi2_after - chi2_before) < 1e-9
    # continued optimization behaves identically
    GaussNewtonSolver(system2).optimize(5, 1e-8)
    GaussNewtonSolver(system).optimize(5, 1e-8)
    for vid in (0, 10, 40):
        np.testing.assert_allclose(
            system2.vertex_state(vid), system.vertex_state(vid), atol=1e-10
        )


def test_eigenvalues_match_numpy():
    from slampp_tpu.eval.eigenvalues import (
        largest_eigenvalues,
        smallest_eigenvalues_shift_invert,
    )

    system = _system(n=40)
    GaussNewtonSolver(system).optimize(5, 0.01)
    H, _, _ = jax.jit(assembly.assemble_dense)(system.snapshot())
    w = np.linalg.eigvalsh(np.array(H))
    lmax, _ = largest_eigenvalues(H, k=1, iters=80)
    np.testing.assert_allclose(float(lmax[0]), w[-1], rtol=1e-6)
    lmin, _ = smallest_eigenvalues_shift_invert(H, k=1, iters=80)
    np.testing.assert_allclose(float(lmin[0]), w[0], rtol=1e-6)


def test_flop_accounting():
    from slampp_tpu.utils.flops import flops

    a = jnp.ones((64, 64))
    f = flops(lambda x: x @ x, a)
    # 64^3 * 2 = 524288 flops for a matmul
    assert f == pytest.approx(2 * 64**3, rel=0.1)


def test_memusage():
    from slampp_tpu.utils.memusage import format_memory_report, process_memory_usage

    assert process_memory_usage() > 1e6
    assert "RSS" in format_memory_report()


def test_mixed_precision_gn_reaches_f64_optimum():
    """f32-factor + equilibration + refinement converges to the identical
    chi2 as the f64 path (the bench configuration's correctness contract)."""
    from slampp_tpu.linear.native import NativeBlockSolver

    system = _system(n=120, seed=6)

    def run(mix):
        graph = system.snapshot()
        ns = NativeBlockSolver(system, panel=8, mixed_precision=mix, refine_iters=1)
        ns.symbolic()
        for _ in range(10):
            states, norm, chi2 = ns.gn_step(graph)
            if float(norm) <= 1e-6:
                break
            graph = graph.replace_states(states)
        return float(jax.jit(assembly.graph_chi2)(graph))

    chi2_64 = run(False)
    chi2_mixed = run(True)
    assert abs(chi2_mixed - chi2_64) < 1e-6 * max(1.0, chi2_64)


def test_sparse_operator_eigenvalues_match_dense():
    """Sparse block-operator eigensolver (no densified H) matches the dense
    path: largest + shift-invert smallest (reference Eigenvalues.h:179,364
    operates on the sparse block matrix at full size)."""
    import tempfile

    import jax.numpy as jnp

    from slampp_tpu.core import assembly
    from slampp_tpu.eval.eigenvalues import (
        SparseSystemOperator,
        sparse_largest_eigenvalues,
        sparse_smallest_eigenvalues_shift_invert,
    )
    from slampp_tpu.io.datasets import make_manhattan
    from slampp_tpu.io.parser import build_system, parse_file

    text, _ = make_manhattan(n_poses=120, loop_prob=0.1, seed=4)
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        system = build_system(parse_file(path))
    finally:
        os.unlink(path)

    graph = system.snapshot()
    H, _, _ = assembly.assemble_dense(graph)
    H = np.asarray(H)
    w = np.linalg.eigvalsh(H)

    # operator matvec == dense matvec
    op = SparseSystemOperator(system)
    rng = np.random.default_rng(0)
    x = rng.normal(size=op.n)
    np.testing.assert_allclose(
        np.asarray(op.matvec(jnp.asarray(x))), H @ x, rtol=1e-9, atol=1e-9
    )

    # Lanczos convergence on a clustered spectrum: modest tolerance
    lmax, _ = sparse_largest_eigenvalues(system, k=3, iters=120)
    np.testing.assert_allclose(
        np.sort(np.abs(np.asarray(lmax)))[::-1], np.sort(np.abs(w))[::-1][:3],
        rtol=5e-4,
    )
    lmin, _ = sparse_smallest_eigenvalues_shift_invert(system, k=2, iters=80)
    np.testing.assert_allclose(
        np.sort(np.asarray(lmin)), np.sort(w)[:2], rtol=1e-4
    )


def test_spcg_solver_matches_dense_gn():
    """SPCG (spanning-tree-preconditioned CG, reference
    NonlinearSolver_SPCG.h:61) reaches the dense-GN optimum on a loopy
    SE(2) graph, and its preconditioner really is a proper subgraph."""
    import tempfile

    from slampp_tpu.io.datasets import make_manhattan
    from slampp_tpu.io.parser import build_system, parse_file
    from slampp_tpu.linear.spcg import SPCGSolver
    from slampp_tpu.solvers.gauss_newton import GaussNewtonSolver

    text, _ = make_manhattan(
        n_poses=150, loop_prob=0.5, loop_separation=8, loop_radius=4.0, seed=1
    )
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        system = build_system(parse_file(path))
        system_ref = build_system(parse_file(path))
    finally:
        os.unlink(path)

    ref = GaussNewtonSolver(system_ref, linear_solver="dense")
    ref.optimize(10, 1e-9)
    chi2_ref = ref.chi2()

    s = SPCGSolver(system, cg_max_iters=400, cg_tol=1e-12)
    s.optimize(10, 1e-9)
    assert 0.0 < s.tree_fraction < 1.0  # strictly a subgraph preconditioner
    chi2 = s.chi2()
    np.testing.assert_allclose(chi2, chi2_ref, rtol=1e-6)


def test_lm_aborts_on_numerical_failure(capsys):
    """Failure-detection parity: a non-finite step aborts iterating with the
    reference's warning (NonlinearSolver_Lambda.h:658-660) instead of
    looping on NaNs."""
    import numpy as np

    from slampp_tpu.graph.system import GraphSystem
    from slampp_tpu.solvers.lm import LevenbergMarquardtSolver
    import slampp_tpu.models.se2  # noqa: F401

    system = GraphSystem()
    system.add_vertex("pose2d", 0, np.zeros(3))
    system.add_vertex("pose2d", 1, np.ones(3))
    # an information matrix with a NaN poisons the solve -> non-finite dx
    bad_info = np.eye(3)
    bad_info[0, 0] = np.nan
    system.add_edge("edge_pose2d", (0, 1), np.ones(3), bad_info)
    lm = LevenbergMarquardtSolver(system)
    applied = lm.optimize(5)
    captured = capsys.readouterr()
    assert applied == 0
    assert "aborting iterations" in captured.err


def test_assemble_sparse_csr_matches_dense():
    """-dsm sparse assembly == assemble_dense on a mixed pose/landmark graph
    (round-4 advisor: the dump must not materialize a dense Hessian)."""
    import numpy as np

    from slampp_tpu.core.assembly import assemble_dense
    from slampp_tpu.core.sparse_dump import assemble_sparse_csr
    from slampp_tpu.graph.system import GraphSystem

    rng = np.random.default_rng(5)
    system = GraphSystem()
    for i in range(12):
        system.add_vertex("pose2d", i, rng.normal(size=3))
    for i in range(6):
        system.add_vertex("landmark2d", 100 + i, rng.normal(size=2))
    for i in range(11):
        system.add_edge("edge_pose2d", [i, i + 1], rng.normal(size=3), np.eye(3))
    system.add_edge("edge_pose2d", [0, 8], rng.normal(size=3), 2 * np.eye(3))
    for i in range(6):
        system.add_edge(
            "edge_pose_landmark2d_xy", [i, 100 + i], rng.normal(size=2), np.eye(2)
        )
    g = system.snapshot()
    Hd, _, _ = assemble_dense(g)
    Hs = assemble_sparse_csr(g, chunk=4)  # exercise chunking
    np.testing.assert_allclose(np.asarray(Hs.todense()), np.asarray(Hd), atol=1e-9)


def test_assemble_sparse_csr_ba_scale():
    """Venice-class -dsm shape at reduced scale: a BA graph (mixed 6-DoF
    cameras + 3-DoF points, ~5k observations) assembles sparsely and agrees
    with the dense oracle."""
    import numpy as np

    from slampp_tpu.core.assembly import assemble_dense
    from slampp_tpu.core.sparse_dump import assemble_sparse_csr
    from slampp_tpu.io.datasets import make_ba_scene
    from slampp_tpu.io.parser import build_system, parse_file
    import os
    import tempfile

    text, _ = make_ba_scene(n_cams=12, n_points=300, seed=0)
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        system = build_system(parse_file(path), problem="ba")
    finally:
        os.unlink(path)
    g = system.snapshot()
    Hs = assemble_sparse_csr(g, chunk=512)
    Hd, _, _ = assemble_dense(g)
    np.testing.assert_allclose(
        np.asarray(Hs.todense()), np.asarray(Hd), rtol=1e-7, atol=1e-6
    )
