"""Incremental-mode tests (BASELINE.md rows 13-28 semantics on synthetic
data): streaming edges with every-N solves must reach the batch optimum."""

import os
import tempfile

import numpy as np

from slampp_tpu.io.datasets import make_manhattan
from slampp_tpu.io.parser import build_system, parse_file
from slampp_tpu.solvers import GaussNewtonSolver, IncrementalSolver


def test_incremental_matches_batch():
    text, gt = make_manhattan(
        n_poses=150, loop_prob=0.4, loop_separation=15, loop_radius=4.0, seed=2
    )
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        recs = parse_file(path)
        # batch reference
        batch_system = build_system(recs)
        batch = GaussNewtonSolver(batch_system)
        batch.optimize(max_iterations=10, min_dx_norm=1e-6)
        chi2_batch = batch.chi2()

        # incremental: stream edges through the parse loop with the solver hook
        from slampp_tpu.graph.system import GraphSystem

        inc_system = GraphSystem()
        solver = IncrementalSolver(inc_system, solve_period=10, max_iterations=3)

        last_edge_vids = []

        def on_edge(system, n_edges):
            rec_vids = None
            solver.incremental_step(last_edge_vids[-1] if last_edge_vids else None)

        # drive build_system manually to capture vertex ids per edge
        from slampp_tpu.io.parser import build_system as bs

        # simpler: replicate the stream with explicit add_edge + step
        from slampp_tpu.models import se2 as m_se2

        for rec in recs:
            if rec.kind != "edge2":
                continue
            inc_system.add_edge(
                "edge_pose2d", rec.ids, rec.values, rec.info, m_se2.POSE_POSE_INITIALIZERS
            )
            solver.incremental_step(rec.ids)
        assert solver.n_solves > 2
        # final batch polish (the reference CLI always runs a final Optimize)
        solver.optimize(max_iterations=10, min_dx_norm=1e-6)
        chi2_inc = solver.chi2()
        assert abs(chi2_inc - chi2_batch) < 1e-3 * max(1.0, chi2_batch)
    finally:
        os.unlink(path)


def test_bucket_padding_reuses_compilation():
    """Growing within a capacity bucket must not change snapshot shapes."""
    from slampp_tpu.graph.system import GraphSystem
    from slampp_tpu.models import se2 as m_se2

    system = GraphSystem(bucket_granularity=64)
    info = np.eye(3)
    for i in range(1, 30):
        system.add_edge(
            "edge_pose2d", (i - 1, i), np.array([1.0, 0, 0]), info,
            m_se2.POSE_POSE_INITIALIZERS,
        )
    g1 = system.snapshot(pad=True)
    for i in range(30, 42):
        system.add_edge(
            "edge_pose2d", (i - 1, i), np.array([1.0, 0, 0]), info,
            m_se2.POSE_POSE_INITIALIZERS,
        )
    g2 = system.snapshot(pad=True)
    assert g1.edges["edge_pose2d"].capacity == g2.edges["edge_pose2d"].capacity
    assert g1.state_dim == g2.state_dim
    assert g1.states["pose2d"].shape == g2.states["pose2d"].shape
