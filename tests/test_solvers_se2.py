"""End-to-end SE(2) pose-graph tests: parser -> system -> GN -> chi2.

Tier-2 analog of the reference's golden-value regression suite
(scripts/tests/unit_tests.sh) on synthetic Manhattan data, plus a tier-1
oracle comparison against scipy.optimize.least_squares on a tiny problem.
"""

import numpy as np
import pytest

from slampp_tpu.io import parse_file, build_system, detect_problem
from slampp_tpu.io.datasets import make_manhattan
from slampp_tpu.io.parser import parse_tokens
from slampp_tpu.solvers import GaussNewtonSolver


def _system_from_text(text):
    import io, tempfile, os

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        recs = parse_file(path)
        assert detect_problem(recs) == "se2"
        return build_system(recs)
    finally:
        os.unlink(path)


def test_parser_manhattan_roundtrip():
    text, gt = make_manhattan(n_poses=50, seed=3)
    system = _system_from_text(text)
    assert system.n_vertices == 50
    assert system.n_edges >= 49
    assert system.state_dim == 150


def test_gn_reduces_chi2_and_matches_scipy_oracle():
    from scipy.optimize import least_squares

    text, gt = make_manhattan(
        n_poses=12, loop_prob=0.9, loop_separation=4, loop_radius=5.0, seed=7
    )
    system = _system_from_text(text)
    solver = GaussNewtonSolver(system)
    chi2_initial = solver.chi2()
    solver.optimize(max_iterations=20, min_dx_norm=1e-9)
    chi2_final = solver.chi2()
    assert chi2_final < chi2_initial

    # scipy oracle: same residuals, same unary anchor; weighted by chol(info)
    edges = system._edges["edge_pose2d"]
    vids = np.array(edges["vids"])
    meas = np.stack(edges["meas"])
    sqrt_infos = [np.linalg.cholesky(s).T for s in edges["sigma_inv"]]

    def wrap(a):
        return np.remainder(a + np.pi, 2 * np.pi) - np.pi

    def residuals(x):
        x = x.reshape(-1, 3)
        out = [x[0] - 0.0]  # unary anchor with identity sqrt-information
        for k in range(len(vids)):
            i, j = vids[k]
            p1, p2 = x[i], x[j]
            c, s = np.cos(p1[2]), np.sin(p1[2])
            de, dn = p2[0] - p1[0], p2[1] - p1[1]
            h = np.array([c * de + s * dn, -s * de + c * dn, p2[2] - p1[2]])
            r = meas[k] - h
            r[2] = wrap(r[2])
            out.append(sqrt_infos[k] @ r)
        return np.concatenate(out)

    x0 = np.stack([system.vertex_state(v) for v in range(12)]).reshape(-1)
    sol = least_squares(residuals, x0, method="lm", xtol=1e-14, ftol=1e-14)
    # chi2 of the oracle solution, minus the anchor part
    r = residuals(sol.x)
    anchor = r[:3]
    chi2_oracle = float(np.sum(r[3:] ** 2) + 0.0)
    # our chi2 should be within a hair of the oracle optimum
    assert chi2_final <= chi2_oracle * (1 + 1e-6) + 1e-9


def test_manhattan_batch_convergence():
    text, gt = make_manhattan(
        n_poses=300, loop_prob=0.6, loop_separation=20, loop_radius=5.0, seed=0
    )
    system = _system_from_text(text)
    solver = GaussNewtonSolver(system)
    it = solver.optimize(max_iterations=5, min_dx_norm=0.01)
    chi2 = solver.chi2()
    dof = system.chi2_dof()
    # noise-consistent optimum: chi2 ~ DOF (within a generous band)
    assert chi2 < 3.0 * dof
    # trajectory close to ground truth after rigid gauge alignment
    from slampp_tpu.eval import ate_rmse

    est = np.stack([system.vertex_state(v) for v in range(300)])
    ate = ate_rmse(est[:, :2], gt[:, :2])
    assert ate < 0.5


def test_dogleg_with_fluid_relinearization_converges():
    """Fluid relinearization (per-vertex update threshold, reference default
    1e-5 in NonlinearSolver_Lambda_DL.h:399) must not change the optimum it
    converges to, and a huge threshold must freeze all vertices."""
    import jax

    from slampp_tpu.core import assembly
    from slampp_tpu.solvers.dogleg import DoglegSolver

    text, _ = make_manhattan(n_poses=60, loop_prob=0.4, seed=7)
    sys_a = _system_from_text(text)
    sys_b = _system_from_text(text)
    sys_c = _system_from_text(text)

    plain = DoglegSolver(sys_a, initial_radius=10.0)
    plain.optimize(max_iterations=20, min_dx_norm=1e-9)
    fluid = DoglegSolver(sys_b, initial_radius=10.0, relin_threshold=1e-5)
    fluid.optimize(max_iterations=20, min_dx_norm=1e-9)
    assert abs(fluid.chi2() - plain.chi2()) < 1e-3 * max(1.0, plain.chi2())

    # threshold larger than any step: nothing moves
    frozen = DoglegSolver(sys_c, initial_radius=10.0, relin_threshold=1e9)
    g0 = sys_c.snapshot()
    chi2_0 = float(jax.jit(assembly.graph_chi2)(g0))
    frozen.optimize(max_iterations=3, min_dx_norm=1e-9)
    assert abs(frozen.chi2() - chi2_0) < 1e-12 * max(1.0, chi2_0)
