#!/usr/bin/env python
"""Data association with marginal-covariance gating.

Reference analog: src/slam_dataassoc_example (733 LoC) — candidate loop
closures are accepted or rejected by a Mahalanobis (chi2) gate computed from
the marginal covariance of the relative pose between the candidate endpoints,
the covariance-consistency application the fast marginals were built for.

Pipeline here: optimize a Manhattan graph, recover the block-diagonal
marginal covariances (MarginalCovariance — the reference CMarginalCovariance,
Marginals.h:6914), then score TRUE closures (small residual) and WRONG
associations (perturbed endpoints) with the chi2 gate and report the
separation.

Usage:  python examples/dataassoc_example.py [--poses 300]
"""
import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import slampp_tpu  # noqa: F401

from slampp_tpu.io.datasets import make_manhattan
from slampp_tpu.io.parser import build_system, parse_file
from slampp_tpu.marginals.marginals import MarginalCovariance
from slampp_tpu.solvers.gauss_newton import GaussNewtonSolver


def np_abs_to_rel(p1, p2):
    de, dn = p2[0] - p1[0], p2[1] - p1[1]
    c, s = np.cos(p1[2]), np.sin(p1[2])
    a = (p2[2] - p1[2] + np.pi) % (2 * np.pi) - np.pi
    return np.array([c * de + s * dn, -s * de + c * dn, a])


def gate_chi2(system, cov, i, j, meas, meas_info):
    """Mahalanobis distance of a candidate relative-pose measurement under
    the current estimate and marginal covariances (innovation gating)."""
    pi_, pj = system.vertex_state(i), system.vertex_state(j)
    pred = np_abs_to_rel(pi_, pj)
    innov = meas - pred
    innov[2] = (innov[2] + np.pi) % (2 * np.pi) - np.pi
    # innovation covariance ~ Sigma_i + Sigma_j (block-diag marginals;
    # conservative without the cross term) + measurement covariance
    offs, _ = system._layout()
    Si = cov.block_diag[i]
    Sj = cov.block_diag[j]
    S = Si + Sj + np.linalg.inv(meas_info)
    return float(innov @ np.linalg.solve(S, innov))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=300)
    args = ap.parse_args()

    text, gt = make_manhattan(n_poses=args.poses, loop_prob=0.1, seed=0)
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    system = build_system(parse_file(path))
    os.unlink(path)

    gn = GaussNewtonSolver(system)
    gn.optimize(max_iterations=10)

    cov = MarginalCovariance(system)
    cov.update_batch()

    info = np.diag([400.0, 400.0, 2500.0])
    rng = np.random.default_rng(1)
    order = list(system._vorder)

    true_scores, false_scores = [], []
    for _ in range(30):
        # true association: a geometrically consistent relative measurement
        i, j = sorted(rng.choice(len(order), 2, replace=False))
        vi, vj = order[i], order[j]
        meas = np_abs_to_rel(system.vertex_state(vi), system.vertex_state(vj))
        meas += rng.normal(0, 0.03, 3)
        true_scores.append(gate_chi2(system, cov, vi, vj, meas, info))
        # wrong association: same measurement claimed for a different endpoint
        k = order[(j + len(order) // 3) % len(order)]
        false_scores.append(gate_chi2(system, cov, vi, k, meas, info))

    thresh = 7.815  # chi2(3 dof, 95%)
    tp = sum(s < thresh for s in true_scores)
    tn = sum(s >= thresh for s in false_scores)
    print(f"true associations:  median gate chi2 = {np.median(true_scores):.2f} "
          f"({tp}/30 accepted at 95%)")
    print(f"wrong associations: median gate chi2 = {np.median(false_scores):.2f} "
          f"({tn}/30 rejected at 95%)")
    return tp, tn


if __name__ == "__main__":
    main()
