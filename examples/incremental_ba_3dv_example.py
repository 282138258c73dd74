#!/usr/bin/env python
"""Incremental BA with consistency markers + covariance experiments.

Reference analog: src/incremental_ba_3dv (2,111 LoC, the 3DV'17 paper
driver): a BA dataset streams in camera-by-camera with CONSISTENCY_MARKER
records delimiting optimizable states; at each marker the system is
optimized and the camera marginal covariances are recovered through the
Schur complement (BAMarginals.h) — tracking how uncertainty contracts as
observations accumulate.

Usage:  python examples/incremental_ba_3dv_example.py [--cams 10] [--points 120]
"""
import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import slampp_tpu  # noqa: F401
import jax

from slampp_tpu.core import assembly
from slampp_tpu.graph.system import GraphSystem
from slampp_tpu.io.datasets import make_ba_scene_incremental
from slampp_tpu.io.parser import build_system, parse_file
from slampp_tpu.linear.schur import build_schur_plan
from slampp_tpu.marginals.ba_marginals import schur_marginals
from slampp_tpu.solvers.lm import LevenbergMarquardtSolver


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=10)
    ap.add_argument("--points", type=int, default=120)
    args = ap.parse_args()

    text, gt = make_ba_scene_incremental(
        n_cams=args.cams, n_points=args.points, seed=0
    )
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    records = parse_file(path)
    os.unlink(path)

    system = GraphSystem()
    marker_no = 0
    traces = []

    def on_marker(s):
        nonlocal marker_no
        marker_no += 1
        lm = LevenbergMarquardtSolver(s, use_schur=True, pad=True)
        lm.optimize(5, 0.01)
        # camera marginals through the Schur complement (3DV'17 path)
        graph = s.snapshot(pad=True)
        H, g, _ = jax.jit(assembly.assemble_dense)(graph)
        plan = build_schur_plan(s)
        Sigma_cc = np.asarray(schur_marginals(H, plan, alpha=1e-6)[0])
        cam_trace = float(np.trace(Sigma_cc)) / max(Sigma_cc.shape[0], 1)
        traces.append(cam_trace)
        print(
            f"marker #{marker_no}: {s.n_vertices} vertices, "
            f"chi2={lm.chi2():.2f}, mean camera variance={cam_trace:.3e}"
        )

    build_system(records, system=system, on_marker=on_marker)
    print(f"\n{marker_no} consistency markers processed")
    if len(traces) >= 3:
        print(
            "uncertainty contraction (first -> last marker): "
            f"{traces[0]:.3e} -> {traces[-1]:.3e}"
        )
    return traces


if __name__ == "__main__":
    main()
