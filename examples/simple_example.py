"""Batch library-usage demo (reference: src/slam_simple_example/Main.cpp:56-85).

Builds a tiny SE(2) pose graph through the library API, runs batch
Gauss-Newton, prints chi2, writes a plot.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from slampp_tpu.graph.system import GraphSystem
from slampp_tpu.models import se2
from slampp_tpu.solvers import GaussNewtonSolver


def main():
    system = GraphSystem()
    info = np.linalg.inv(np.diag([0.02, 0.02, 0.01]))  # information matrix

    # a square loop with odometry + one loop closure
    meas = [
        (0, 1, [1.0, 0.0, np.pi / 2]),
        (1, 2, [1.05, 0.02, np.pi / 2]),
        (2, 3, [0.97, -0.01, np.pi / 2]),
        (3, 4, [1.01, 0.01, np.pi / 2]),
    ]
    for i, j, m in meas:
        system.add_edge("edge_pose2d", (i, j), np.array(m), info, se2.POSE_POSE_INITIALIZERS)
    # loop closure: pose 4 should coincide with pose 0
    system.add_edge("edge_pose2d", (0, 4), np.array([0.0, 0.0, 0.0]), info)

    solver = GaussNewtonSolver(system, verbose=True)
    print("initial chi2:", solver.chi2())
    solver.optimize(max_iterations=10, min_dx_norm=1e-9)
    print("final chi2:", solver.chi2())
    for v in range(5):
        print(f"pose {v}:", np.round(system.vertex_state(v), 4))


if __name__ == "__main__":
    main()
