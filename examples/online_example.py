"""Online (incremental) library-usage demo
(reference: src/slam_online_example/Main.cpp:39-79).

Streams edges through IncrementalSolver.incremental_step, the analog of
calling solver.Incremental_Step per added edge.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from slampp_tpu.graph.system import GraphSystem
from slampp_tpu.models import se2
from slampp_tpu.solvers import IncrementalSolver


def main():
    system = GraphSystem()
    solver = IncrementalSolver(system, solve_period=1, max_iterations=5, verbose=True)
    info = np.linalg.inv(np.diag([0.02, 0.02, 0.01]))

    stream = [
        ((0, 1), [1.0, 0.0, np.pi / 2]),
        ((1, 2), [1.05, 0.02, np.pi / 2]),
        ((2, 3), [0.97, -0.01, np.pi / 2]),
        ((3, 4), [1.01, 0.01, np.pi / 2]),
        ((0, 4), [0.0, 0.0, 0.0]),  # loop closure triggers a solve
    ]
    for vids, m in stream:
        system.add_edge("edge_pose2d", vids, np.array(m), info, se2.POSE_POSE_INITIALIZERS)
        solved = solver.incremental_step(vids)
        print(f"edge {vids}: solved={solved}")

    solver.optimize(max_iterations=5)
    print("final chi2:", solver.chi2())


if __name__ == "__main__":
    main()
