"""Non-SLAM NLS demo: cubic polynomial fitting with a custom vertex/edge
(reference: src/poly_fitting_example/Main.cpp:145-188) — shows that the
framework is a general sparse least-squares engine, not just SLAM.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp

from slampp_tpu.graph.system import GraphSystem
from slampp_tpu.graph.types import EdgeType, VertexType, register_edge_type, register_vertex_type
from slampp_tpu.solvers import GaussNewtonSolver

# custom vertex: the 4 cubic coefficients; custom edge: one (x, y) sample
COEFFS = register_vertex_type(
    VertexType(name="poly_coeffs", dim=4, retract=lambda c, d: c + d)
)

SAMPLE = register_edge_type(
    EdgeType(
        name="poly_sample",
        vertex_types=("poly_coeffs",),
        res_dim=1,
        meas_dim=2,  # (x, y)
        error_fn=lambda xs, z: (
            z[1] - (xs[0][0] + xs[0][1] * z[0] + xs[0][2] * z[0] ** 2 + xs[0][3] * z[0] ** 3)
        )[None],
    )
)


def main():
    rng = np.random.default_rng(0)
    true_c = np.array([0.5, -1.2, 0.3, 0.05])
    xs = np.linspace(-3, 3, 50)
    ys = np.polyval(true_c[::-1], xs) + rng.normal(0, 0.05, len(xs))

    system = GraphSystem()
    system.add_vertex("poly_coeffs", 0, np.zeros(4))
    for x, y in zip(xs, ys):
        system.add_edge("poly_sample", (0,), np.array([x, y]), np.eye(1) / 0.05**2)

    solver = GaussNewtonSolver(system, linear_solver="dense")
    solver.optimize(max_iterations=10, min_dx_norm=1e-12)
    est = system.vertex_state(0)
    print("true coeffs:", true_c)
    print("est coeffs: ", np.round(est, 4))
    print("chi2:", solver.chi2(), " dof:", system.chi2_dof())


if __name__ == "__main__":
    main()
