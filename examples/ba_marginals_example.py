"""Schur-based covariance recovery in BA
(reference: src/ba_marginals_example, 3DV'17).

Optimizes a synthetic BA scene, then recovers camera covariances from the
inverse Schur complement and landmark covariances from them, comparing
against the dense reference algorithm.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import tempfile

    import jax

    from slampp_tpu.core import assembly
    from slampp_tpu.io.datasets import make_ba_scene
    from slampp_tpu.io.parser import build_system, parse_file
    from slampp_tpu.linear.schur import build_schur_plan
    from slampp_tpu.marginals import dense_marginals, schur_marginals
    from slampp_tpu.solvers import LevenbergMarquardtSolver

    text, _ = make_ba_scene(n_cams=8, n_points=80, obs_per_point=5, seed=0)
    with tempfile.NamedTemporaryFile("w", suffix=".g2o", delete=False) as f:
        f.write(text)
        path = f.name
    system = build_system(parse_file(path))
    os.unlink(path)

    solver = LevenbergMarquardtSolver(system, use_schur=True)
    solver.optimize(10, 1e-8)
    print("chi2 after BA:", solver.chi2())

    graph = system.snapshot()
    plan = build_schur_plan(system)
    H, _, _ = jax.jit(assembly.assemble_dense)(graph)
    alpha = 1e-3  # lift the mono gauge for the covariance query
    Sigma_cc, Sigma_ll = schur_marginals(H, plan, alpha=alpha)
    print("camera-0 position std:", np.sqrt(np.diag(np.array(Sigma_cc))[:3]))
    print("first landmark covariance diag:", np.diag(np.array(Sigma_ll[0])))

    # cross-check one landmark block against the dense reference algorithm
    import jax.numpy as jnp

    Sigma_ref = dense_marginals(H + alpha * jnp.eye(H.shape[0]))
    off = int(np.array(plan.lm_offsets)[0])
    ref_blk = np.array(Sigma_ref)[off : off + 3, off : off + 3]
    print("dense-reference match:", np.allclose(np.array(Sigma_ll[0]), ref_blk, atol=1e-7))


if __name__ == "__main__":
    main()
