"""Schur-ordering FLOP study
(reference: src/slam_schur_orderings — HPC'17 research app comparing the FLOP
cost of direct factorization vs Schur-complement elimination under different
orderings, using exact FLOP counting).

Here the exact-FLOP instrument is XLA's cost analysis (utils/flops.py,
the sparse_flops/Instrument.h analog).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import tempfile

    import jax
    import jax.numpy as jnp
    from jax import lax

    from slampp_tpu.core import assembly
    from slampp_tpu.io.datasets import make_ba_scene
    from slampp_tpu.io.parser import build_system, parse_file
    from slampp_tpu.linear.schur import build_schur_plan, schur_solve
    from slampp_tpu.utils.flops import flops

    text, _ = make_ba_scene(n_cams=10, n_points=200, obs_per_point=5, seed=0)
    with tempfile.NamedTemporaryFile("w", suffix=".g2o", delete=False) as f:
        f.write(text)
        path = f.name
    system = build_system(parse_file(path))
    os.unlink(path)

    graph = system.snapshot()
    H, g, _ = jax.jit(assembly.assemble_dense)(graph)
    plan = build_schur_plan(system)
    N = H.shape[0]
    print(f"system: {N} states, {plan.cam_idx.shape[0]} camera scalars, "
          f"{plan.lm_offsets.shape[0]} landmarks")

    f_direct = flops(lambda H, b: lax.linalg.cholesky(H + 1e-3 * jnp.eye(N)), H, g)
    f_schur = flops(lambda H, b: schur_solve(H, b, plan, alpha=1e-3), H, g)
    print(f"direct dense Cholesky FLOPs: {f_direct:.3e}")
    print(f"Schur-eliminated solve FLOPs: {f_schur:.3e}")
    print(f"Schur/direct ratio: {f_schur / f_direct:.3f}")


if __name__ == "__main__":
    main()
