#!/usr/bin/env python
"""Driver benchmark: Manhattan-3500-class batch Gauss-Newton on TPU.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The north-star metric (BASELINE.json) is pose-graph iterations/sec +
time-to-chi2 on Manhattan-3500; the reference's published number is 0.0419 s
for a 5-iteration batch solve on a 2013 desktop CPU (BASELINE.md row 2), i.e.
119 iterations/sec.  The reference datasets are not downloadable here
(zero egress), so the benchmark runs a synthetic Manhattan-world graph of the
same size (3500 poses, ~10.5k states) and reports GN iterations/sec
(post-compile steady state, chi2-converging iterations on real data shapes).

vs_baseline = our iterations/sec / reference iterations/sec (>1 is faster).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

import slampp_tpu  # noqa: E402  (x64 on)
import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

from slampp_tpu.io.datasets import make_manhattan  # noqa: E402
from slampp_tpu.io.parser import parse_file, build_system  # noqa: E402
from slampp_tpu.linear.native import NativeBlockSolver  # noqa: E402


def main():
    import tempfile

    n_poses = int(os.environ.get("BENCH_POSES", "3500"))
    panel = int(os.environ.get("BENCH_PANEL", "8"))
    mixed = os.environ.get("BENCH_F64", "") == ""  # default: mixed precision
    text, gt = make_manhattan(n_poses=n_poses, loop_prob=0.1, seed=0)
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        system = build_system(parse_file(path))
    finally:
        os.unlink(path)

    # native block-sparse Cholesky, v2 scatter-free engine: supernodal panels
    # + f32 factor with f64 iterative refinement (converges to the identical
    # chi2 as f64, see tests/test_aux.py and tests/test_sparse_chol2.py)
    ns = NativeBlockSolver(
        system, panel=panel, mixed_precision=mixed, refine_iters=1, engine="v2"
    )
    t0 = time.perf_counter()
    ns.symbolic()
    t_symbolic = time.perf_counter() - t0

    graph = system.snapshot()

    # full 5-iteration batch solve (reference semantics), timing compilation.
    # NOTE: host syncs force real completion (the experimental axon backend's
    # block_until_ready is advisory), so every timing below round-trips data.
    t0 = time.perf_counter()
    g = graph
    chi2 = None
    for _ in range(5):
        states, dx_norm, chi2 = ns.gn_step(g)
        if float(dx_norm) <= 0.01:
            break
        g = g.replace_states(states)
    from slampp_tpu.core.assembly import graph_chi2

    chi2_final = float(jax.jit(graph_chi2)(g))
    t_first = time.perf_counter() - t0

    # steady-state iterations/sec: a CHAINED run of jitted GN steps (true
    # data dependency step-to-step) with one final host fetch
    n_timed = 20
    t0 = time.perf_counter()
    g = graph
    for _ in range(n_timed):
        states, dx_norm, chi2 = ns.gn_step(g)
        g = g.replace_states(states)
    np.asarray(states[next(iter(states))])  # host sync
    dt = time.perf_counter() - t0
    iters_per_sec = n_timed / dt

    ref_iters_per_sec = 5.0 / 0.0419  # BASELINE.md row 2 (ICRA'13 CPU)
    print(
        json.dumps(
            {
                "metric": "manhattan3500_gn_iters_per_sec",
                "value": round(iters_per_sec, 3),
                "unit": "iter/s",
                "vs_baseline": round(iters_per_sec / ref_iters_per_sec, 3),
                "extra": {
                    "chi2_final": round(chi2_final, 2),
                    "chi2_dof": system.chi2_dof(),
                    "first_solve_s": round(t_first, 3),
                    "symbolic_s": round(t_symbolic, 3),
                    "n_poses": n_poses,
                    "n_edges": system.n_edges,
                    "panel": panel,
                    "mixed_precision": mixed,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
