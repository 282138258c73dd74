#!/usr/bin/env python
"""Phase-level profile of the Manhattan GN step on the live device."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import slampp_tpu  # noqa (x64 on)
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

from slampp_tpu.io.datasets import make_manhattan
from slampp_tpu.io.parser import parse_file, build_system
from slampp_tpu.linear.native import NativeBlockSolver
from slampp_tpu.core import block_assembly, sparse_chol2
from slampp_tpu.core.assembly import apply_update


def timeit(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") and x.size else x,
        out,
    )
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    # force completion via host fetch of one leaf
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(leaves[0])
    return (time.perf_counter() - t0) / n, out


def main():
    import tempfile

    n_poses = int(os.environ.get("BENCH_POSES", "3500"))
    panel = int(os.environ.get("BENCH_PANEL", "8"))
    text, gt = make_manhattan(n_poses=n_poses, loop_prob=0.1, seed=0)
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        system = build_system(parse_file(path))
    finally:
        os.unlink(path)

    ns = NativeBlockSolver(system, panel=panel, mixed_precision=True, refine_iters=1, engine="v2")
    t0 = time.perf_counter()
    ns.symbolic()
    print(f"symbolic: {time.perf_counter()-t0:.3f}s")
    bp, plan2 = ns.block_plan, ns.plan2
    print(f"plan: n={plan2.n} n_off={plan2.n_off} n_levels={plan2.n_levels} "
          f"max_cols={plan2.max_cols} max_off={plan2.max_off} max_ud={plan2.max_ud} "
          f"max_uo={plan2.max_uo} max_fw={plan2.max_fw} P={bp.P}")

    graph = system.snapshot()

    # phase 1: assembly
    asm = jax.jit(lambda g: block_assembly.assemble_blocks_sorted(g, bp))
    t, (vals, rhs, chi2) = timeit(asm, graph)
    print(f"assembly: {t*1e3:.2f} ms")

    n, n_off = plan2.n, plan2.n_off
    Dvals = vals[:n]
    OffVals = vals[n:n + n_off]
    b = -rhs[:-1]

    # phase 2: factorize f32
    Dd = Dvals.astype(jnp.float32)
    Od = OffVals.astype(jnp.float32)
    fac = jax.jit(lambda D, O: sparse_chol2.factorize2(plan2, D, O, clamp=1e-8))
    t, (Ld, Lo) = timeit(fac, Dd, Od)
    print(f"factorize2 (f32): {t*1e3:.2f} ms")

    # phase 3: solve
    sol = jax.jit(lambda Ld, Lo, b: sparse_chol2.solve2(plan2, Ld, Lo, b))
    t, x = timeit(sol, Ld, Lo, b.astype(jnp.float32))
    print(f"solve2 (f32): {t*1e3:.2f} ms")

    # phase 4: spmv
    spmv = jax.jit(lambda D, O, x: sparse_chol2.spmv2(plan2, D, O, x))
    t, _ = timeit(spmv, Dvals, OffVals, b)
    print(f"spmv2 (f64): {t*1e3:.2f} ms")

    # phase 5: refined solve (what the gn step calls)
    rsol = jax.jit(lambda D, O, b: sparse_chol2.solve_refined2(plan2, D, O, b, refine_iters=1))
    t, _ = timeit(rsol, Dvals, OffVals, b)
    print(f"solve_refined2 (1 refine): {t*1e3:.2f} ms")

    # phase 6: full gn step
    t, _ = timeit(ns.gn_step, graph)
    print(f"full gn_step: {t*1e3:.2f} ms")

    # phase 7: fused 5-iteration
    t0 = time.perf_counter()
    out = ns.optimize_fused(graph, n_iters=5)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    print(f"fused-5 first (incl compile): {time.perf_counter()-t0:.2f} s")
    t, out = timeit(ns.optimize_fused, graph, 5, n=10)
    print(f"fused-5 steady: {t*1e3:.2f} ms -> {5/t:.1f} iter/s, chi2={float(out[3]):.2f}")


if __name__ == "__main__":
    main()
