#!/usr/bin/env python
"""Profile round 2: v3 partitioned solver on TPU + assembly dissection."""
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
from slampp_tpu.linear.partitioned import PartitionedSolver
from slampp_tpu.core import block_assembly


def timeit(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n, out


def main():
    import tempfile

    n_poses = int(os.environ.get("BENCH_POSES", "3500"))
    text, gt = make_manhattan(n_poses=n_poses, loop_prob=0.1, seed=0)
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        system = build_system(parse_file(path))
    finally:
        os.unlink(path)

    for target in [64, 128]:
        ps = PartitionedSolver(system, target=target, mixed_precision=True, refine_iters=1)
        t0 = time.perf_counter()
        ps.symbolic()
        tsym = time.perf_counter() - t0
        p = ps.plan
        print(f"v3 target={target}: sym={tsym:.1f}s K={p.K} mB={p.mB} sB={p.sB} "
              f"SB={p.SB} M={p.M} S={p.S} Ms={p.Ms}", flush=True)
        graph = system.snapshot()
        t, out = timeit(ps.gn_step, graph)
        print(f"  gn_step (mixed, refine=1): {t*1e3:.2f} ms", flush=True)
        t, out = timeit(ps.optimize_fused, graph, 5, n=10)
        print(f"  fused-5: {t*1e3:.2f} ms -> {5/t:.1f} iter/s chi2={float(out[3]):.2f}", flush=True)

    ps = PartitionedSolver(system, target=64, mixed_precision=True, refine_iters=0)
    ps.symbolic()
    graph = system.snapshot()
    t, out = timeit(ps.optimize_fused, graph, 5, n=10)
    print(f"v3 target=64 refine=0 fused-5: {t*1e3:.2f} ms -> {5/t:.1f} iter/s chi2={float(out[3]):.2f}", flush=True)

    bp = ps.block_plan

    # assembly dissection
    asm = jax.jit(lambda g: block_assembly.assemble_blocks_sorted(g, bp))
    t, (vals, rhs, chi2) = timeit(asm, graph)
    print(f"assembly f64 (fine, v3 plan): {t*1e3:.2f} ms", flush=True)

    def terms_only(g):
        out = []
        c = 0.0
        for name in bp.type_order:
            hb, gv, c2 = block_assembly._edge_type_terms(g, bp, name)
            out.extend(hb)
            out.extend(gv)
            c = c + c2
        return jnp.concatenate([o.reshape(o.shape[0], -1) for o in out], 1), c

    t, _ = timeit(jax.jit(terms_only), graph)
    print(f"  terms only (jac+blocks+chi2) f64: {t*1e3:.2f} ms", flush=True)

    # f32 variant of the whole assembly
    def asm32(g):
        g32 = g.replace_states({k: v.astype(jnp.float32) for k, v in g.states.items()})
        import dataclasses
        edges32 = {}
        for nm, ea in g32.edges.items():
            edges32[nm] = dataclasses.replace(
                ea, meas=ea.meas.astype(jnp.float32),
                sigma_inv=ea.sigma_inv.astype(jnp.float32),
            )
        g32 = dataclasses.replace(g32, edges=edges32)
        return block_assembly.assemble_blocks_sorted(g32, bp)

    try:
        t, _ = timeit(jax.jit(asm32), graph)
        print(f"  full assembly f32: {t*1e3:.2f} ms", flush=True)
    except Exception as e:
        print(f"  f32 assembly failed: {e}", flush=True)


if __name__ == "__main__":
    main()
