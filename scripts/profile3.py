#!/usr/bin/env python
"""Profile round 3: v3 numeric validation + phase timing on TPU."""
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np
import slampp_tpu  # noqa
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))

from slampp_tpu.io.datasets import make_manhattan
from slampp_tpu.io.parser import parse_file, build_system
from slampp_tpu.linear.partitioned import PartitionedSolver
from slampp_tpu.core import block_assembly
from slampp_tpu.core.assembly import graph_chi2


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
    system = build_system(parse_file(path))

    # f64 oracle trajectory via CPU subprocess
    code = f"""
import sys; sys.path.insert(0, {ROOT!r})
import jax; jax.config.update("jax_platforms", "cpu")
import slampp_tpu
from slampp_tpu.io.parser import parse_file, build_system
from slampp_tpu.linear.partitioned import PartitionedSolver
from slampp_tpu.core.assembly import graph_chi2
system = build_system(parse_file({path!r}))
ps = PartitionedSolver(system, target=64, mixed_precision=False)
g = system.snapshot()
chis = []
for _ in range(5):
    st, dxn, chi2 = ps.gn_step(g)
    chis.append(float(chi2))
    g = g.replace_states(st)
chis.append(float(jax.jit(graph_chi2)(g)))
print("ORACLE", chis)
"""
    out = subprocess.run([sys.executable, "-u", "-c", code], capture_output=True, text=True)
    for line in out.stdout.splitlines():
        if line.startswith("ORACLE"):
            print("cpu f64 oracle:", line, flush=True)
    if "ORACLE" not in out.stdout:
        print("oracle failed:", out.stdout[-500:], out.stderr[-2000:], flush=True)

    for refine in [1, 0]:
        ps = PartitionedSolver(system, target=64, mixed_precision=True, refine_iters=refine)
        ps.symbolic()
        g = system.snapshot()
        chis = []
        for _ in range(5):
            st, dxn, chi2 = ps.gn_step(g)
            chis.append(round(float(chi2), 3))
            g = g.replace_states(st)
        chis.append(round(float(jax.jit(graph_chi2)(g)), 3))
        print(f"tpu v3 mixed refine={refine} chi2 trajectory: {chis}", flush=True)
        graph = system.snapshot()
        t, _ = timeit(ps.gn_step, graph)
        print(f"  gn_step: {t*1e3:.2f} ms", flush=True)
        t, out2 = timeit(ps.optimize_fused, graph, 5, n=10)
        print(f"  fused-5: {t*1e3:.2f} ms -> {5/t:.1f} iter/s chi2={float(out2[3]):.2f}", flush=True)

    bp = ps.block_plan
    asm = jax.jit(lambda gr: block_assembly.assemble_blocks_sorted(gr, bp, hessian_f32=True))
    t, _ = timeit(asm, graph)
    print(f"assembly mixed-f32: {t*1e3:.2f} ms", flush=True)
    os.unlink(path)


if __name__ == "__main__":
    main()
