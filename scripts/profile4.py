#!/usr/bin/env python
"""v3 solve internals breakdown on TPU."""
import os, sys, time
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
import numpy as np
import slampp_tpu
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
from slampp_tpu.io.datasets import make_manhattan
from slampp_tpu.io.parser import parse_file, build_system
from slampp_tpu.linear import partitioned as P
from slampp_tpu.core import block_assembly
import tempfile

def timeit(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n, out

text, gt = make_manhattan(n_poses=3500, loop_prob=0.1, seed=0)
with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
    f.write(text); path = f.name
system = build_system(parse_file(path)); os.unlink(path)
ps = P.PartitionedSolver(system, target=64, mixed_precision=True, refine_iters=0)
ps.symbolic()
p, bp = ps.plan, ps.block_plan
graph = system.snapshot()

vals, rhs, chi2 = jax.jit(lambda g: block_assembly.assemble_blocks_sorted(g, bp, hessian_f32=True))(graph)
bs, n = p.bs, p.n

# equilibrate + frames (no factor)
def stage_frames(vals, rhs):
    d = jnp.arange(bs)
    diag = vals[:n, d, d]
    s = 1.0 / jnp.sqrt(jnp.maximum(diag, 1e-30))
    vs = vals[:p.nnzb] * s[p.rows][:, :, None] * s[p.cols][:, None, :]
    b32 = jnp.concatenate([(s * (-rhs[:n])).astype(jnp.float32), jnp.zeros((1, bs), jnp.float32)], 0)
    valsT = jnp.swapaxes(vs, 1, 2)
    Gv = jnp.concatenate([vs, valsT, jnp.zeros((1, bs, bs), vs.dtype)], 0)
    return P._frames(p, Gv, b32, vs.dtype)

t, (A, U, Ass, gk, gs) = timeit(jax.jit(stage_frames), vals, rhs)
print(f"equilibrate+frames: {t*1e3:.2f} ms", flush=True)

from slampp_tpu.ops import dense_kernels as dk
t, L = timeit(jax.jit(dk.chol_batched), A)
print(f"chol_batched (55,192,192): {t*1e3:.2f} ms  [pallas={dk._use_pallas()}]", flush=True)
B = jnp.concatenate([U, gk[..., None]], -1)
B = jnp.pad(B, ((0, 0), (0, 0), (0, (-B.shape[-1]) % 8)))
t, W = timeit(jax.jit(dk.trsm_lower_batched), L, B)
print(f"trsm_fwd (55,192,{B.shape[-1]}): {t*1e3:.2f} ms", flush=True)

fac = jax.jit(lambda v, b: P._factor32(p, v, b))
b32 = jnp.concatenate([(-rhs[:n]).astype(jnp.float32), jnp.zeros((1, bs), jnp.float32)], 0)
vals32 = vals[:p.nnzb].astype(jnp.float32)
t, (L2, WU, y, Ls, rhs_s) = timeit(fac, vals32, b32)
print(f"_factor32 total: {t*1e3:.2f} ms", flush=True)
t, _ = timeit(jax.jit(lambda *a: P._backsolve(p, *a)), L2, WU, Ls, y, rhs_s)
print(f"_backsolve: {t*1e3:.2f} ms", flush=True)

solve = jax.jit(lambda v, b: P._v3_solve_refined(p, v, b, 0, 1e-6, True))
t, x = timeit(solve, vals, -rhs)
print(f"solve refine=0 total: {t*1e3:.2f} ms", flush=True)

from slampp_tpu.core.assembly import apply_update
def tail(x, g):
    dx = block_assembly.scatter_dx(bp, x, bp.bs)
    return apply_update(g, dx), jnp.linalg.norm(dx)
t, _ = timeit(jax.jit(tail), x, graph)
print(f"scatter_dx+apply_update: {t*1e3:.2f} ms", flush=True)
