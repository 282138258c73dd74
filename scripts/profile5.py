#!/usr/bin/env python
"""v3 per-phase DEVICE times: each phase scanned R times inside ONE jitted
program, so the remote-tunnel dispatch latency (~5-20 ms/call) amortizes
away and the numbers are true device occupancy (profile4's isolated-call
timings are dispatch-dominated on the axon tunnel)."""
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

R = int(os.environ.get("PROF_REPS", "50"))

def scan_time(fn, *args, label=""):
    """device time per call: scan fn R times inside one jit."""
    def body(c, _):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        # data dependence so the scan isn't folded away
        return c + jnp.sum(leaf.astype(jnp.float32)) * 1e-30, None

    f = jax.jit(lambda: jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=R)[0])
    f().block_until_ready()  # compile
    t0 = time.perf_counter()
    f().block_until_ready()
    dt = (time.perf_counter() - t0) / R
    print(f"{label}: {dt*1e3:.3f} ms/call  ({R} reps in-program)", flush=True)
    return dt

text, gt = make_manhattan(n_poses=int(os.environ.get("PROF_POSES", "3500")),
                          loop_prob=0.1, seed=0)
with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
    f.write(text); path = f.name
system = build_system(parse_file(path)); os.unlink(path)
ps = P.PartitionedSolver(system, target=int(os.environ.get("PROF_TARGET", "64")),
                         mixed_precision=True, refine_iters=0)
ps.symbolic()
p, bp = ps.plan, ps.block_plan
graph = system.snapshot()
print(f"K={p.K} M={p.M} S={p.S} SB={p.SB} Ms={p.Ms} n={p.n} nnzb={p.nnzb}", flush=True)

vals, rhs, chi2 = jax.jit(lambda g: block_assembly.assemble_blocks_sorted(g, bp, hessian_f32=True))(graph)
bs, n = p.bs, p.n

scan_time(lambda: block_assembly.assemble_blocks_sorted(graph, bp, hessian_f32=True),
          label="assemble_blocks_sorted")

def stage_frames():
    d = jnp.arange(bs)
    diag = vals[:n, d, d]
    s = 1.0 / jnp.sqrt(jnp.maximum(diag, 1e-30))
    vs = vals[:p.nnzb] * s[p.rows][:, :, None] * s[p.cols][:, None, :]
    b32 = jnp.concatenate([(s * (-rhs[:n])).astype(jnp.float32), jnp.zeros((1, bs), jnp.float32)], 0)
    valsT = jnp.swapaxes(vs, 1, 2)
    Gv = jnp.concatenate([vs, valsT, jnp.zeros((1, bs, bs), vs.dtype)], 0)
    return P._frames(p, Gv, b32, vs.dtype)

scan_time(stage_frames, label="equilibrate+frames")
A, U, Ass, gk, gs = jax.jit(stage_frames)()

from slampp_tpu.ops import dense_kernels as dk
scan_time(lambda: dk.chol_batched(A), label=f"chol_batched ({p.K},{p.M},{p.M})")
L = jax.jit(lambda: dk.chol_batched(A))()
B = jnp.concatenate([U, gk[..., None]], -1)
B = jnp.pad(B, ((0, 0), (0, 0), (0, (-B.shape[-1]) % 8)))
scan_time(lambda: dk.trsm_lower_batched(L, B), label=f"trsm_fwd ({p.K},{p.M},{B.shape[-1]})")

vals32 = vals[:p.nnzb].astype(jnp.float32)
b32 = jnp.concatenate([(-rhs[:n]).astype(jnp.float32), jnp.zeros((1, bs), jnp.float32)], 0)
scan_time(lambda: P._factor32(p, vals32, b32), label="_factor32 total")
L2, WU, y, Ls, rhs_s = jax.jit(lambda: P._factor32(p, vals32, b32))()
scan_time(lambda: P._backsolve(p, L2, WU, Ls, y, rhs_s), label="_backsolve")
scan_time(lambda: P._v3_solve_refined(p, vals, -rhs, 0, 1e-6, True),
          label="solve total")

from slampp_tpu.core.assembly import apply_update
x = jax.jit(lambda: P._v3_solve_refined(p, vals, -rhs, 0, 1e-6, True))()

def tail():
    dx = block_assembly.scatter_dx(bp, x, bp.bs)
    return apply_update(graph, dx), jnp.linalg.norm(dx)

scan_time(tail, label="scatter_dx+apply_update")

def full_iter():
    v, r_, c = block_assembly.assemble_blocks_sorted(graph, bp, hessian_f32=True)
    xx = P._v3_solve_refined(p, v, -r_, 0, 1e-6, True)
    dx = block_assembly.scatter_dx(bp, xx, bp.bs)
    return apply_update(graph, dx), c

scan_time(full_iter, label="FULL GN iteration")
