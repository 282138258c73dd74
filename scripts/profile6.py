#!/usr/bin/env python
"""Chain-mode v3 sub-phase device times (in-program scans, see profile5)."""
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
from slampp_tpu.ops import dense_kernels as dk
import tempfile

R = int(os.environ.get("PROF_REPS", "50"))

def scan_time(fn, label=""):
    def body(c, _):
        out = fn()
        leaf = jax.tree_util.tree_leaves(out)[0]
        return c + jnp.sum(leaf.astype(jnp.float32)) * 1e-30, None

    f = jax.jit(lambda: jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=R)[0])
    f().block_until_ready()
    t0 = time.perf_counter()
    f().block_until_ready()
    dt = (time.perf_counter() - t0) / R
    print(f"{label}: {dt*1e3:.3f} ms/call", flush=True)
    return dt

text, gt = make_manhattan(n_poses=3500, loop_prob=0.1, seed=0)
with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
    f.write(text); path = f.name
system = build_system(parse_file(path)); os.unlink(path)
ps = P.PartitionedSolver(system, target=64, mixed_precision=True, refine_iters=0)
ps.symbolic()
p, bp = ps.plan, ps.block_plan
graph = system.snapshot()
print(f"ch_ok={p.ch_ok} K={p.K} mB={p.mB} S={p.S} SB={p.SB} Ms={p.Ms}", flush=True)

vals, rhs, chi2 = jax.jit(lambda g: block_assembly.assemble_blocks_sorted(g, bp, hessian_f32=True))(graph)
bs, n = p.bs, p.n
d = jnp.arange(bs)
diag = vals[:n, d, d]
sca = 1.0 / jnp.sqrt(jnp.maximum(diag, 1e-30))
vs = (vals[:p.nnzb] * sca[p.rows][:, :, None] * sca[p.cols][:, None, :]).astype(jnp.float32)
b32 = jnp.concatenate([(sca * (-rhs[:n])).astype(jnp.float32), jnp.zeros((1, bs), jnp.float32)], 0)

valsT = jnp.swapaxes(vs, 1, 2)
Gv = jnp.concatenate([vs, valsT, jnp.zeros((1, bs, bs), vs.dtype)], 0)
rhsf = b32

def g_de():
    D = Gv[p.ch_d_idx] + p.ch_pad.astype(jnp.float32)[..., None, None] * jnp.eye(bs, dtype=jnp.float32)
    E = Gv[p.ch_e_idx]
    return D, E
scan_time(g_de, "gather D/E")
D, E = jax.jit(g_de)()

scan_time(lambda: P._chain_gather_U(p, Gv, rhsf), "gather U/gk")
Ub, gk = jax.jit(lambda: P._chain_gather_U(p, Gv, rhsf))()
scan_time(lambda: P._chain_sep_frames(p, Gv, rhsf, jnp.float32), "gather Ass/gs")
Ass, gs = jax.jit(lambda: P._chain_sep_frames(p, Gv, rhsf, jnp.float32))()

scan_time(lambda: P._cr_build(D, E)[0][0][0], "cr_build")
B = jnp.concatenate([Ub, gk[..., None]], -1)

def build_and_solve():
    levels, root = P._cr_build(D, E)
    return P._cr_solve(levels, root, B)

scan_time(build_and_solve, f"cr_build+solve rhs={B.shape[-1]}")
X = jax.jit(build_and_solve)()
Xu = P._chain_flat(p, X[..., : p.S])
Xg = P._chain_flat(p, X[..., p.S])
Uflat = P._chain_flat(p, Ub)

def c_and_reduce():
    C = jnp.einsum("kms,kmt->kst", Uflat, Xu, precision=P.HI)
    return P._chain_sc_reduce(p, C)
scan_time(c_and_reduce, "C einsum + sc reduce")
SCsub = jax.jit(c_and_reduce)()
SC = Ass - jnp.pad(SCsub, ((0, p.Ms - p.SB * bs), (0, p.Ms - p.SB * bs)))
scan_time(lambda: dk.chol_batched(SC[None]), f"sep chol (1,{p.Ms},{p.Ms})")
Ls = jax.jit(lambda: dk.chol_batched(SC[None]))()

def rhs_part():
    v = jnp.einsum("kms,km->ks", Uflat, Xg, precision=P.HI)
    return P._chain_rhs_reduce(p, v)
scan_time(rhs_part, "rhs reduce")
vsub = jax.jit(rhs_part)()
rhs_s = gs - jnp.pad(vsub, (0, p.Ms - p.SB * bs))
scan_time(lambda: P._chain_backsolve(p, Xu, Xg, Ls, rhs_s), "backsolve (sep trsm + xk)")

scan_time(lambda: P._chain_factor32(p, vs, b32), "chain_factor32 TOTAL")
