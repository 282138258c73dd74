#!/usr/bin/env python
"""Venice BigBA step phase times (in-program scans; see profile5/6).

CAUTION: probes consume ALL returned leaves (sum over the full pytree) so
XLA cannot dead-code-eliminate phases (the profile6 lesson)."""
import os, sys, time
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
import numpy as np
import slampp_tpu
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
from slampp_tpu.io.datasets import make_venice_ba_arrays
from slampp_tpu.linear import ba_schur as BA
from slampp_tpu.ops.segments import grouped_segsum_last

R = int(os.environ.get("PROF_REPS", "5"))
n_cams = int(os.environ.get("PROF_CAMS", "871"))
n_pts = int(os.environ.get("PROF_PTS", "110000"))

def scan_time(fn, *args, label=""):
    # args are REAL jit arguments (not closure constants) so XLA cannot
    # constant-fold the probe away
    def body(c, _):
        out = fn(*[a * (1.0 + c * 1e-30) if hasattr(a, 'dtype') and a.dtype.kind == 'f' else a for a in body.args])
        acc = c
        for leaf in jax.tree_util.tree_leaves(out):
            acc = acc + jnp.sum(leaf.astype(jnp.float32)) * 1e-30
        return acc, None

    def run(*args):
        body.args = args
        return jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=R)[0]

    f = jax.jit(run)
    f(*args).block_until_ready()
    t0 = time.perf_counter()
    f(*args).block_until_ready()
    dt = (time.perf_counter() - t0) / R
    print(f"{label}: {dt*1e3:.1f} ms/call", flush=True)
    return dt

cams, lms, oc, ol, uv, info, _ = make_venice_ba_arrays(
    n_cams=n_cams, n_points=n_pts, mean_track=10, seed=0
)
plan = BA.build_ba_schur_plan_arrays(n_cams, n_pts, oc, ol, uv, info)
cam_states = jnp.asarray(cams)
lm_states = jnp.asarray(lms)
m = int(plan.n_obs)
print(f"n_obs={m} n_distinct={plan.n_distinct}", flush=True)

def jacs(lm_s, cam_s):
    return BA._jacs_chunked(
        lm_s[plan.obs_lm], cam_s[plan.obs_cam], plan.obs_uv
    )

scan_time(jacs, lm_states, cam_states, label="jacobians (1.1M obs)")
r, Jp, Jc = jax.jit(jacs)(lm_states, cam_states)

Wt = jnp.moveaxis(plan.obs_info, 0, -1)

def lm_blocks(Jp_, r_):
    WJp_ = jnp.sum(Wt[:, :, None, :] * Jp_[None, :, :, :], axis=1)
    D_ = grouped_segsum_last(
        jnp.sum(Jp_[:, :, None, :] * WJp_[:, None, :, :], axis=0).reshape(9, -1),
        plan.lm_grp,
    )
    g_l_ = grouped_segsum_last(jnp.sum(WJp_ * r_[:, None, :], axis=0), plan.lm_grp)
    return D_, g_l_

scan_time(lm_blocks, Jp, r, label="landmark D + g_l reductions")

def cam_blocks(Jc_):
    WJc_ = jnp.sum(Wt[:, :, None, :] * Jc_[None, :, :, :], axis=1)
    Hcc_e = jnp.sum(Jc_[:, :, None, :] * WJc_[:, None, :, :], axis=0).reshape(36, m)
    return grouped_segsum_last(Hcc_e, plan.cam_grp)

scan_time(cam_blocks, Jc, label="camera Hcc reduction")

WJp = jnp.sum(Wt[:, :, None, :] * Jp[None, :, :, :], axis=1)
WJc = jnp.sum(Wt[:, :, None, :] * Jc[None, :, :, :], axis=1)
D = grouped_segsum_last(
    jnp.sum(Jp[:, :, None, :] * WJp[:, None, :, :], axis=0).reshape(9, -1),
    plan.lm_grp,
).reshape(3, 3, plan.n_l)
Dinv = BA._inv3_last(D + 1e-3 * jnp.eye(3)[:, :, None])
Dinv_obs = Dinv.reshape(9, -1)[:, plan.obs_lm].reshape(3, 3, m)
B = jnp.sum(Jc[:, :, None, :] * WJp[:, None, :, :], axis=0)

def couplings(Jc_, WJp_):
    Dv = Dinv.reshape(9, -1)[:, plan.obs_lm].reshape(3, 3, m)
    Bv = jnp.sum(Jc_[:, :, None, :] * WJp_[:, None, :, :], axis=0)
    BDv = jnp.sum(Bv[:, :, None, :] * Dv[None, :, :, :], axis=1)
    return Bv, BDv

scan_time(couplings, Jc, WJp, label="B / BD couplings")
BD = jnp.sum(B[:, :, None, :] * Dinv_obs[None, :, :, :], axis=1)
B2 = B.reshape(18, m)
BD2 = BD.reshape(18, m)

def pair_mass(BD2_, B2_):
    return BA._pair_sc_mass(plan, BD2_, B2_, pair_f32=True)

scan_time(pair_mass, BD2, B2, label="pair SC mass (10.9M pairs)")
mass = jax.jit(pair_mass)(BD2, B2)

def sc_solve(mass_):
    G36 = mass_[:, plan.sc_inv_map].astype(jnp.float64)
    Gg = G36.reshape(6, 6, n_cams, n_cams)
    SCf = -(Gg + Gg.transpose(1, 0, 3, 2)).reshape(36, n_cams * n_cams)
    SC = (
        SCf.reshape(6, 6, n_cams, n_cams)
        .transpose(2, 0, 3, 1)
        .reshape(n_cams * 6, n_cams * 6)
    )
    L = jax.lax.linalg.cholesky(SC + 1e3 * jnp.eye(n_cams * 6), symmetrize_input=True)
    return L

scan_time(sc_solve, mass, label="SC mirror + (5226)^2 chol")
