#!/usr/bin/env python
"""Stage-by-stage diagnostic for the Venice-scale BA Schur step on TPU.

Runs each device stage of ba_schur_lm_step separately with block_until_ready
between, printing progress — so the exact op that kills the TPU worker is
identified.  Scale via env: DIAG_CAMS / DIAG_POINTS / DIAG_TRACK.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import slampp_tpu  # noqa: F401  (x64 on)
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

from slampp_tpu.io.datasets import make_venice_ba_arrays
from slampp_tpu.linear import ba_schur as B


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


n_cams = int(os.environ.get("DIAG_CAMS", "871"))
n_points = int(os.environ.get("DIAG_POINTS", "110000"))
mean_track = int(os.environ.get("DIAG_TRACK", "6"))

log(f"generating scene cams={n_cams} points={n_points} track={mean_track}")
cams, lms, oc, ol, uv, info, _ = make_venice_ba_arrays(
    n_cams=n_cams, n_points=n_points, mean_track=mean_track, seed=0
)
log(f"n_obs={len(oc)}")
plan = B.build_ba_schur_plan_arrays(n_cams, n_points, oc, ol, uv, info)
log(f"plan built; chunked={plan.chunked} pair_e shape={plan.pair_e.shape}")

cam_states = jnp.asarray(cams)
lm_states = jnp.asarray(lms)
alpha = jnp.asarray(1e-3)

dev = jax.devices()[0]
log(f"device: {dev}")


def stage(name, fn, *args):
    t0 = time.perf_counter()
    out = jax.jit(fn)(*args)
    out = jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    log(f"stage {name}: ok in {time.perf_counter() - t0:.1f}s")
    return out


# --- stage 1: jacobians
def s1(lm_states, cam_states):
    return B._jacs_chunked(lm_states[plan.obs_lm], cam_states[plan.obs_cam], plan.obs_uv)

r, Jp, Jc = stage("jacs", s1, lm_states, cam_states)

# --- stage 2: weighted products + landmark blocks
def s2(r, Jp, Jc):
    Wt = jnp.moveaxis(plan.obs_info, 0, -1)
    Wr = jnp.sum(Wt * r[None, :, :], axis=1)
    chi2 = jnp.sum(r * Wr)
    WJc = jnp.sum(Wt[:, :, None, :] * Jc[None, :, :, :], axis=1)
    WJp = jnp.sum(Wt[:, :, None, :] * Jp[None, :, :, :], axis=1)
    D = B._segsum_last(
        jnp.sum(Jp[:, :, None, :] * WJp[:, None, :, :], axis=0),
        plan.lm_starts, plan.lm_ends,
    )
    g_l = B._segsum_last(jnp.sum(WJp * r[:, None, :], axis=0), plan.lm_starts, plan.lm_ends)
    D = D + alpha * jnp.eye(3, dtype=D.dtype)[:, :, None]
    Dinv = B._inv3_last(D)
    return chi2, WJc, WJp, g_l, Dinv

chi2, WJc, WJp, g_l, Dinv = stage("lm-blocks", s2, r, Jp, Jc)
log(f"chi2={float(chi2):.3f}")

# --- stage 3: camera diag + couplings
def s3(r, Jc, WJc, WJp, Dinv):
    m = r.shape[-1]
    n_c = plan.n_c
    Hcc_e = jnp.sum(Jc[:, :, None, :] * WJc[:, None, :, :], axis=0).reshape(36, m)
    gc_e = jnp.sum(WJc * r[:, None, :], axis=0)
    Hcc_diag = B._segsum_last(Hcc_e[:, plan.cam_perm], plan.cam_starts, plan.cam_ends).reshape(6, 6, n_c)
    g_c = B._segsum_last(gc_e[:, plan.cam_perm], plan.cam_starts, plan.cam_ends)
    Dinv_obs = Dinv.reshape(9, -1)[:, plan.obs_lm].reshape(3, 3, m)
    Bc = jnp.sum(Jc[:, :, None, :] * WJp[:, None, :, :], axis=0)
    BD = jnp.sum(Bc[:, :, None, :] * Dinv_obs[None, :, :, :], axis=1)
    return Hcc_diag, g_c, Bc, BD

Hcc_diag, g_c, Bc, BD = stage("cam-blocks", s3, r, Jc, WJc, WJp, Dinv)

# --- stage 4: SC pair reduction (the suspect)
def s4(Bc, BD, Hcc_diag):
    n_c = plan.n_c
    m = Bc.shape[-1]
    B2 = Bc.reshape(18, m)
    BD2 = BD.reshape(18, m)
    SCf = jnp.zeros((6, 6, n_c * n_c + 1), BD.dtype)

    def pair_reduce(SCf, pe, pf, ids, st, en):
        BDg = BD2[:, pe].reshape(6, 3, pe.shape[-1])
        Bg = B2[:, pf].reshape(6, 3, pf.shape[-1])
        prod = jnp.sum(BDg[:, None, :, :] * Bg[None, :, :, :], axis=2)
        red = B._segsum_last(prod, st, en)
        return SCf.at[:, :, ids].add(-red, indices_are_sorted=True, unique_indices=True)

    if plan.chunked:
        def body(SCf, ch):
            pe, pf, ids, st, en = ch
            return pair_reduce(SCf, pe, pf, ids, st, en), None
        SCf, _ = jax.lax.scan(
            body, SCf,
            (plan.pair_e, plan.pair_f, plan.pair_distinct_flat,
             plan.pair_starts, plan.pair_ends))
    else:
        SCf = pair_reduce(SCf, plan.pair_e, plan.pair_f, plan.pair_distinct_flat,
                          plan.pair_starts, plan.pair_ends)
    diag_ids = jnp.arange(n_c) * (n_c + 1)
    diag_add = Hcc_diag + alpha * jnp.eye(6, dtype=SCf.dtype)[:, :, None]
    SCf = SCf.at[:, :, diag_ids].add(diag_add)
    SC = SCf[:, :, :-1].reshape(6, 6, n_c, n_c).transpose(2, 0, 3, 1).reshape(n_c * 6, n_c * 6)
    return SC

SC = stage("sc-pairs", s4, Bc, BD, Hcc_diag)

# --- stage 5: dense factor + solve
def s5(SC, g_c, BD, g_l):
    n_c = plan.n_c
    r2_e = jnp.sum(BD * g_l[:, plan.obs_lm][None, :, :], axis=1)
    r2 = B._segsum_last(r2_e[:, plan.cam_perm], plan.cam_starts, plan.cam_ends)
    rhs = -(g_c - r2).T.reshape(-1)
    s = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(SC), 1e-30))
    SCs = (SC * s[:, None] * s[None, :]).astype(jnp.float32)
    SCs = SCs + 1e-6 * jnp.eye(SC.shape[0], dtype=jnp.float32)
    L = jax.lax.linalg.cholesky(SCs)
    y = jax.lax.linalg.triangular_solve(L, (s * rhs).astype(jnp.float32)[:, None], left_side=True, lower=True)
    z = jax.lax.linalg.triangular_solve(L, y, left_side=True, lower=True, transpose_a=True)[:, 0]
    return s * z.astype(SC.dtype)

dx_c = stage("sc-solve", s5, SC, g_c, BD, g_l)

# --- stage 6: full step end-to-end
def s6(c, l, a):
    return B.ba_schur_lm_step(plan, c, l, a, sc_f64=False)

out = stage("full-step", s6, cam_states, lm_states, alpha)
log(f"full step ok: chi2={float(out[3]):.2f} dxn={float(out[2]):.4f}")
log("ALL STAGES PASS")
