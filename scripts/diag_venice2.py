#!/usr/bin/env python
"""Sub-stage bisect of the Venice cam-blocks stage (the TPU-killer)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import slampp_tpu  # noqa: F401
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


def memstats(tag):
    try:
        ms = jax.devices()[0].memory_stats()
        log(f"  mem[{tag}]: in_use={ms.get('bytes_in_use', 0)/2**30:.2f}GiB peak={ms.get('peak_bytes_in_use', 0)/2**30:.2f}GiB")
    except Exception:
        pass


n_cams = int(os.environ.get("DIAG_CAMS", "871"))
n_points = int(os.environ.get("DIAG_POINTS", "110000"))
mean_track = int(os.environ.get("DIAG_TRACK", "6"))

cams, lms, oc, ol, uv, info, _ = make_venice_ba_arrays(
    n_cams=n_cams, n_points=n_points, mean_track=mean_track, seed=0
)
log(f"n_obs={len(oc)}")
plan = B.build_ba_schur_plan_arrays(n_cams, n_points, oc, ol, uv, info)
cam_states = jnp.asarray(cams)
lm_states = jnp.asarray(lms)
alpha = jnp.asarray(1e-3)


def stage(name, fn, *args):
    t0 = time.perf_counter()
    out = jax.jit(fn)(*args)
    out = jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    log(f"stage {name}: ok in {time.perf_counter() - t0:.1f}s")
    memstats(name)
    return out


def s1(lm_states, cam_states):
    return B._jacs_chunked(lm_states[plan.obs_lm], cam_states[plan.obs_cam], plan.obs_uv)

r, Jp, Jc = stage("jacs", s1, lm_states, cam_states)


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

m = int(r.shape[-1])

# --- sub-stages of cam-blocks
Hcc_e = stage("s3a-HccE", lambda Jc, WJc: jnp.sum(Jc[:, :, None, :] * WJc[:, None, :, :], axis=0).reshape(36, m), Jc, WJc)
Hg = stage("s3b-gather", lambda Hcc_e: Hcc_e[:, plan.cam_perm], Hcc_e)
Hcc_diag = stage("s3c-segsum", lambda Hg: B._segsum_last(Hg, plan.cam_starts, plan.cam_ends).reshape(6, 6, plan.n_c), Hg)
gc_e = stage("s3d-gcE", lambda WJc, r: jnp.sum(WJc * r[:, None, :], axis=0), WJc, r)
g_c = stage("s3e-gcseg", lambda gc_e: B._segsum_last(gc_e[:, plan.cam_perm], plan.cam_starts, plan.cam_ends), gc_e)
Dinv_obs = stage("s3f-DinvGather", lambda Dinv: Dinv.reshape(9, -1)[:, plan.obs_lm].reshape(3, 3, m), Dinv)
Bc = stage("s3g-B", lambda Jc, WJp: jnp.sum(Jc[:, :, None, :] * WJp[:, None, :, :], axis=0), Jc, WJp)
BD = stage("s3h-BD", lambda Bc, Dinv_obs: jnp.sum(Bc[:, :, None, :] * Dinv_obs[None, :, :, :], axis=1), Bc, Dinv_obs)
log("ALL SUBSTAGES PASS")
