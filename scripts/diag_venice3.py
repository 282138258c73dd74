#!/usr/bin/env python
"""Runtime breakdown of the full-scale Venice LM step + gather micro-bench."""
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
from slampp_tpu.ops.segments import grouped_segsum_last


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def bench(name, fn, *args, n=3):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = jax.tree_util.tree_map(lambda x: x.block_until_ready(), f(*args))
    t_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t_r = (time.perf_counter() - t0) / n
    log(f"{name}: compile {t_c:.1f}s  run {t_r*1e3:.0f}ms")
    return out


# ---------------- gather micro-bench at Venice scale
m = 1_107_724
rng = np.random.default_rng(0)
tbl_last = jnp.asarray(rng.normal(size=(18, m)))        # batch-last f64
tbl_first = jnp.asarray(np.asarray(tbl_last).T.copy())  # batch-first f64
idx = jnp.asarray(rng.integers(0, m, 4_000_000), jnp.int32)

bench("gather-lane-f64 (18, m)[:, idx4M]", lambda t: t[:, idx].sum(), tbl_last)
bench("gather-row-f64  (m, 18)[idx4M]", lambda t: t[idx].sum(), tbl_first)
bench("gather-lane-f32", lambda t: t[:, idx].sum(), tbl_last.astype(jnp.float32))
bench("gather-row-f32", lambda t: t[idx].sum(), tbl_first.astype(jnp.float32))

# ---------------- full-scale stage timing
cams, lms, oc, ol, uv, info, _ = make_venice_ba_arrays(
    n_cams=871, n_points=110000, mean_track=10, seed=0
)
log(f"n_obs={len(oc)}")
plan = B.build_ba_schur_plan_arrays(871, 110000, oc, ol, uv, info)
cam_states = jnp.asarray(cams)
lm_states = jnp.asarray(lms)
alpha = jnp.asarray(1e-3)

r, Jp, Jc = bench("jacs", lambda l, c: B._jacs_chunked(
    l[plan.obs_lm], c[plan.obs_cam], plan.obs_uv), lm_states, cam_states)


def s2(r, Jp, Jc):
    Wt = jnp.moveaxis(plan.obs_info, 0, -1)
    WJc = jnp.sum(Wt[:, :, None, :] * Jc[None, :, :, :], axis=1)
    WJp = jnp.sum(Wt[:, :, None, :] * Jp[None, :, :, :], axis=1)
    D = grouped_segsum_last(
        jnp.sum(Jp[:, :, None, :] * WJp[:, None, :, :], axis=0).reshape(9, -1),
        plan.lm_grp).reshape(3, 3, plan.n_l)
    g_l = grouped_segsum_last(jnp.sum(WJp * r[:, None, :], axis=0), plan.lm_grp)
    D = D + alpha * jnp.eye(3, dtype=D.dtype)[:, :, None]
    Dinv = B._inv3_last(D)
    return WJc, WJp, g_l, Dinv

WJc, WJp, g_l, Dinv = bench("lm-blocks", s2, r, Jp, Jc)

mm = r.shape[-1]

def s3(r, Jc, WJc, WJp, Dinv):
    Hcc_e = jnp.sum(Jc[:, :, None, :] * WJc[:, None, :, :], axis=0).reshape(36, mm)
    gc_e = jnp.sum(WJc * r[:, None, :], axis=0)
    Hcc_diag = grouped_segsum_last(Hcc_e, plan.cam_grp).reshape(6, 6, plan.n_c)
    g_c = grouped_segsum_last(gc_e, plan.cam_grp)
    Dinv_obs = Dinv.reshape(9, -1)[:, plan.obs_lm].reshape(3, 3, mm)
    Bc = jnp.sum(Jc[:, :, None, :] * WJp[:, None, :, :], axis=0)
    BD = jnp.sum(Bc[:, :, None, :] * Dinv_obs[None, :, :, :], axis=1)
    return Hcc_diag, g_c, Bc, BD

Hcc_diag, g_c, Bc, BD = bench("cam-blocks", s3, r, Jc, WJc, WJp, Dinv)

B2 = Bc.reshape(18, mm)
BD2 = BD.reshape(18, mm)
mass = bench("pair-mass", lambda a, b: B._pair_sc_mass(plan, a, b), BD2, B2)

def s5(mass, Hcc_diag):
    n_c = plan.n_c
    SCf = -mass[:, plan.sc_inv_map]
    diag_ids = jnp.arange(n_c) * (n_c + 1)
    diag_add = Hcc_diag + alpha * jnp.eye(6, dtype=SCf.dtype)[:, :, None]
    SCf = SCf.at[:, diag_ids].add(diag_add.reshape(36, n_c))
    SC = SCf.reshape(6, 6, n_c, n_c).transpose(2, 0, 3, 1).reshape(n_c * 6, n_c * 6)
    s = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(SC), 1e-30))
    SCs = (SC * s[:, None] * s[None, :]).astype(jnp.float32)
    SCs = SCs + 1e-6 * jnp.eye(SC.shape[0], dtype=jnp.float32)
    L = jax.lax.linalg.cholesky(SCs)
    return L

L = bench("sc-factor", s5, mass, Hcc_diag)
log("chi2-only:")
chi2 = bench("chi2-only", lambda c, l: B.ba_chi2_only(plan, c, l), cam_states, lm_states)
log("DONE")
