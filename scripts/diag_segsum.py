#!/usr/bin/env python
"""Measure f64 segment-reduction strategies on TPU at Venice scale.

(a) plain lane-axis cumsum + boundary gather (current _segsum_last)
(b) two-level tiled cumsum (tile-local cumsum + tiny tile-offset cumsum)
(c) padded-group gather + sum (no cumsum at all)
"""
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


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


m = int(os.environ.get("SEG_M", str(677_481)))
n_seg = int(os.environ.get("SEG_N", "871"))
k = 36

rng = np.random.default_rng(0)
data_np = rng.normal(size=(k, m))
# random sorted segment ids
ids = np.sort(rng.integers(0, n_seg, m))
starts = np.searchsorted(ids, np.arange(n_seg))
ends = np.searchsorted(ids, np.arange(n_seg) + 1)

data = jnp.asarray(data_np)
stj = jnp.asarray(starts, jnp.int32)
enj = jnp.asarray(ends, jnp.int32)

ref = np.zeros((k, n_seg))
np.add.at(ref.T, ids, data_np.T)


def bench(name, fn, *args):
    t0 = time.perf_counter()
    f = jax.jit(fn)
    out = f(*args)
    out.block_until_ready()
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        out = f(*args)
    out.block_until_ready()
    t_run = (time.perf_counter() - t0) / 5
    err = float(np.abs(np.asarray(out) - ref).max() / (np.abs(ref).max() + 1e-30))
    log(f"{name}: compile={t_compile:.1f}s run={t_run*1e3:.2f}ms relerr={err:.2e}")
    return out


# (a) plain cumsum
def seg_plain(data):
    cum0 = jnp.concatenate([jnp.zeros(data.shape[:-1] + (1,), data.dtype), jnp.cumsum(data, -1)], -1)
    return cum0[..., enj] - cum0[..., stj]


# (b) two-level tiled cumsum
def cumsum_tiled(data, L=512):
    kk, mm = data.shape
    T = (mm + L - 1) // L
    pad = T * L - mm
    d = jnp.pad(data, ((0, 0), (0, pad))).reshape(kk, T, L)
    local = jnp.cumsum(d, -1)
    tot = local[..., -1]
    off = jnp.cumsum(tot, -1) - tot
    full = (local + off[..., None]).reshape(kk, T * L)
    return full[:, :mm]


def seg_tiled(data):
    cum = cumsum_tiled(data)
    cum0 = jnp.concatenate([jnp.zeros(data.shape[:-1] + (1,), data.dtype), cum], -1)
    return cum0[..., enj] - cum0[..., stj]


# (c) padded-group gather+sum: bucket segments by size class
deg = ends - starts
cap = int(deg.max())
log(f"max segment size = {cap}, mean = {deg.mean():.1f}")
# single cap for this test (uniform-ish segments)
idx2d = np.full((n_seg, cap), m, np.int64)
for g in range(n_seg):
    idx2d[g, : deg[g]] = np.arange(starts[g], ends[g])
idx2d_j = jnp.asarray(idx2d, jnp.int32)


def seg_grouped(data):
    dp = jnp.concatenate([data, jnp.zeros((k, 1), data.dtype)], -1)
    g = dp[:, idx2d_j.reshape(-1)].reshape(k, n_seg, cap)
    return jnp.sum(g, -1)


bench("plain-cumsum-f64", seg_plain, data)
bench("tiled-cumsum-f64", seg_tiled, data)
bench("grouped-gather-f64", seg_grouped, data)
log("DONE")
