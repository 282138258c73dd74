"""Reproduce + localize the Venice full-scale compile OOM (VERDICT r3 #1).

Builds the full-scale Venice plan, lowers ba_schur_lm_step for TPU, and
compiles with an HLO dump so the offending broadcast (f32[8,m,3,3] tiled to
18 GB) can be traced back to source via HLO metadata.

Usage: python scripts/diag_venice_oom.py [dump_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

dump = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hlo_venice"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + f" --xla_dump_to={dump}"
)

import jax  # noqa: E402
import slampp_tpu  # noqa: F401, E402

from slampp_tpu.io.datasets import make_venice_ba_arrays  # noqa: E402
from slampp_tpu.linear.ba_schur import (  # noqa: E402
    ba_schur_lm_step,
    build_ba_schur_plan_arrays,
)

n_cams = int(os.environ.get("V_CAMS", "871"))
n_points = int(os.environ.get("V_POINTS", "110000"))
track = int(os.environ.get("V_TRACK", "10"))

t0 = time.perf_counter()
cams, lms, oc, ol, uv, info, _ = make_venice_ba_arrays(
    n_cams=n_cams, n_points=n_points, mean_track=track, seed=0
)
print(f"gen: {time.perf_counter()-t0:.1f}s  m={len(oc)}", flush=True)

t0 = time.perf_counter()
plan = build_ba_schur_plan_arrays(n_cams, len(lms), oc, ol, uv, info)
print(f"plan: {time.perf_counter()-t0:.1f}s", flush=True)

import jax.numpy as jnp  # noqa: E402

step = jax.jit(ba_schur_lm_step, static_argnames=("sc_f64", "pair_f32"))
t0 = time.perf_counter()
lowered = step.lower(
    plan, jnp.asarray(cams), jnp.asarray(lms), 1e-3, sc_f64=False,
    pair_f32=True,
)
print(f"lower: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
try:
    lowered.compile()
    print(f"compile OK: {time.perf_counter()-t0:.1f}s", flush=True)
except Exception as e:
    print(f"compile FAILED after {time.perf_counter()-t0:.1f}s:", flush=True)
    print(str(e)[:2000])
