"""slampp_tpu — a TPU-native sparse nonlinear least-squares / SLAM / SfM framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of SLAM++
(ru-wang/slam-plus-plus): g2o/TORO dataset ingestion, batch + incremental
Gauss-Newton / Levenberg-Marquardt / Dogleg over SE(2)/SE(3)/Sim(3) pose graphs
and bundle adjustment, block-sparse Hessian assembly via precomputed reduction
plans, Schur-complement elimination of landmarks, sparse block Cholesky, and
marginal-covariance recovery — scaled over device meshes with jax.sharding.

Design (see SURVEY.md §7): the reference gets speed from dynamic pointer-rich
block structures specialized at C++ compile time; a TPU program needs static
shapes — so all *symbolic* work (parsing, orderings, elimination schedules,
gather/scatter reduction plans) happens on host in NumPy/C++, and all *numeric*
work (residuals, Jacobians, lambda assembly, Cholesky/Schur, solves, marginals)
runs on device as fixed-shape jitted programs.

Precision: the reference is float64 throughout (Eigen doubles); we enable
jax x64 at import so the chi-squared contract (BASELINE.md) can be met.
Set SLAMPP_NO_X64=1 to opt out (e.g. pure-f32 benchmarking).
"""

import os as _os
import sys as _sys

if not _os.environ.get("SLAMPP_NO_X64"):
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)

# SLAMPP_PLATFORM=cpu forces the CPU backend even when a TPU plugin registers
# itself programmatically (the axon sitecustomize overrides JAX_PLATFORMS, so
# an env var alone cannot; this config update can).
if _os.environ.get("SLAMPP_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["SLAMPP_PLATFORM"])

# Tracing a Pallas kernel nested inside a full jitted solver step exceeds
# CPython's default 1000-frame recursion limit (jit -> solver -> pallas_call
# trace stack); headroom here, like most large JAX programs.
if _sys.getrecursionlimit() < 10000:
    _sys.setrecursionlimit(10000)

__version__ = "0.1.0"
