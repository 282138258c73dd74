"""Pallas TPU kernels for batched dense SPD factorization and triangular
solves — the compute core of the partitioned (v3) linear solver.

Why Pallas: XLA's ``lax.linalg.cholesky`` lowers to loop-heavy code that runs
hundreds of ms for (K, 192, 192) batches on TPU, and fully-unrolled XLA-level
kernels (ops/small_blocks.py) blow up compile time at M >= 100.  These kernels
keep each matrix resident in VMEM, run a ``fori_loop`` over PB-column panels
(one compiled body regardless of M), factor the PB x PB diagonal with
unrolled straight-line math, and push the trailing update through the MXU as
one masked full-height matmul per panel.

Capability parity: the dense factorization/backsubstitution roles of the
reference's Cholesky_Dense (include/slam/BlockMatrix.h:3617) and the dense
Schur-complement solvers CLinearSolver_DenseEigen / CLinearSolver_DenseGPU
(include/slam/LinearSolver_Schur.h:1046,1219) — re-designed as TPU kernels.

All kernels operate on float32 (the mixed-precision fast path; callers wrap
with f64 iterative refinement).  On non-TPU backends (the virtual CPU test
mesh) a numerically identical lax reference path is used instead.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PB = 8  # panel width (columns factored per loop step)

_F32 = jnp.float32


import os as _os


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _use_pallas() -> bool:
    """Pallas kernels on TPU for f32 (default); SLAMPP_PALLAS=0 selects the
    XLA panel-loop reference path instead (A/B and debugging)."""
    return _on_tpu() and _os.environ.get("SLAMPP_PALLAS", "1") != "0"


# ---------------------------------------------------------------------------
# small unrolled value-level helpers (PB x PB, used inside kernel bodies)
# ---------------------------------------------------------------------------


def _chol_value(A, clamp: float):
    """Unrolled lower Cholesky of a (PB, PB) array value with FROZEN failed
    pivots: a pivot that falls below ``clamp`` is replaced by a huge value,
    so its column's multipliers go to ~0 and the corresponding variable's
    update is ~0 (instead of being amplified by 1/sqrt(clamp), which cascades
    to inf/NaN on near-singular f32 systems).  The f64 refinement loop around
    the caller absorbs the frozen component."""
    n = A.shape[-1]
    BIG = jnp.asarray(1e20, A.dtype)  # dtype-pinned (a python float would
    # promote the pivot to f64 under x64 — unlowerable inside a TPU kernel)
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        d = A[j, j]
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        d = jnp.where(d > clamp, d, BIG)
        Ljj = jnp.sqrt(d)
        L[j][j] = Ljj
        inv = 1.0 / Ljj
        for i in range(j + 1, n):
            v = A[i, j]
            for k in range(j):
                v = v - L[i][k] * L[j][k]
            L[i][j] = v * inv
    zero = jnp.zeros_like(A[0, 0])
    rows = [jnp.stack([L[i][j] if j <= i else zero for j in range(n)]) for i in range(n)]
    return jnp.stack(rows)


def _trsm_right_T_value(C, L):
    """X = C @ L^-T for (M, PB) C and (PB, PB) lower L, unrolled columns."""
    n = L.shape[-1]
    X = [None] * n
    for j in range(n):
        v = C[:, j]
        for k in range(j):
            v = v - X[k] * L[j, k]
        X[j] = v / L[j, j]
    return jnp.stack(X, axis=-1)


def _fwd_sub_value(L, B):
    """X = L^-1 B for (PB, PB) lower L, (PB, S) B, unrolled rows."""
    n = L.shape[-1]
    X = [None] * n
    for i in range(n):
        v = B[i, :]
        for k in range(i):
            v = v - L[i, k] * X[k]
        X[i] = v / L[i, i]
    return jnp.stack(X)


def _bwd_sub_value(L, B):
    """X = L^-T B for (PB, PB) lower L, (PB, S) B, unrolled rows."""
    n = L.shape[-1]
    X = [None] * n
    for i in reversed(range(n)):
        v = B[i, :]
        for k in range(i + 1, n):
            v = v - L[k, i] * X[k]
        X[i] = v / L[i, i]
    return jnp.stack(X)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


# Mosaic restricts dynamic slicing on the tiled (sublane, lane) dims: lane
# starts must be provably 128-aligned, which an 8-wide column panel at j*8 is
# not.  So the kernels never slice dynamically — the active column panel is
# EXTRACTED and WRITTEN BACK through one-hot selection matrices (built from
# iota compares, which tolerate dynamic bounds) driven through the MXU.
# Extra FLOPs: ~4 extra M x M x 8 products per panel, same order as the
# trailing update itself — all MXU traffic while the matrix stays in VMEM.


def _sel(j0, M: int):
    """(M, PB) one-hot selection: column k picks row j0 + k."""
    r = lax.broadcasted_iota(jnp.int32, (M, PB), 0)
    c = lax.broadcasted_iota(jnp.int32, (M, PB), 1)
    return (r == j0 + c).astype(_F32)


def _chol_kernel(a_ref, o_ref, *, M: int, clamp: float):
    nb = M // PB
    rows = lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    cols = lax.broadcasted_iota(jnp.int32, (1, M), 1)

    def panel(j, A):
        j0 = j * PB
        E = _sel(j0, M)
        C = jnp.dot(A, E, preferred_element_type=_F32, precision=lax.Precision.HIGHEST)  # (M, PB) column panel
        D = jnp.dot(E.T, C, preferred_element_type=_F32, precision=lax.Precision.HIGHEST)  # (PB, PB) diag block
        Ljj = _chol_value(D, clamp)
        W = _trsm_right_T_value(C, Ljj)
        W = jnp.where(rows >= j0 + PB, W, 0.0)
        # new panel content: W below diag, Ljj on the diag rows, 0 above
        P = W + jnp.dot(E, Ljj, preferred_element_type=_F32, precision=lax.Precision.HIGHEST)
        colmask = ((cols >= j0) & (cols < j0 + PB)).astype(_F32)
        return (
            A * (1.0 - colmask)
            + jnp.dot(P, E.T, preferred_element_type=_F32, precision=lax.Precision.HIGHEST)
            - jnp.dot(W, W.T, preferred_element_type=_F32, precision=lax.Precision.HIGHEST)
        )

    A = lax.fori_loop(jnp.int32(0), jnp.int32(nb), panel, a_ref[0])
    # explicit i32 tril mask (jnp.tril builds i64 iotas under x64, which
    # Mosaic cannot lower)
    o_ref[0] = jnp.where(rows >= cols, A, 0.0)


def _trsm_fwd_kernel(l_ref, b_ref, o_ref, *, M: int):
    nb = M // PB
    rows = lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    L = l_ref[0]

    def panel(j, X):
        j0 = j * PB
        E = _sel(j0, M)
        Lcol = jnp.dot(L, E, preferred_element_type=_F32, precision=lax.Precision.HIGHEST)  # (M, PB)
        Dj = jnp.dot(E.T, Lcol, preferred_element_type=_F32, precision=lax.Precision.HIGHEST)  # (PB, PB)
        Bj = jnp.dot(E.T, X, preferred_element_type=_F32, precision=lax.Precision.HIGHEST)  # (PB, S)
        Xj = _fwd_sub_value(Dj, Bj)
        Lm = jnp.where(rows >= j0 + PB, Lcol, 0.0)
        return (
            X
            + jnp.dot(E, Xj - Bj, preferred_element_type=_F32, precision=lax.Precision.HIGHEST)
            - jnp.dot(Lm, Xj, preferred_element_type=_F32, precision=lax.Precision.HIGHEST)
        )

    o_ref[0] = lax.fori_loop(jnp.int32(0), jnp.int32(nb), panel, b_ref[0])


def _trsm_bwd_kernel(l_ref, b_ref, o_ref, *, M: int):
    nb = M // PB
    rows = lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    L = l_ref[0]

    def panel(jr, X):
        j = nb - 1 - jr
        j0 = j * PB
        E = _sel(j0, M)
        Lcol = jnp.dot(L, E, preferred_element_type=_F32, precision=lax.Precision.HIGHEST)
        Dj = jnp.dot(E.T, Lcol, preferred_element_type=_F32, precision=lax.Precision.HIGHEST)
        Lm = jnp.where(rows >= j0 + PB, Lcol, 0.0)
        contrib = jnp.dot(Lm.T, X, preferred_element_type=_F32, precision=lax.Precision.HIGHEST)  # (PB, S)
        Bj = jnp.dot(E.T, X, preferred_element_type=_F32, precision=lax.Precision.HIGHEST) - contrib
        Xj = _bwd_sub_value(Dj, Bj)
        return X + jnp.dot(
            E, Xj - jnp.dot(E.T, X, preferred_element_type=_F32, precision=lax.Precision.HIGHEST),
            preferred_element_type=_F32, precision=lax.Precision.HIGHEST,
        )

    o_ref[0] = lax.fori_loop(jnp.int32(0), jnp.int32(nb), panel, b_ref[0])


def _batched_call(kernel, K: int, M: int, S: int | None, *args):
    """Grid over the batch dimension; each program owns one (M, M) matrix
    (and one (M, S) panel when S is not None)."""
    shapes = [(1, M, M)] if S is None else [(1, M, M), (1, M, S)]
    out_shape = shapes[-1]
    # index-map constants must be i32 (python 0 becomes a weak i64 under
    # x64, which Mosaic cannot return from the index-map region); k*0 keeps
    # the zeros i32 without capturing tracers
    return pl.pallas_call(
        kernel,
        grid=(K,),
        in_specs=[
            pl.BlockSpec(s, lambda k: (k, k * 0, k * 0), memory_space=pltpu.VMEM)
            for s in shapes
        ],
        out_specs=pl.BlockSpec(out_shape, lambda k: (k, k * 0, k * 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K,) + out_shape[1:], _F32),
    )(*args)


# ---------------------------------------------------------------------------
# public API (TPU pallas path + lax reference path for CPU test meshes)
# ---------------------------------------------------------------------------


def chol_batched(A: jnp.ndarray, clamp: float = 1e-8) -> jnp.ndarray:
    """Batched lower Cholesky of (K, M, M) SPD matrices (pivot-clamped).
    M must be a multiple of PB (pad with identity).  f32 on TPU takes the
    Pallas kernel; f64 (and any CPU run) takes the numerically identical
    lax panel loop (TPU f64 is XLA-emulated — the exact path used by the
    ``mixed_precision=False`` solvers)."""
    K, M, _ = A.shape
    if _use_pallas() and A.dtype == jnp.float32:
        return _batched_call(
            functools.partial(_chol_kernel, M=M, clamp=clamp), K, M, None, A
        )
    return _chol_reference(A, clamp)


def trsm_lower_batched(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Batched X = L^-1 B; L (K, M, M) lower from chol_batched, B (K, M, S)."""
    K, M, _ = L.shape
    S = B.shape[-1]
    if _use_pallas() and L.dtype == jnp.float32:
        return _batched_call(functools.partial(_trsm_fwd_kernel, M=M), K, M, S, L, B)
    return jax.vmap(lambda l, b: lax.linalg.triangular_solve(
        l, b, left_side=True, lower=True, transpose_a=False
    ))(L, B)


def trsm_lower_t_batched(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Batched X = L^-T B; same layout as trsm_lower_batched."""
    K, M, _ = L.shape
    S = B.shape[-1]
    if _use_pallas() and L.dtype == jnp.float32:
        return _batched_call(functools.partial(_trsm_bwd_kernel, M=M), K, M, S, L, B)
    return jax.vmap(lambda l, b: lax.linalg.triangular_solve(
        l, b, left_side=True, lower=True, transpose_a=True
    ))(L, B)


def _chol_reference(A: jnp.ndarray, clamp: float) -> jnp.ndarray:
    """lax reference path (CPU test meshes): panel loop identical in
    structure to the kernel, so clamping semantics match."""
    K, M, _ = A.shape
    nb = M // PB
    rows = lax.broadcasted_iota(jnp.int32, (M, 1), 0)

    def panel(j, O):
        j0 = j * PB
        D = lax.dynamic_slice(O, (0, j0, j0), (K, PB, PB))
        Ljj = jax.vmap(lambda d: _chol_value(d, clamp))(D)
        C = lax.dynamic_slice(O, (0, 0, j0), (K, M, PB))
        W = jax.vmap(_trsm_right_T_value)(C, Ljj)
        W = jnp.where(rows >= j0 + PB, W, 0.0)
        O = lax.dynamic_update_slice(O, W, (0, 0, j0))
        O = lax.dynamic_update_slice(O, Ljj, (0, j0, j0))
        O = O - jnp.einsum("kis,kjs->kij", W, W)
        return O

    O = lax.fori_loop(0, nb, panel, A)
    return jnp.tril(O)
