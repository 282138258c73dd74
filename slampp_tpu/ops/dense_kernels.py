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


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


# ---------------------------------------------------------------------------
# small unrolled value-level helpers (PB x PB, used inside kernel bodies)
# ---------------------------------------------------------------------------


def _chol_value(A, clamp: float):
    """Unrolled lower Cholesky of a (PB, PB) array value, pivot-clamped."""
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        d = A[j, j]
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        d = jnp.maximum(d, clamp)
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


def _chol_kernel(a_ref, o_ref, *, M: int, clamp: float):
    o_ref[:] = a_ref[:]
    nb = M // PB
    rows = lax.broadcasted_iota(jnp.int32, (M, 1), 0)

    def panel(j, _):
        j0 = j * PB
        D = o_ref[0, pl.ds(j0, PB), pl.ds(j0, PB)]
        Ljj = _chol_value(D, clamp)
        C = o_ref[0, :, pl.ds(j0, PB)]
        W = _trsm_right_T_value(C, Ljj)
        below = rows >= j0 + PB
        W = jnp.where(below, W, 0.0)
        o_ref[0, :, pl.ds(j0, PB)] = W
        o_ref[0, pl.ds(j0, PB), pl.ds(j0, PB)] = Ljj
        o_ref[0] = o_ref[0] - jnp.dot(W, W.T, preferred_element_type=_F32)
        return 0

    lax.fori_loop(0, nb, panel, 0)
    o_ref[0] = jnp.tril(o_ref[0])


def _trsm_fwd_kernel(l_ref, b_ref, o_ref, *, M: int):
    o_ref[:] = b_ref[:]
    nb = M // PB
    rows = lax.broadcasted_iota(jnp.int32, (M, 1), 0)

    def panel(j, _):
        j0 = j * PB
        Ljj = l_ref[0, pl.ds(j0, PB), pl.ds(j0, PB)]
        Bj = o_ref[0, pl.ds(j0, PB), :]
        Xj = _fwd_sub_value(Ljj, Bj)
        o_ref[0, pl.ds(j0, PB), :] = Xj
        Lcol = l_ref[0, :, pl.ds(j0, PB)]
        Lm = jnp.where(rows >= j0 + PB, Lcol, 0.0)
        o_ref[0] = o_ref[0] - jnp.dot(Lm, Xj, preferred_element_type=_F32)
        return 0

    lax.fori_loop(0, nb, panel, 0)


def _trsm_bwd_kernel(l_ref, b_ref, o_ref, *, M: int):
    o_ref[:] = b_ref[:]
    nb = M // PB
    rows = lax.broadcasted_iota(jnp.int32, (M, 1), 0)

    def panel(jr, _):
        j = nb - 1 - jr
        j0 = j * PB
        Lcol = l_ref[0, :, pl.ds(j0, PB)]
        Lm = jnp.where(rows >= j0 + PB, Lcol, 0.0)
        contrib = jnp.dot(Lm.T, o_ref[0], preferred_element_type=_F32)
        Ljj = l_ref[0, pl.ds(j0, PB), pl.ds(j0, PB)]
        Bj = o_ref[0, pl.ds(j0, PB), :] - contrib
        o_ref[0, pl.ds(j0, PB), :] = _bwd_sub_value(Ljj, Bj)
        return 0

    lax.fori_loop(0, nb, panel, 0)


def _batched_call(kernel, K: int, M: int, S: int | None, *args):
    """Grid over the batch dimension; each program owns one (M, M) matrix
    (and one (M, S) panel when S is not None)."""
    shapes = [(1, M, M)] if S is None else [(1, M, M), (1, M, S)]
    out_shape = shapes[-1]
    return pl.pallas_call(
        kernel,
        grid=(K,),
        in_specs=[
            pl.BlockSpec(s, lambda k: (k, 0, 0), memory_space=pltpu.VMEM)
            for s in shapes
        ],
        out_specs=pl.BlockSpec(out_shape, lambda k: (k, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K,) + out_shape[1:], _F32),
    )(*args)


# ---------------------------------------------------------------------------
# public API (TPU pallas path + lax reference path for CPU test meshes)
# ---------------------------------------------------------------------------


def chol_batched(A: jnp.ndarray, clamp: float = 1e-8) -> jnp.ndarray:
    """Batched lower Cholesky of (K, M, M) f32 SPD matrices (pivot-clamped).
    M must be a multiple of PB (pad with identity)."""
    K, M, _ = A.shape
    if _on_tpu():
        return _batched_call(
            functools.partial(_chol_kernel, M=M, clamp=clamp), K, M, None, A
        )
    return _chol_reference(A, clamp)


def trsm_lower_batched(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Batched X = L^-1 B; L (K, M, M) lower from chol_batched, B (K, M, S)."""
    K, M, _ = L.shape
    S = B.shape[-1]
    if _on_tpu():
        return _batched_call(functools.partial(_trsm_fwd_kernel, M=M), K, M, S, L, B)
    return jax.vmap(lambda l, b: lax.linalg.triangular_solve(
        l, b, left_side=True, lower=True, transpose_a=False
    ))(L, B)


def trsm_lower_t_batched(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Batched X = L^-T B; same layout as trsm_lower_batched."""
    K, M, _ = L.shape
    S = B.shape[-1]
    if _on_tpu():
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
