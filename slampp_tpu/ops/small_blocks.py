"""Unrolled batched kernels for tiny SPD blocks (3x3, 6x6, ...).

XLA's generic ``lax.linalg.cholesky``/``triangular_solve`` lower to
loop-heavy code that is slow for large batches of tiny blocks on TPU; these
unrolled forms are straight-line VPU element-wise math over the batch
dimension (the role of the reference's compile-time fixed-block-size FBS
kernels, include/slam/BlockMatrixFBS.h).
"""

from __future__ import annotations

import jax.numpy as jnp


def cholesky_small(A: jnp.ndarray) -> jnp.ndarray:
    """Batched lower Cholesky of (..., bs, bs) SPD blocks, unrolled over bs."""
    bs = A.shape[-1]
    L = [[None] * bs for _ in range(bs)]
    for j in range(bs):
        d = A[..., j, j]
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        Ljj = jnp.sqrt(d)
        L[j][j] = Ljj
        inv = 1.0 / Ljj
        for i in range(j + 1, bs):
            v = A[..., i, j]
            for k in range(j):
                v = v - L[i][k] * L[j][k]
            L[i][j] = v * inv
    rows = []
    zero = jnp.zeros_like(A[..., 0, 0])
    for i in range(bs):
        rows.append(jnp.stack([L[i][j] if j <= i else zero for j in range(bs)], axis=-1))
    return jnp.stack(rows, axis=-2)


def solve_triangular_right_transpose_small(W: jnp.ndarray, L: jnp.ndarray) -> jnp.ndarray:
    """Batched X = W @ L^-T for lower-triangular L: X L^T = W, unrolled.

    W: (..., m, bs); L: (..., bs, bs) lower. Column j of X:
      X[:, j] = (W[:, j] - sum_{k<j} X[:, k] L[j, k]) / L[j, j]
    """
    bs = L.shape[-1]
    X = [None] * bs
    for j in range(bs):
        v = W[..., :, j]
        for k in range(j):
            v = v - X[k] * L[..., j, k][..., None]
        X[j] = v / L[..., j, j][..., None]
    return jnp.stack(X, axis=-1)


def solve_lower_small(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched y = L^-1 b for lower-triangular L; b: (..., bs)."""
    bs = L.shape[-1]
    y = [None] * bs
    for i in range(bs):
        v = b[..., i]
        for k in range(i):
            v = v - L[..., i, k] * y[k]
        y[i] = v / L[..., i, i]
    return jnp.stack(y, axis=-1)


def solve_lower_transpose_small(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched x = L^-T b; b: (..., bs)."""
    bs = L.shape[-1]
    x = [None] * bs
    for i in reversed(range(bs)):
        v = b[..., i]
        for k in range(i + 1, bs):
            v = v - L[..., k, i] * x[k]
        x[i] = v / L[..., i, i]
    return jnp.stack(x, axis=-1)


def inverse_spd_small(A: jnp.ndarray) -> jnp.ndarray:
    """Batched SPD inverse via unrolled Cholesky (for block-diag inverses,
    reference InverseOf_BlockDiag_FBS_Parallel, BlockMatrix.h:3165)."""
    bs = A.shape[-1]
    L = cholesky_small(A)
    cols = []
    for j in range(bs):
        e = jnp.zeros(A.shape[:-1], A.dtype).at[..., j].set(1.0)
        y = solve_lower_small(L, e)
        cols.append(solve_lower_transpose_small(L, y))
    return jnp.stack(cols, axis=-1)
