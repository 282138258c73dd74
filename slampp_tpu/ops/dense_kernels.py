"""Pallas TPU kernels for batched dense SPD factorization and triangular
solves — the compute core of the partitioned (v3) linear solver.

Why Pallas: XLA's ``lax.linalg.cholesky`` lowers to loop-heavy code that runs
hundreds of ms for (K, 192, 192) batches on TPU, and fully-unrolled XLA-level
kernels (ops/small_blocks.py) blow up compile time at M >= 100.

Kernel shape: the grid walks GROUPS of G matrices; each grid step holds a
(G, M, M) block resident in VMEM and factors all G matrices simultaneously
with one fori_loop over PB-wide column panels whose heavy ops are BATCHED
MXU contractions.  Grouping matters because the TPU grid is sequential — at
G=1 the critical path is K * M/PB tiny matmuls (launch-latency bound); at
G=16 it is (K/16) * M/PB batched ones.

Mosaic restricts dynamic slicing on the tiled (sublane, lane) dims — lane
starts must be provably 128-aligned, which an 8-wide column panel at j*8 is
not — so the kernels never slice dynamically: the active column panel is
extracted and written back through one-hot SELECTION MATRICES (iota compares
tolerate dynamic bounds) driven through the MXU.  The extra FLOPs are the
same order as the trailing update itself.

Capability parity: the dense factorization/backsubstitution roles of the
reference's Cholesky_Dense (include/slam/BlockMatrix.h:3617) and the dense
Schur-complement solvers CLinearSolver_DenseEigen / CLinearSolver_DenseGPU
(include/slam/LinearSolver_Schur.h:1046,1219) — re-designed as TPU kernels.

All kernels operate on float32 (the mixed-precision fast path; callers wrap
with f64 iterative refinement).  f64 inputs (and any CPU run) take a
numerically matching lax panel-loop reference path.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PB = 8  # panel width (columns factored per loop step)
# scoped-VMEM budget for one grid step; the kernels hold ~5 live (G, M, M)
# temporaries (carry, column panels, trailing update), so G is sized for
# 5x this figure against the raised vmem_limit_bytes below
_VMEM_GROUP_BYTES = 24 << 20
_VMEM_LIMIT = 100 << 20

_F32 = jnp.float32
HI = lax.Precision.HIGHEST


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _use_pallas() -> bool:
    """Pallas kernels on TPU for f32 (default); SLAMPP_PALLAS=0 selects the
    XLA panel-loop reference path instead (A/B and debugging)."""
    return _on_tpu() and _os.environ.get("SLAMPP_PALLAS", "1") != "0"


# ---------------------------------------------------------------------------
# small unrolled value-level helpers, batched over leading dims
# ---------------------------------------------------------------------------


def _chol_value(A, clamp: float):
    """Unrolled lower Cholesky of (..., PB, PB) blocks with FROZEN failed
    pivots: a pivot below ``clamp`` is replaced by a huge value, so its
    column's multipliers go to ~0 and that variable's update is ~0 (instead
    of being amplified by 1/sqrt(clamp), which cascades to inf/NaN on
    near-singular f32 systems).  The caller's f64 refinement absorbs the
    frozen component.

    Mosaic-friendly construction: scalars stay (..., 1, 1) static slices and
    the result accumulates through constant one-hot masks (jnp.stack /
    concatenate of scalars does not lower inside TPU kernels).
    """
    n = A.shape[-1]
    BIG = jnp.asarray(1e20, A.dtype)  # dtype-pinned (a python float would
    # promote the pivot to f64 under x64 — unlowerable inside a TPU kernel)
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        d = A[..., j : j + 1, j : j + 1]
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        d = jnp.where(d > clamp, d, BIG)
        Ljj = jnp.sqrt(d)
        L[j][j] = Ljj
        inv = 1.0 / Ljj
        for i in range(j + 1, n):
            v = A[..., i : i + 1, j : j + 1]
            for k in range(j):
                v = v - L[i][k] * L[j][k]
            L[i][j] = v * inv
    # assemble rows in two single-axis broadcast stages: a (G,1,1) scalar
    # times a lane one-hot gives the row (lane broadcast only), and the row
    # times a sublane one-hot places it (sublane broadcast only).  Mosaic
    # cannot broadcast over sublanes AND lanes in one op, and XLA folds
    # multi-stage broadcast_to chains back into one.
    lane = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    sub = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    out = jnp.zeros_like(A)
    for i in range(n):
        row = None
        for j in range(i + 1):
            t = L[i][j] * (lane == j).astype(A.dtype)  # (G, 1, n)
            row = t if row is None else row + t
        out = out + row * (sub == i).astype(A.dtype)  # (G, n, n)
    return out


def _trsm_right_T_value(C, L):
    """X = C @ L^-T for (..., M, PB) C and (..., PB, PB) lower L."""
    n = L.shape[-1]
    X = [None] * n
    for j in range(n):
        v = C[..., :, j : j + 1]  # (..., M, 1)
        for k in range(j):
            v = v - X[k] * L[..., j : j + 1, k : k + 1]
        X[j] = v / L[..., j : j + 1, j : j + 1]
    ci = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    out = jnp.zeros_like(C)
    for j in range(n):
        out = out + X[j] * (ci == j).astype(C.dtype)
    return out


def _fwd_sub_value(L, B):
    """X = L^-1 B for (..., PB, PB) lower L, (..., PB, S) B."""
    n = L.shape[-1]
    X = [None] * n
    for i in range(n):
        v = B[..., i : i + 1, :]  # (..., 1, S)
        for k in range(i):
            v = v - L[..., i : i + 1, k : k + 1] * X[k]
        X[i] = v / L[..., i : i + 1, i : i + 1]
    ri = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    out = jnp.zeros_like(B)
    for i in range(n):
        out = out + X[i] * (ri == i).astype(B.dtype)
    return out


def _bwd_sub_value(L, B):
    """X = L^-T B for (..., PB, PB) lower L, (..., PB, S) B."""
    n = L.shape[-1]
    X = [None] * n
    for i in reversed(range(n)):
        v = B[..., i : i + 1, :]
        for k in range(i + 1, n):
            v = v - L[..., k : k + 1, i : i + 1] * X[k]
        X[i] = v / L[..., i : i + 1, i : i + 1]
    ri = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    out = jnp.zeros_like(B)
    for i in range(n):
        out = out + X[i] * (ri == i).astype(B.dtype)
    return out


# ---------------------------------------------------------------------------
# kernels (each grid step owns G matrices)
# ---------------------------------------------------------------------------


def _sel(j0, M: int):
    """(M, PB) one-hot selection: column k picks row j0 + k."""
    r = lax.broadcasted_iota(jnp.int32, (M, PB), 0)
    c = lax.broadcasted_iota(jnp.int32, (M, PB), 1)
    return (r == j0 + c).astype(_F32)


def _bmm(x, y):
    """Canonical batched matmul (g, a, b) @ (g, b, c) — the only contraction
    shape Mosaic's layout inference accepts on all operands."""
    return jax.lax.dot_general(
        x, y, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=_F32, precision=HI,
    )


def _chol_kernel(a_ref, o_ref, *, M: int, clamp: float):
    nb = M // PB
    rows = lax.broadcasted_iota(jnp.int32, (1, M, 1), 1)
    cols = lax.broadcasted_iota(jnp.int32, (1, 1, M), 2)

    def panel(j, A):  # A: (G, M, M)
        j0 = j * PB
        G = A.shape[0]
        E = _sel(j0, M)
        Eb = jnp.broadcast_to(E, (G, M, PB))
        Ebt = jnp.swapaxes(Eb, 1, 2)  # (G, PB, M)
        C = _bmm(A, Eb)  # (G, M, PB) column panels
        D = _bmm(Ebt, C)  # (G, PB, PB) diag blocks
        Ljj = _chol_value(D, clamp)
        W = _trsm_right_T_value(C, Ljj)
        W = jnp.where(rows >= j0 + PB, W, 0.0)
        # new panel content: W below diag, Ljj on the diag rows, 0 above
        P = W + _bmm(Eb, Ljj)
        colmask = ((cols >= j0) & (cols < j0 + PB)).astype(_F32)
        return (
            A * (1.0 - colmask)
            + _bmm(P, Ebt)
            - _bmm(W, jnp.swapaxes(W, 1, 2))
        )

    A = lax.fori_loop(jnp.int32(0), jnp.int32(nb), panel, a_ref[:])
    # explicit i32 tril mask (jnp.tril builds i64 iotas under x64, which
    # Mosaic cannot lower)
    o_ref[:] = jnp.where(rows >= cols, A, 0.0)


def _trsm_fwd_kernel(l_ref, b_ref, o_ref, *, M: int):
    nb = M // PB
    rows = lax.broadcasted_iota(jnp.int32, (1, M, 1), 1)
    L = l_ref[:]

    def panel(j, X):  # X: (G, M, S)
        j0 = j * PB
        G = X.shape[0]
        E = _sel(j0, M)
        Eb = jnp.broadcast_to(E, (G, M, PB))
        Ebt = jnp.swapaxes(Eb, 1, 2)
        Lcol = _bmm(L, Eb)
        Dj = _bmm(Ebt, Lcol)
        Bj = _bmm(Ebt, X)
        Xj = _fwd_sub_value(Dj, Bj)
        Lm = jnp.where(rows >= j0 + PB, Lcol, 0.0)
        return X + _bmm(Eb, Xj - Bj) - _bmm(Lm, Xj)

    o_ref[:] = lax.fori_loop(jnp.int32(0), jnp.int32(nb), panel, b_ref[:])


def _trsm_bwd_kernel(l_ref, b_ref, o_ref, *, M: int):
    nb = M // PB
    rows = lax.broadcasted_iota(jnp.int32, (1, M, 1), 1)
    L = l_ref[:]

    def panel(jr, X):
        j = nb - 1 - jr
        j0 = j * PB
        G = X.shape[0]
        E = _sel(j0, M)
        Eb = jnp.broadcast_to(E, (G, M, PB))
        Ebt = jnp.swapaxes(Eb, 1, 2)
        Lcol = _bmm(L, Eb)
        Dj = _bmm(Ebt, Lcol)
        Lm = jnp.where(rows >= j0 + PB, Lcol, 0.0)
        Bj = _bmm(Ebt, X) - _bmm(jnp.swapaxes(Lm, 1, 2), X)
        Xj = _bwd_sub_value(Dj, Bj)
        return X + _bmm(Eb, Xj - _bmm(Ebt, X))

    o_ref[:] = lax.fori_loop(jnp.int32(0), jnp.int32(nb), panel, b_ref[:])


def _pick_group(K: int, M: int, S: int | None) -> int:
    per = 5 * M * (M if S is None else max(M, S)) * 4
    g = max(1, _VMEM_GROUP_BYTES // per)
    return int(min(K, g))


def _batched_call(kernel, K: int, M: int, S: int | None, pad_eye: bool, *args):
    """Grid over GROUPS of G matrices; K is padded up to a multiple of G
    (identity matrices when ``pad_eye`` so the factorization stays finite)."""
    G = _pick_group(K, M, S)
    Kp = ((K + G - 1) // G) * G
    if Kp != K:
        padded = []
        a = args[0]
        pad = jnp.broadcast_to(jnp.eye(M, dtype=a.dtype), (Kp - K, M, M))
        padded.append(jnp.concatenate([a, pad], 0))
        for b in args[1:]:
            padded.append(
                jnp.concatenate(
                    [b, jnp.zeros((Kp - K,) + b.shape[1:], b.dtype)], 0
                )
            )
        args = tuple(padded)
    shapes = [(G, M, M)] if S is None else [(G, M, M), (G, M, S)]
    out_shape = shapes[-1]
    # index-map constants must be i32 (python 0 becomes a weak i64 under
    # x64, which Mosaic cannot return from the index-map region); k*0 keeps
    # the zeros i32 without capturing tracers
    out = pl.pallas_call(
        kernel,
        grid=(Kp // G,),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        in_specs=[
            pl.BlockSpec(s, lambda k: (k, k * 0, k * 0), memory_space=pltpu.VMEM)
            for s in shapes
        ],
        out_specs=pl.BlockSpec(out_shape, lambda k: (k, k * 0, k * 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Kp,) + out_shape[1:], _F32),
    )(*args)
    return out[:K]


# ---------------------------------------------------------------------------
# public API (TPU pallas path + lax reference path for CPU test meshes)
# ---------------------------------------------------------------------------


def chol_batched(A: jnp.ndarray, clamp: float = 1e-8) -> jnp.ndarray:
    """Batched lower Cholesky of (K, M, M) SPD matrices (pivot-frozen).
    M must be a multiple of PB (pad with identity).  f32 on TPU takes the
    Pallas kernel; f64 (and any CPU run) takes the numerically identical
    lax panel loop (TPU f64 is XLA-emulated — the exact path used by the
    ``mixed_precision=False`` solvers)."""
    K, M, _ = A.shape
    if _use_pallas() and A.dtype == jnp.float32:
        return _batched_call(
            functools.partial(_chol_kernel, M=M, clamp=clamp), K, M, None, True, A
        )
    return _chol_reference(A, clamp)


def trsm_lower_batched(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Batched X = L^-1 B; L (K, M, M) lower from chol_batched, B (K, M, S)."""
    K, M, _ = L.shape
    S = B.shape[-1]
    if _use_pallas() and L.dtype == jnp.float32:
        return _batched_call(
            functools.partial(_trsm_fwd_kernel, M=M), K, M, S, True, L, B
        )
    return jax.vmap(lambda l, b: lax.linalg.triangular_solve(
        l, b, left_side=True, lower=True, transpose_a=False
    ))(L, B)


def trsm_lower_t_batched(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Batched X = L^-T B; same layout as trsm_lower_batched."""
    K, M, _ = L.shape
    S = B.shape[-1]
    if _use_pallas() and L.dtype == jnp.float32:
        return _batched_call(
            functools.partial(_trsm_bwd_kernel, M=M), K, M, S, True, L, B
        )
    return jax.vmap(lambda l, b: lax.linalg.triangular_solve(
        l, b, left_side=True, lower=True, transpose_a=True
    ))(L, B)


def _chol_reference(A: jnp.ndarray, clamp: float) -> jnp.ndarray:
    """lax reference path (CPU test meshes + f64): panel loop identical in
    structure to the kernel, so pivot-freezing semantics match."""
    K, M, _ = A.shape
    nb = M // PB
    rows = lax.broadcasted_iota(jnp.int32, (M, 1), 0)

    def panel(j, O):
        j0 = j * PB
        D = lax.dynamic_slice(O, (0, j0, j0), (K, PB, PB))
        Ljj = _chol_value(D, clamp)
        C = lax.dynamic_slice(O, (0, 0, j0), (K, M, PB))
        W = _trsm_right_T_value(C, Ljj)
        W = jnp.where(rows >= j0 + PB, W, 0.0)
        O = lax.dynamic_update_slice(O, W, (0, 0, j0))
        O = lax.dynamic_update_slice(O, Ljj, (0, j0, j0))
        O = O - jnp.einsum("kis,kjs->kij", W, W)
        return O

    O = lax.fori_loop(0, nb, panel, A)
    return jnp.tril(O)
