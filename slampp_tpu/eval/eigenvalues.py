"""Symmetric eigenvalue analysis of system matrices.

Capability parity with ``CSymEigsSolver`` (include/slam/Eigenvalues.h:179,
364; src/slam/Eigenvalues.cpp) — the Spectra-like implicitly-restarted
solver used for condition-number/observability analysis
(scripts/eigenvalues/): largest-magnitude eigenpairs, and smallest
eigenpairs via the shift-invert mode backed by the framework's own
factorization (the reference uses its block LDLT).

TPU-native: Lanczos with full reorthogonalization as a jitted fixed-iteration
loop over the operator (dense matvec or user-supplied matvec); LOBPCG from
jax.experimental for blocks of extremal eigenpairs where applicable.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def lanczos_extremal(
    matvec: Callable,
    n: int,
    k: int = 6,
    iters: int = 60,
    seed: int = 0,
    dtype=jnp.float64,
):
    """Lanczos with full reorthogonalization; returns (ritz_values,
    ritz_vectors) approximating the extremal spectrum of the symmetric
    operator.  ``iters`` >= k; cost is iters matvecs."""
    iters = max(iters, k + 2)
    key = jax.random.PRNGKey(seed)
    v0 = jax.random.normal(key, (n,), dtype)
    v0 = v0 / jnp.linalg.norm(v0)

    V = jnp.zeros((iters + 1, n), dtype).at[0].set(v0)
    alphas = jnp.zeros(iters, dtype)
    betas = jnp.zeros(iters, dtype)

    def body(carry, j):
        V, alphas, betas = carry
        v = V[j]
        w = matvec(v)
        a = jnp.dot(v, w)
        w = w - a * v - jnp.where(j > 0, betas[j - 1], 0.0) * V[jnp.maximum(j - 1, 0)]
        # full reorthogonalization (stability; problem sizes are moderate)
        w = w - V.T @ (V @ w)
        b = jnp.linalg.norm(w)
        V = V.at[j + 1].set(jnp.where(b > 1e-12, w / b, 0.0))
        alphas = alphas.at[j].set(a)
        betas = betas.at[j].set(b)
        return (V, alphas, betas), None

    (V, alphas, betas), _ = jax.lax.scan(body, (V, alphas, betas), jnp.arange(iters))
    T = jnp.diag(alphas) + jnp.diag(betas[:-1], 1) + jnp.diag(betas[:-1], -1)
    evals, evecs = jnp.linalg.eigh(T)
    ritz = V[:iters].T @ evecs  # (n, iters)
    return evals, ritz


def largest_eigenvalues(H: jnp.ndarray, k: int = 6, iters: int = 60):
    """k largest-magnitude eigenvalues of a symmetric matrix (the reference's
    largest-magnitude mode)."""
    n = H.shape[0]
    evals, ritz = lanczos_extremal(lambda v: H @ v, n, k, iters)
    idx = jnp.argsort(-jnp.abs(evals))[:k]
    return evals[idx], ritz[:, idx]


def smallest_eigenvalues_shift_invert(
    H: jnp.ndarray, k: int = 6, shift: float = 0.0, iters: int = 60
):
    """k smallest eigenvalues via shift-invert Lanczos (reference
    SpSym_Eigenvalues smallest-eig mode, Eigenvalues.h:60): runs Lanczos on
    (H - shift I)^-1 using a cached Cholesky."""
    from jax import lax

    n = H.shape[0]
    Hs = H - shift * jnp.eye(n, dtype=H.dtype)
    L = lax.linalg.cholesky(Hs)

    def inv_mv(v):
        y = lax.linalg.triangular_solve(L, v[:, None], left_side=True, lower=True)
        x = lax.linalg.triangular_solve(
            L, y, left_side=True, lower=True, transpose_a=True
        )
        return x[:, 0]

    evals_inv, ritz = lanczos_extremal(inv_mv, n, k, iters)
    idx = jnp.argsort(-evals_inv)[:k]  # largest of inverse = smallest of H
    lam = shift + 1.0 / evals_inv[idx]
    return lam, ritz[:, idx]


def condition_number(H: jnp.ndarray, iters: int = 80) -> float:
    """Spectral condition estimate (observability analysis use case)."""
    lmax, _ = largest_eigenvalues(H, 1, iters)
    lmin, _ = smallest_eigenvalues_shift_invert(H, 1, 0.0, iters)
    return float(jnp.abs(lmax[0]) / jnp.maximum(jnp.abs(lmin[0]), 1e-300))
