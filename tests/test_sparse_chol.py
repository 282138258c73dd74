"""Block-sparse Cholesky kernel tests vs dense NumPy oracles (the tier-1
strategy of SURVEY.md §4: reference verifies its block kernels against dense
Eigen; we verify against numpy.linalg)."""

import numpy as np
import pytest

import jax.numpy as jnp

from slampp_tpu.core import sparse_chol, symbolic
from slampp_tpu.core.ordering import (
    block_adjacency,
    inverse_ordering,
    min_degree_ordering,
    rcm_ordering,
)


def _random_block_spd(n, bs, extra_pairs, seed):
    """Random SPD block matrix on a chain + extra off-diagonal pairs."""
    rng = np.random.default_rng(seed)
    pairs = {(i + 1, i) for i in range(n - 1)}
    for _ in range(extra_pairs):
        i, j = rng.integers(0, n, 2)
        if i != j:
            pairs.add((max(i, j), min(i, j)))
    pairs = sorted(pairs)
    N = n * bs
    A = np.zeros((N, N))
    for i, j in pairs:
        B = rng.normal(0, 1, (bs, bs))
        A[i * bs : (i + 1) * bs, j * bs : (j + 1) * bs] = B
        A[j * bs : (j + 1) * bs, i * bs : (i + 1) * bs] = B.T
    # make SPD with diagonal dominance
    A += np.eye(N) * (np.abs(A).sum(axis=1).max() + 1.0)
    return A, pairs


def _pack(A, plan, n, bs):
    vals = np.zeros((plan.nnzb, bs, bs))
    for (i, j), s in plan.slot_of.items():
        vals[s] = A[i * bs : (i + 1) * bs, j * bs : (j + 1) * bs]
    return vals


@pytest.mark.parametrize("bs", [3, 6])
@pytest.mark.parametrize("seed", [0, 1])
def test_factor_solve_matches_dense(bs, seed):
    n = 30
    A, pairs = _random_block_spd(n, bs, extra_pairs=25, seed=seed)
    plan = symbolic.symbolic_cholesky(n, pairs)
    dp = sparse_chol.device_plan(plan)
    vals = jnp.asarray(_pack(A, plan, n, bs))
    L = sparse_chol.factorize(dp, vals)

    # check L L^T == A on the nonzero pattern by full reconstruction
    Lfull = np.zeros_like(A)
    Lnp = np.array(L)
    for (i, j), s in plan.slot_of.items():
        Lfull[i * bs : (i + 1) * bs, j * bs : (j + 1) * bs] = Lnp[s]
    np.testing.assert_allclose(Lfull @ Lfull.T, A, atol=1e-8)

    rng = np.random.default_rng(seed + 100)
    b = rng.normal(0, 1, (n, bs))
    x = sparse_chol.solve(dp, L, jnp.asarray(b))
    x_ref = np.linalg.solve(A, b.reshape(-1)).reshape(n, bs)
    np.testing.assert_allclose(np.array(x), x_ref, atol=1e-8)


def test_factor_with_mindeg_ordering():
    n, bs = 40, 3
    A, pairs = _random_block_spd(n, bs, extra_pairs=30, seed=2)
    adj = block_adjacency(n, pairs)
    order = min_degree_ordering(adj)
    inv = inverse_ordering(order)
    ppairs = [(int(inv[i]), int(inv[j])) for i, j in pairs]
    plan = symbolic.symbolic_cholesky(n, ppairs)
    dp = sparse_chol.device_plan(plan)
    # permuted matrix
    P = np.zeros((n * bs, n * bs))
    for newb in range(n):
        oldb = order[newb]
        P[newb * bs : (newb + 1) * bs, oldb * bs : (oldb + 1) * bs] = np.eye(bs)
    Ap = P @ A @ P.T
    vals = jnp.asarray(_pack(Ap, plan, n, bs))
    L = sparse_chol.factorize(dp, vals)
    b = np.random.default_rng(3).normal(0, 1, (n, bs))
    x = sparse_chol.solve(dp, L, jnp.asarray(b))
    x_ref = np.linalg.solve(Ap, b.reshape(-1)).reshape(n, bs)
    np.testing.assert_allclose(np.array(x), x_ref, atol=1e-8)


def test_native_gn_matches_dense_gn_on_manhattan():
    import os
    import tempfile

    from slampp_tpu.io.datasets import make_manhattan
    from slampp_tpu.io.parser import build_system, parse_file
    from slampp_tpu.linear.native import NativeBlockSolver
    from slampp_tpu.solvers.gauss_newton import _gn_step

    text, _ = make_manhattan(
        n_poses=120, loop_prob=0.5, loop_separation=10, loop_radius=4.0, seed=5
    )
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        system = build_system(parse_file(path))
    finally:
        os.unlink(path)

    graph = system.snapshot()
    ref_states, ref_norm, ref_chi2 = _gn_step(graph)

    solver = NativeBlockSolver(system)
    states, norm, chi2 = solver.gn_step(graph)

    assert abs(float(chi2) - float(ref_chi2)) < 1e-9 * max(1.0, float(ref_chi2))
    assert abs(float(norm) - float(ref_norm)) < 1e-8 * max(1.0, float(ref_norm))
    for t in ref_states:
        np.testing.assert_allclose(np.array(states[t]), np.array(ref_states[t]), atol=1e-9)
