"""Block-Takahashi sparse marginals vs the dense inverse oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slampp_tpu.core import sparse_chol2
from slampp_tpu.marginals.sparse_marginals import sparse_marginals, takahashi_plan
from tests.test_sparse_chol import _random_block_spd
from tests.test_sparse_chol2 import _pack_v2


@pytest.mark.parametrize("bs", [3, 6])
@pytest.mark.parametrize("seed", [0, 1])
def test_takahashi_matches_dense_inverse(bs, seed):
    n = 25
    A, pairs = _random_block_spd(n, bs, extra_pairs=20, seed=seed)
    plan = sparse_chol2.plan_v2(n, pairs)
    order = plan.col_order
    Pm = np.zeros((n * bs, n * bs))
    for newb in range(n):
        oldb = order[newb]
        Pm[newb * bs : (newb + 1) * bs, oldb * bs : (oldb + 1) * bs] = np.eye(bs)
    Ap = Pm @ A @ Pm.T
    D, O = _pack_v2(Ap, plan, n, bs)
    Ld, Lo = sparse_chol2.factorize2(plan, D, O)

    tk = takahashi_plan(plan)
    Sd, So = sparse_marginals(plan, tk, Ld, Lo)

    Sigma_ref = np.linalg.inv(Ap)
    Sdn, Son = np.array(Sd), np.array(So)
    # every diagonal block
    for j in range(n):
        np.testing.assert_allclose(
            Sdn[j], Sigma_ref[j * bs : (j + 1) * bs, j * bs : (j + 1) * bs],
            atol=1e-8, err_msg=f"diag {j}",
        )
    # every off-diagonal pattern block
    rows = plan.rows[plan.n :]
    cols = plan.cols[plan.n :]
    for k in range(plan.n_off):
        i, j = int(rows[k]), int(cols[k])
        np.testing.assert_allclose(
            Son[k], Sigma_ref[i * bs : (i + 1) * bs, j * bs : (j + 1) * bs],
            atol=1e-8, err_msg=f"off ({i},{j})",
        )


def test_sparse_marginals_on_manhattan_graph():
    """End-to-end: block-diagonal covariances of an optimized pose graph via
    the sparse recursion == dense marginals (the reference's correctness
    check of Recurrent vs Ref)."""
    import os
    import tempfile

    from slampp_tpu.core import assembly, block_assembly
    from slampp_tpu.io.datasets import make_manhattan
    from slampp_tpu.io.parser import build_system, parse_file
    from slampp_tpu.linear.native import NativeBlockSolver
    from slampp_tpu.marginals import dense_marginals

    text, _ = make_manhattan(
        n_poses=80, loop_prob=0.5, loop_separation=10, loop_radius=4.0, seed=11
    )
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        system = build_system(parse_file(path))
    finally:
        os.unlink(path)
    from slampp_tpu.solvers import GaussNewtonSolver

    GaussNewtonSolver(system).optimize(10, 1e-9)
    graph = system.snapshot()

    ns = NativeBlockSolver(system, panel=1, engine="v2")
    ns.symbolic()
    vals, rhs, _ = jax.jit(
        lambda g: block_assembly.assemble_blocks(g, ns.block_plan)
    )(graph)
    p2 = ns.plan2
    Ld, Lo = sparse_chol2.factorize2(p2, vals[: p2.n], vals[p2.n : p2.n + p2.n_off])
    tk = takahashi_plan(p2)
    Sd, So = sparse_marginals(p2, tk, Ld, Lo)

    H, _, _ = jax.jit(assembly.assemble_dense)(graph)
    Sigma_ref = np.array(dense_marginals(H))

    # map permuted block j back to the global scalar offset via dx_offsets
    offs = np.array(ns.block_plan.dx_offsets)  # (n, P)
    Sdn = np.array(Sd)
    for j in range(p2.n):
        o = offs[j]
        if o[0] >= ns.block_plan.state_dim:
            continue
        ref = Sigma_ref[np.ix_(o, o)]
        np.testing.assert_allclose(Sdn[j], ref, atol=1e-7, err_msg=f"block {j}")
