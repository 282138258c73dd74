"""v2 (scatter-free) factorization engine tests vs dense oracles and the v1
engine."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slampp_tpu.core import sparse_chol2
from tests.test_sparse_chol import _random_block_spd


def _pack_v2(A, plan, n, bs):
    D = np.zeros((plan.n, bs, bs))
    O = np.zeros((plan.n_off, bs, bs))
    for (i, j), s in plan.slot_of.items():
        blk = A[i * bs : (i + 1) * bs, j * bs : (j + 1) * bs]
        if i == j:
            D[s] = blk
        else:
            O[s - plan.n] = blk
    return jnp.asarray(D), jnp.asarray(O)


@pytest.mark.parametrize("bs", [3, 6])
@pytest.mark.parametrize("seed", [0, 1])
def test_v2_factor_solve_matches_dense(bs, seed):
    n = 30
    A, pairs = _random_block_spd(n, bs, extra_pairs=25, seed=seed)
    plan = sparse_chol2.plan_v2(n, pairs)
    # apply the level-contiguous renumbering to the matrix
    order = plan.col_order  # new -> old
    P = np.zeros((n * bs, n * bs))
    for newb in range(n):
        oldb = order[newb]
        P[newb * bs : (newb + 1) * bs, oldb * bs : (oldb + 1) * bs] = np.eye(bs)
    Ap = P @ A @ P.T
    D, O = _pack_v2(Ap, plan, n, bs)
    Ld, Lo = sparse_chol2.factorize2(plan, D, O)
    # reconstruct L and check L L^T == Ap
    Lfull = np.zeros_like(Ap)
    Ldn, Lon = np.array(Ld), np.array(Lo)
    for (i, j), s in plan.slot_of.items():
        blk = Ldn[s] if i == j else Lon[s - plan.n]
        Lfull[i * bs : (i + 1) * bs, j * bs : (j + 1) * bs] = blk
    Lfull = np.tril(Lfull)
    np.testing.assert_allclose(Lfull @ Lfull.T, Ap, atol=1e-8)

    rng = np.random.default_rng(seed + 7)
    b = rng.normal(0, 1, (n, bs))
    x = sparse_chol2.solve2(plan, Ld, Lo, jnp.asarray(b))
    x_ref = np.linalg.solve(Ap, b.reshape(-1)).reshape(n, bs)
    np.testing.assert_allclose(np.array(x), x_ref, atol=1e-8)

    # spmv + refined solve
    y = sparse_chol2.spmv2(plan, D, O, jnp.asarray(b))
    np.testing.assert_allclose(
        np.array(y), (Ap @ b.reshape(-1)).reshape(n, bs), atol=1e-8
    )
    xr = sparse_chol2.solve_refined2(plan, D, O, jnp.asarray(b), refine_iters=3)
    np.testing.assert_allclose(np.array(xr), x_ref, atol=1e-7)


def test_v2_native_gn_matches_v1_on_manhattan():
    import os
    import tempfile

    from slampp_tpu.io.datasets import make_manhattan
    from slampp_tpu.io.parser import build_system, parse_file
    from slampp_tpu.linear.native import NativeBlockSolver

    text, _ = make_manhattan(
        n_poses=150, loop_prob=0.5, loop_separation=10, loop_radius=4.0, seed=9
    )
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        system = build_system(parse_file(path))
    finally:
        os.unlink(path)
    graph = system.snapshot()

    v1 = NativeBlockSolver(system, panel=4, engine="v1")
    s1, n1, c1 = v1.gn_step(graph)
    for panel in (1, 4):
        v2 = NativeBlockSolver(system, panel=panel, engine="v2")
        s2, n2, c2 = v2.gn_step(graph)
        assert abs(float(c1) - float(c2)) < 1e-9 * max(1.0, float(c1))
        assert abs(float(n1) - float(n2)) < 1e-7 * max(1.0, float(n1))
        for t in s1:
            np.testing.assert_allclose(np.array(s2[t]), np.array(s1[t]), atol=1e-8)

    # mixed precision v2 converges to the same optimum
    g = graph
    vmp = NativeBlockSolver(system, panel=4, engine="v2", mixed_precision=True, refine_iters=1)
    for _ in range(8):
        st, nn, cc = vmp.gn_step(g)
        if float(nn) < 1e-8:
            break
        g = g.replace_states(st)
    gref = graph
    for _ in range(8):
        st, nn, cc = v1.gn_step(gref)
        if float(nn) < 1e-8:
            break
        gref = gref.replace_states(st)
    from slampp_tpu.core.assembly import graph_chi2

    chi_mp = float(jax.jit(graph_chi2)(g))
    chi_ref = float(jax.jit(graph_chi2)(gref))
    assert abs(chi_mp - chi_ref) < 1e-6 * max(1.0, chi_ref)


def test_sorted_assembly_matches_scatter():
    """assemble_blocks_sorted == assemble_blocks (the reduction-plan oracle)
    across panel sizes and engines."""
    import tempfile, os
    import jax, jax.numpy as jnp
    from slampp_tpu.io.datasets import make_manhattan
    from slampp_tpu.io.parser import parse_file, build_system
    from slampp_tpu.linear.native import NativeBlockSolver
    from slampp_tpu.core import block_assembly

    for panel, engine in [(1, "v2"), (4, "v2"), (8, "v1")]:
        text, _ = make_manhattan(n_poses=90, loop_prob=0.2, seed=3)
        with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
            f.write(text)
            path = f.name
        system = build_system(parse_file(path))
        os.unlink(path)
        ns = NativeBlockSolver(system, panel=panel, engine=engine)
        ns.symbolic()
        g = system.snapshot()
        bp = ns.block_plan
        v1, r1, c1 = jax.jit(lambda g: block_assembly.assemble_blocks(g, bp))(g)
        v2, r2, c2 = jax.jit(
            lambda g: block_assembly.assemble_blocks_sorted(g, bp)
        )(g)
        assert float(jnp.abs(v1 - v2).max()) < 1e-8
        assert float(jnp.abs(r1 - r2).max()) < 1e-8
        assert float(jnp.abs(c1 - c2)) < 1e-8
