"""Multi-device tests on the virtual 8-CPU mesh (SURVEY.md §4: the missing
tier the reference never had — distributed solves on faked devices)."""

import numpy as np
import pytest

import jax

from slampp_tpu.io.datasets import make_manhattan
from slampp_tpu.io.parser import build_system, parse_file
from slampp_tpu.parallel import distributed_gn_step, make_mesh, shard_graph_edges
from slampp_tpu.solvers.gauss_newton import _gn_step


def _system(n_poses=100, seed=1):
    import os, tempfile

    text, _ = make_manhattan(
        n_poses=n_poses, loop_prob=0.5, loop_separation=10, loop_radius=4.0, seed=seed
    )
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        return build_system(parse_file(path))
    finally:
        os.unlink(path)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_distributed_gn_matches_single_device():
    system = _system()
    graph = system.snapshot()
    # single-device reference step
    ref_states, ref_norm, ref_chi2 = _gn_step(graph)

    mesh = make_mesh(len(jax.devices()))
    sharded = shard_graph_edges(graph, mesh)
    states, norm, chi2 = distributed_gn_step(sharded, mesh)

    assert abs(float(chi2) - float(ref_chi2)) < 1e-6 * max(1.0, float(ref_chi2))
    assert abs(float(norm) - float(ref_norm)) < 1e-8 * max(1.0, float(ref_norm))
    for t in ref_states:
        np.testing.assert_allclose(
            np.array(states[t]), np.array(ref_states[t]), atol=1e-9
        )


def test_graft_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(len(jax.devices()))


def test_mesh_chunk_elimination_matches_sequential():
    """Mesh-parallel frozen-chunk elimination == the sequential NumPy
    elimination the windowed/FastL solvers cache (SURVEY §2.12 stage-8
    sharded-incremental story)."""
    import numpy as np

    from slampp_tpu.parallel.distributed import make_mesh
    from slampp_tpu.parallel.distributed_incremental import (
        eliminate_chunks_mesh,
        pack_chunks,
    )

    rng = np.random.default_rng(7)
    chunks = []
    refs = []
    for k in range(11):  # deliberately not a multiple of the mesh size
        nint = int(rng.integers(6, 19)) * 3
        nb = int(rng.integers(2, 5)) * 3
        d = nint + nb
        A = rng.normal(size=(d, d))
        H = A @ A.T + d * np.eye(d)
        g = rng.normal(size=d)
        chunks.append((H, g, nint))
        Hi = H[:nint, :nint]
        U = H[:nint, nint:]
        L = np.linalg.cholesky(Hi + 1e-12 * np.eye(nint))
        WU = np.linalg.solve(L, U)
        y = np.linalg.solve(L, g[:nint])
        refs.append((H[nint:, nint:] - WU.T @ WU, g[nint:] - WU.T @ y, nint, nb))

    mesh = make_mesh(len(jax.devices()), axis="chunks")
    Hs, gs, nis, D = pack_chunks(chunks)
    L, WU, y, sc, rhs = eliminate_chunks_mesh(Hs, gs, nis, mesh)
    for k, (sc_ref, rhs_ref, nint, nb) in enumerate(refs):
        np.testing.assert_allclose(
            sc[k, nint : nint + nb, nint : nint + nb], sc_ref,
            rtol=1e-8, atol=1e-8,
        )
        np.testing.assert_allclose(
            rhs[k, nint : nint + nb], rhs_ref, rtol=1e-8, atol=1e-8
        )
