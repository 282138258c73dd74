"""Sparse system-matrix assembly for dumps (`-dsm`) — no dense Hessian.

Reference: the CLI's ``-dsm`` writes ``system.mtx`` directly from the sparse
lambda block matrix (``src/slam_app/Main.h:1449-1493``).  Round-4 advisor
finding: our dump went through ``assemble_dense`` — O(N^2) memory exactly at
the scales where a dump matters.  This module assembles the Gauss-Newton
Hessian as a scipy CSR via chunked per-edge-type triplet accumulation: the
Jacobian blocks are evaluated with the same batched linearization the
solvers use (core/assembly.py), pulled to host one bounded chunk at a time,
and summed as sparse matrices — peak memory is O(chunk * block^2 + nnz).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from slampp_tpu.core.assembly import _edge_residual_and_jacobians
from slampp_tpu.graph.system import GraphArrays
from slampp_tpu.graph.types import get_edge_type, get_vertex_type


@functools.lru_cache(maxsize=64)
def _hab_fn(et_name: str):
    """jitted (slot_states..., meas, sigma_inv) -> per-edge H blocks + g."""
    et = get_edge_type(et_name)
    vts = tuple(get_vertex_type(t) for t in et.vertex_types)

    def one(states, meas, W):
        r, jacs = _edge_residual_and_jacobians(et, vts, states, meas)
        if et.robust_weight_fn is not None:
            W = W * et.robust_weight_fn(r, W)
        WJ = tuple(W @ j for j in jacs)
        habs = tuple(
            tuple(jacs[a].T @ WJ[b] for b in range(et.arity))
            for a in range(et.arity)
        )
        return habs

    def batched(slot_states, meas, sigma_inv):
        return jax.vmap(lambda *a: one(a[:-2], a[-2], a[-1]))(
            *slot_states, meas, sigma_inv
        )

    return jax.jit(batched)


def assemble_sparse_csr(graph: GraphArrays, chunk: int = 65536):
    """The GN Hessian H (N x N, scipy CSR, f64) without a dense intermediate.

    Padding/const contributions (offsets pointing at the dummy row >= N)
    are dropped.  The unary gauge factor is included, matching
    ``assemble_dense`` semantics.
    """
    import scipy.sparse as sp

    N = graph.state_dim
    acc = sp.csr_matrix((N, N))
    for name, ea in graph.edges.items():
        et = get_edge_type(name)
        vts = tuple(get_vertex_type(t) for t in et.vertex_types)
        fn = _hab_fn(name)
        E = ea.meas.shape[0]
        for lo in range(0, E, chunk):
            hi = min(E, lo + chunk)
            slot_states = tuple(
                graph.states[et.vertex_types[s]][ea.local_idx[lo:hi, s]]
                for s in range(et.arity)
            )
            habs = fn(slot_states, ea.meas[lo:hi], ea.sigma_inv[lo:hi])
            valid = np.asarray(ea.valid[lo:hi])
            offs = np.asarray(ea.offsets[lo:hi])  # (e, arity)
            rows_l = []
            cols_l = []
            vals_l = []
            for a in range(et.arity):
                da = vts[a].dim
                ra = offs[:, a, None] + np.arange(da)[None, :]  # (e, da)
                for b in range(et.arity):
                    db = vts[b].dim
                    cb = offs[:, b, None] + np.arange(db)[None, :]
                    hab = np.asarray(habs[a][b])  # (e, da, db)
                    ok = valid & (offs[:, a] < N) & (offs[:, b] < N)
                    if not ok.any():
                        continue
                    rows_l.append(
                        np.broadcast_to(ra[ok][:, :, None], hab[ok].shape).ravel()
                    )
                    cols_l.append(
                        np.broadcast_to(cb[ok][:, None, :], hab[ok].shape).ravel()
                    )
                    vals_l.append(hab[ok].ravel())
            if vals_l:
                part = sp.coo_matrix(
                    (
                        np.concatenate(vals_l),
                        (np.concatenate(rows_l), np.concatenate(cols_l)),
                    ),
                    shape=(N, N),
                ).tocsr()
                acc = acc + part
    if graph.unary_dim > 0 and graph.unary_offset < N:
        idx = graph.unary_offset + np.arange(graph.unary_dim)
        acc = acc + sp.coo_matrix(
            (np.full(graph.unary_dim, graph.unary_information), (idx, idx)),
            shape=(N, N),
        ).tocsr()
    if graph.diag_reg is not None:
        d = np.arange(N)
        acc = acc + sp.coo_matrix(
            (np.full(N, float(graph.diag_reg)), (d, d)), shape=(N, N)
        ).tocsr()
    return acc
