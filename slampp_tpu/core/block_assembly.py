"""Block-level lambda assembly: edge contributions -> packed L-slot values.

This is the direct analog of the reference's matrix reduction plan
(``CMatrixReductionPlan``, NonlinearSolver_Lambda_Base.h:524): each edge's
per-slot-pair Hessian block is routed to a precomputed destination slot in the
packed block array (with a transpose flag when the permuted order swaps the
pair), and conflicting contributions are reduced by scatter-add.  The host
builds the routing once per graph structure (:func:`build_block_plan`); the
device function (:func:`assemble_blocks`) is shape-static and jit-friendly.

Uniform block size is required — mixed-size problems (BA, 2D landmarks)
eliminate the landmark types via the Schur solver first, exactly like the
reference's BA pipeline (SURVEY.md §3.3), leaving a uniform reduced system.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from slampp_tpu.core.assembly import _edge_residual_and_jacobians
from slampp_tpu.graph.system import GraphArrays, GraphSystem
from slampp_tpu.graph.types import get_edge_type, get_vertex_type


@dataclasses.dataclass
class EdgeRouting:
    """Per-edge-type device index arrays (host-built)."""

    diag_slots: jnp.ndarray  # (E, arity): slot of each vertex's diag block
    rhs_rows: jnp.ndarray  # (E, arity): permuted block row for the RHS
    pair_slots: jnp.ndarray  # (E, n_pairs): off-diag slot
    pair_transpose: jnp.ndarray  # (E, n_pairs) bool
    pairs: Tuple  # ((a, b), ...) slot-index pairs, a < b


@dataclasses.dataclass
class BlockPlan:
    """Routing for one (graph structure, ordering)."""

    n: int  # block columns (free vertices)
    bs: int  # uniform block size
    nnzb: int
    routing: Dict[str, EdgeRouting]
    anchor_diag_slot: int  # diag slot of the unary-factor anchor (or nnzb)
    unary_information: float
    # (n, bs) scalar offsets: dx[offsets[p]] = x[p] (for un-permuting)
    dx_offsets: jnp.ndarray
    state_dim: int


def build_block_plan(
    system: GraphSystem,
    slot_of: Dict[Tuple[int, int], int],
    diag_slot: np.ndarray,
    nnzb: int,
    inv_order: np.ndarray,
    block_of_vid: Dict[int, int],
) -> BlockPlan:
    """Build edge->slot routing given the symbolic factor's slot table.

    ``block_of_vid`` maps vertex dataset id -> original block index;
    ``inv_order`` maps original block -> permuted position.
    """
    offsets, total = system._layout()
    vt_names = {t for t, _ in system.vertex_index.values()}
    dims = {get_vertex_type(t).dim for t in vt_names}
    if len(dims) != 1:
        raise ValueError(f"uniform block size required, got dims {dims}")
    bs = dims.pop()
    n = len(block_of_vid)

    routing: Dict[str, EdgeRouting] = {}
    for tname in system.edge_type_names:
        et = get_edge_type(tname)
        rec = system._edges[tname]
        E = len(rec["vids"])
        arity = et.arity
        pairs = tuple((a, b) for a in range(arity) for b in range(a + 1, arity))
        dslots = np.full((E, arity), nnzb, np.int64)
        rrows = np.full((E, arity), n, np.int64)
        pslots = np.full((E, len(pairs)), nnzb, np.int64)
        ptrans = np.zeros((E, len(pairs)), bool)
        for e, vids in enumerate(rec["vids"]):
            pblocks = []
            for s, vid in enumerate(vids):
                if vid in block_of_vid:
                    p = int(inv_order[block_of_vid[vid]])
                    pblocks.append(p)
                    dslots[e, s] = diag_slot[p]
                    rrows[e, s] = p
                else:
                    pblocks.append(-1)  # const vertex
            for k, (a, b) in enumerate(pairs):
                pa, pb = pblocks[a], pblocks[b]
                if pa < 0 or pb < 0:
                    continue
                if pa >= pb:
                    pslots[e, k] = slot_of[(pa, pb)]
                    ptrans[e, k] = False  # store J_a^T W J_b at (pa, pb)
                else:
                    pslots[e, k] = slot_of[(pb, pa)]
                    ptrans[e, k] = True  # store (J_a^T W J_b)^T = J_b^T W J_a
        routing[tname] = EdgeRouting(
            diag_slots=jnp.asarray(dslots, jnp.int32),
            rhs_rows=jnp.asarray(rrows, jnp.int32),
            pair_slots=jnp.asarray(pslots, jnp.int32),
            pair_transpose=jnp.asarray(ptrans),
            pairs=pairs,
        )

    anchor = system._unary_anchor
    if anchor is not None and anchor in block_of_vid:
        anchor_slot = int(diag_slot[int(inv_order[block_of_vid[anchor]])])
    else:
        anchor_slot = nnzb

    # permuted block p -> original scalar offset
    order = np.empty_like(inv_order)
    order[inv_order] = np.arange(len(inv_order))
    vid_of_block = {b: v for v, b in block_of_vid.items()}
    dx_off = np.full((n, bs), total, np.int64)
    for p in range(n):
        vid = vid_of_block[int(order[p])]
        o = offsets[vid]
        dx_off[p] = o + np.arange(bs)
    return BlockPlan(
        n=n,
        bs=bs,
        nnzb=nnzb,
        routing=routing,
        anchor_diag_slot=anchor_slot,
        unary_information=system.unary_information,
        dx_offsets=jnp.asarray(dx_off, jnp.int32),
        state_dim=total,
    )


def assemble_blocks(graph: GraphArrays, bp: BlockPlan):
    """Device: (vals (nnzb+1, bs, bs), rhs (n+1, bs), chi2) — the packed
    lower-triangular lambda in the permuted L structure, plus g and chi2.
    The +1 rows are scatter dummies (dropped by the caller via slicing)."""
    bs = bp.bs
    dtype = graph.states[next(iter(graph.states))].dtype
    vals = jnp.zeros((bp.nnzb + 1, bs, bs), dtype)
    rhs = jnp.zeros((bp.n + 1, bs), dtype)
    chi2 = jnp.zeros((), dtype)

    for name, ea in graph.edges.items():
        et = get_edge_type(name)
        rt = bp.routing[name]
        vts = tuple(get_vertex_type(t) for t in et.vertex_types)
        slot_states = tuple(
            graph.states[et.vertex_types[s]][ea.local_idx[:, s]] for s in range(et.arity)
        )
        r, jacs = jax.vmap(lambda *a: _edge_residual_and_jacobians(et, vts, a[:-1], a[-1]))(
            *slot_states, ea.meas
        )
        if et.robust_weight_fn is not None:
            w = jax.vmap(et.robust_weight_fn)(r, ea.sigma_inv)
            W = ea.sigma_inv * w[:, None, None]
        else:
            W = ea.sigma_inv
        chi2 = chi2 + jnp.sum(
            jnp.where(ea.valid, jnp.einsum("ei,eij,ej->e", r, ea.sigma_inv, r), 0.0)
        )
        WJ = tuple(jnp.einsum("eij,ejk->eik", W, jacs[b]) for b in range(et.arity))
        mask3 = ea.valid[:, None, None]
        mask2 = ea.valid[:, None]
        for a in range(et.arity):
            Haa = jnp.einsum("eij,eik->ejk", jacs[a], WJ[a])
            vals = vals.at[rt.diag_slots[:, a]].add(jnp.where(mask3, Haa, 0.0))
            ga = jnp.einsum("eij,ei->ej", WJ[a], r)
            rhs = rhs.at[rt.rhs_rows[:, a]].add(jnp.where(mask2, ga, 0.0))
        for k, (a, b) in enumerate(rt.pairs):
            Hab = jnp.einsum("eij,eik->ejk", jacs[a], WJ[b])
            Hab = jnp.where(
                rt.pair_transpose[:, k][:, None, None], jnp.swapaxes(Hab, 1, 2), Hab
            )
            vals = vals.at[rt.pair_slots[:, k]].add(jnp.where(mask3, Hab, 0.0))

    if bp.anchor_diag_slot < bp.nnzb:
        vals = vals.at[bp.anchor_diag_slot].add(
            bp.unary_information * jnp.eye(bs, dtype=dtype)
        )
    return vals, rhs, chi2


def scatter_dx(bp: BlockPlan, x: jnp.ndarray, dmax: int) -> jnp.ndarray:
    """Un-permute the block solution (n, bs) into the global dx vector."""
    dx = jnp.zeros((bp.state_dim + dmax,), x.dtype)
    dx = dx.at[bp.dx_offsets].set(x)
    return dx[: bp.state_dim]
