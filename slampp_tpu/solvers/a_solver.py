"""Gauss-Newton on the Jacobian (A) matrix.

Capability parity with ``CNonlinearSolver_A`` (include/slam/
NonlinearSolver_A.h:314): builds the weighted Jacobian A = R J (R = upper
Cholesky of Sigma^-1 per edge) and the weighted residual explicitly each
iteration, solves the normal equations, and EXPORTS A (the reference's
``r_A()`` / solver_ExportsJacobian trait) for research uses (SPCG,
eigen-analysis of A^T A, FLOP studies).

Numerically identical to the lambda solver (A^T A = lambda, A^T b = eta);
the value of this solver is the exported Jacobian.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from slampp_tpu.core import assembly
from slampp_tpu.graph.system import GraphArrays, GraphSystem
from slampp_tpu.graph.types import get_edge_type, get_vertex_type
from slampp_tpu.linear.dense import solve_dense
from slampp_tpu.utils.timer import PhaseTimer


def build_jacobian(graph: GraphArrays):
    """Dense weighted Jacobian A (m, N) and weighted residual b (m,) at the
    current linearization point; rows ordered by edge type then edge index.
    """
    N = graph.state_dim
    blocks_A = []
    blocks_b = []
    for name, ea in graph.edges.items():
        et = get_edge_type(name)
        vts = tuple(get_vertex_type(t) for t in et.vertex_types)
        slot_states = tuple(
            graph.states[et.vertex_types[s]][ea.local_idx[:, s]] for s in range(et.arity)
        )
        r, jacs = jax.vmap(
            lambda *a: assembly._edge_residual_and_jacobians(et, vts, a[:-1], a[-1])
        )(*slot_states, ea.meas)
        # R = chol(Sigma^-1)^T upper (BaseTypes_Binary.h:191)
        Rw = jnp.linalg.cholesky(
            jnp.where(ea.valid[:, None, None], ea.sigma_inv, jnp.eye(et.res_dim))
        ).swapaxes(1, 2)
        Rw = jnp.where(ea.valid[:, None, None], Rw, 0.0)
        E = ea.meas.shape[0]
        A_t = jnp.zeros((E, et.res_dim, N + assembly._dmax(graph)))
        for a in range(et.arity):
            RJ = jnp.einsum("eij,ejk->eik", Rw, jacs[a])
            colidx = ea.offsets[:, a, None] + jnp.arange(vts[a].dim)[None, :]
            A_t = A_t.at[
                jnp.arange(E)[:, None, None],
                jnp.arange(et.res_dim)[None, :, None],
                colidx[:, None, :],
            ].add(RJ[:, :, :])
        blocks_A.append(A_t[:, :, :N].reshape(E * et.res_dim, N))
        blocks_b.append(jnp.einsum("eij,ej->ei", Rw, r).reshape(E * et.res_dim))
    return jnp.concatenate(blocks_A, 0), jnp.concatenate(blocks_b, 0)


class ASolver:
    """The -A CLI solver: GN via the explicit Jacobian."""

    name = "A"

    def __init__(self, system: GraphSystem, verbose: bool = False):
        self.system = system
        self.verbose = verbose
        self.timer = PhaseTimer()
        self._A = None
        self._b = None

    def r_A(self):
        """Exported weighted Jacobian from the last iteration (r_A())."""
        return self._A

    def optimize(self, max_iterations: int = 5, min_dx_norm: float = 0.01) -> int:
        if self.system.n_edges == 0:
            return 0
        graph = self.system.snapshot()
        applied = 0
        for _ in range(max_iterations):
            with self.timer.phase("jacobian"):
                A, b = build_jacobian(graph)
                self._A, self._b = A, b
            with self.timer.phase("solve"):
                H = A.T @ A
                g = A.T @ b  # gradient of 0.5||r + J d||^2 at d=0; dx = -H^-1 g
                if graph.unary_dim > 0:
                    idx = graph.unary_offset + jnp.arange(graph.unary_dim)
                    H = H.at[idx, idx].add(graph.unary_information)
                dx = solve_dense(H, g)
                dx_norm = float(jnp.linalg.norm(dx))
            if dx_norm <= min_dx_norm or not np.isfinite(dx_norm):
                break
            graph = graph.replace_states(assembly.apply_update(graph, dx))
            applied += 1
        self.system.update_states({t: s for t, s in graph.states.items()})
        return applied

    def chi2(self) -> float:
        return float(jax.jit(assembly.graph_chi2)(self.system.snapshot()))

    def dump(self) -> None:
        self.timer.dump()
