"""Batch Gauss-Newton on the Hessian (the reference's lambda solver,
``CNonlinearSolver_Lambda``, NonlinearSolver_Lambda.h:44).

Iteration semantics replicate ``Optimize`` (NonlinearSolver_Lambda.h:476-668):
per iteration, refresh lambda/eta at the current linearization point, solve,
stop WITHOUT applying if ||dx|| <= min_dx_norm, otherwise retract the states.
The per-iteration work (assembly + solve + retraction) is one jitted device
program; the iteration loop stays on host so iteration counts match the
reference semantics exactly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from slampp_tpu.core import assembly
from slampp_tpu.graph.system import GraphArrays, GraphSystem
from slampp_tpu.linear.dense import solve_dense
from slampp_tpu.utils.timer import PhaseTimer


@jax.jit
def _gn_step(graph: GraphArrays, plan=None, update_threshold=0.0):
    """One GN iteration: returns (new_states, dx_norm, chi2_at_entry).

    With a SchurPlan, the solve eliminates landmarks first (the -us path).
    ``update_threshold`` > 0 gates per-vertex updates (FastL-style
    threshold-gated back-substitution, SURVEY.md §3.2)."""
    H, g, chi2 = assembly.assemble_dense(graph)
    if plan is not None:
        from slampp_tpu.linear.schur import schur_solve

        dx = schur_solve(H, g, plan)
    else:
        dx = solve_dense(H, g)
    dx_norm = jnp.linalg.norm(dx)
    new_states = assembly.apply_update_gated(graph, dx, update_threshold)
    return new_states, dx_norm, chi2


@jax.jit
def _chi2(graph: GraphArrays):
    return assembly.graph_chi2(graph)


class GaussNewtonSolver:
    """The lambda solver: batch (and every-N incremental) Gauss-Newton."""

    name = "lambda"

    def __init__(
        self,
        system: GraphSystem,
        use_schur: bool = False,
        verbose: bool = False,
        pad: bool = False,
        linear_solver: str = "auto",
    ):
        """``linear_solver``: "native" (block-sparse Cholesky, the default for
        uniform-block pose graphs — reference CLinearSolver_UberBlock),
        "dense", "schur" (equivalent to use_schur=True), or "auto"."""
        self.system = system
        if use_schur:
            linear_solver = "schur"
        self.linear_solver = linear_solver
        self.use_schur = linear_solver == "schur"
        self.verbose = verbose
        self.pad = pad
        self.timer = PhaseTimer()
        self.n_iterations = 0
        self._schur_plan = None
        self._native = None
        self._sparse_schur = None

    def _resolve_solver(self) -> str:
        import os

        from slampp_tpu.graph.types import get_vertex_type

        if self.linear_solver == "schur":
            # landmark graphs above a size threshold eliminate landmarks
            # observation-wise and solve the reduced system sparsely —
            # no dense H at any point (reference -us at any scale,
            # LinearSolver_Schur.h:1623; see linear/schur_sparse.py)
            thresh = int(os.environ.get("SLAMPP_SPARSE_SCHUR_THRESHOLD", "1500"))
            has_lm = any(
                get_vertex_type(t).is_landmark
                for t, _ in self.system.vertex_index.values()
            )
            if has_lm and self.system.n_vertices >= thresh:
                return "schur_sparse"
        if self.linear_solver != "auto":
            return self.linear_solver

        dims = {
            get_vertex_type(t).dim
            for t, _ in self.system.vertex_index.values()
        }
        return "native" if len(dims) == 1 else "dense"

    def _plan(self):
        if not self.use_schur:
            return None
        if self._schur_plan is None:
            from slampp_tpu.linear.schur import build_schur_plan

            with self.timer.phase("schur_symbolic"):
                self._schur_plan = build_schur_plan(self.system)
        return self._schur_plan

    def _snapshot(self) -> GraphArrays:
        with self.timer.phase("snapshot"):
            return self.system.snapshot(pad=self.pad)

    def optimize(self, max_iterations: int = 5, min_dx_norm: float = 0.01) -> int:
        """Run up to ``max_iterations`` GN steps; returns iterations applied."""
        if self.system.n_edges == 0:
            return 0
        kind = self._resolve_solver()
        if kind == "native":
            from slampp_tpu.linear.native import NativeBlockSolver

            if self._native is None:
                self._native = NativeBlockSolver(self.system)
            with self.timer.phase("symbolic"):
                self._native.ensure_symbolic()
        elif kind == "schur_sparse":
            from slampp_tpu.linear.schur_sparse import SparseSchurSolver

            if self._sparse_schur is None:
                self._sparse_schur = SparseSchurSolver(self.system)
            with self.timer.phase("symbolic"):
                self._sparse_schur.ensure_symbolic()
        graph = self._snapshot()
        if self.pad and kind in ("native", "schur_sparse"):
            # the native/sparse-Schur engines build exact-size routing tables
            # from the system; a padded snapshot (capacity-bucketed edge
            # arrays) would not line up with them
            graph = self.system.snapshot(pad=False)
        plan = self._plan() if kind == "schur" else None
        applied = 0
        for _ in range(max_iterations):
            with self.timer.phase("gn_step"):
                if kind == "native":
                    new_states, dx_norm, chi2 = self._native.gn_step(graph)
                elif kind == "schur_sparse":
                    new_states, dx_norm, chi2 = self._sparse_schur.gn_step(graph)
                else:
                    new_states, dx_norm, chi2 = _gn_step(graph, plan)
                dx_norm = float(dx_norm)
            self.n_iterations += 1
            if self.verbose:
                print(f"iter {applied}: chi2={float(chi2):.4f} |dx|={dx_norm:.6f}")
            if not jnp.isfinite(dx_norm):
                # reference aborts iterating when the factorization fails
                # (Cholesky failure -> "not pos def, aborting",
                # NonlinearSolver_Lambda.h:658-660)
                import sys

                print(
                    "warning: system is not positive definite / numerical "
                    "failure in the linear solve, aborting iterations",
                    file=sys.stderr,
                )
                break
            if dx_norm <= min_dx_norm:
                break
            graph = graph.replace_states(new_states)
            applied += 1
        with self.timer.phase("writeback"):
            self.system.update_states({t: s for t, s in graph.states.items()})
        return applied

    def chi2(self) -> float:
        """Denormalized chi-squared at the current linearization point."""
        return float(_chi2(self._snapshot()))

    def dump(self) -> None:
        self.timer.dump()
