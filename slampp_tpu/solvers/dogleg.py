"""Dogleg trust-region solver (reference: CNonlinearSolver_Lambda_DL,
include/slam/NonlinearSolver_Lambda_DL.h:242 — the 3DV'17 solver with trust
radius delta and fluid relinearization).

Classic Powell dogleg over the Gauss-Newton system: combine the GN step and
the steepest-descent (Cauchy) step within the trust radius; update the radius
by the gain ratio.  The reference's per-vertex fluid-relinearization threshold
(1e-5, NonlinearSolver_Lambda_DL.h:399) is an incremental-mode economy; the
batch semantics implemented here match its batch path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from slampp_tpu.core import assembly
from slampp_tpu.graph.system import GraphArrays, GraphSystem
from slampp_tpu.linear.dense import solve_spd
from slampp_tpu.utils.timer import PhaseTimer


@jax.jit
def _dogleg_step(graph: GraphArrays, delta, relin_threshold=0.0):
    """Returns (new_states, dx, predicted_reduction, dx_norm, chi2_at_entry).

    ``relin_threshold`` > 0 enables fluid relinearization: per-vertex updates
    below the threshold are suppressed (NonlinearSolver_Lambda_DL.h:399)."""
    H, g, chi2 = assembly.assemble_dense(graph)
    dx_gn = solve_spd(H, -g)
    gTg = jnp.dot(g, g)
    gHg = jnp.dot(g, H @ g)
    alpha = gTg / jnp.maximum(gHg, 1e-300)
    dx_sd = -alpha * g  # Cauchy step

    n_gn = jnp.linalg.norm(dx_gn)
    n_sd = jnp.linalg.norm(dx_sd)

    def blend():
        # walk from dx_sd toward dx_gn until hitting the radius
        d = dx_gn - dx_sd
        a = jnp.dot(d, d)
        b = 2.0 * jnp.dot(dx_sd, d)
        c = jnp.dot(dx_sd, dx_sd) - delta * delta
        disc = jnp.sqrt(jnp.maximum(b * b - 4 * a * c, 0.0))
        t = (-b + disc) / jnp.maximum(2 * a, 1e-300)
        return dx_sd + jnp.clip(t, 0.0, 1.0) * d

    dx = jnp.where(
        n_gn <= delta,
        dx_gn,
        jnp.where(n_sd >= delta, dx_sd * (delta / jnp.maximum(n_sd, 1e-300)), blend()),
    )
    # predicted reduction of 0.5*chi2 linear model: -g.dx - 0.5 dx.H.dx
    pred = -(jnp.dot(g, dx) + 0.5 * jnp.dot(dx, H @ dx))
    new_states = assembly.apply_update_gated(graph, dx, relin_threshold)
    return new_states, dx, pred, jnp.linalg.norm(dx), chi2


@jax.jit
def _chi2(graph: GraphArrays):
    return assembly.graph_chi2(graph)


class DoglegSolver:
    name = "lambda_dl"

    def __init__(
        self,
        system: GraphSystem,
        verbose: bool = False,
        pad: bool = False,
        initial_radius: float = 2.0,
        relin_threshold: float = 0.0,  # reference default in DL: 1e-5
        engine: str = "auto",
    ):
        """``engine``: "auto" picks dense or sparse Schur by graph size;
        "dense" (explicit) always assembles the full Hessian; "v3" runs the
        step through the partitioned block-sparse engine (uniform block
        size) without materializing H; "schur_sparse" eliminates landmarks
        observation-wise and doglegs over the Schur slot (reference slots
        CLinearSolver_Schur under every solver, LinearSolver_Schur.h:1424)."""
        self.system = system
        self.verbose = verbose
        self.pad = pad
        self.radius = initial_radius
        self.relin_threshold = relin_threshold
        self.engine = engine
        self._v3 = None
        self._ss = None
        self.timer = PhaseTimer()
        self.n_iterations = 0

    def _resolve_engine(self) -> str:
        """With engine="auto", upgrade to sparse Schur on landmark graphs
        above the size threshold (same gate as GN/LM); an EXPLICIT "dense"
        request is honored verbatim (no silent numerics switch)."""
        import os

        from slampp_tpu.graph.types import get_vertex_type

        if self.engine == "auto":
            thresh = int(os.environ.get("SLAMPP_SPARSE_SCHUR_THRESHOLD", "1500"))
            has_lm = any(
                get_vertex_type(t).is_landmark
                for t, _ in self.system.vertex_index.values()
            )
            if has_lm and self.system.n_vertices >= thresh:
                return "schur_sparse"
        return "dense" if self.engine == "auto" else self.engine

    def _ss_solver(self):
        if self._ss is None:
            from slampp_tpu.linear.schur_sparse import SparseSchurSolver

            with self.timer.phase("schur_sparse_symbolic"):
                self._ss = SparseSchurSolver(self.system)
                self._ss.ensure_symbolic()
        return self._ss

    def _v3_solver(self):
        if self._v3 is None:
            from slampp_tpu.linear.partitioned import PartitionedSolver

            with self.timer.phase("v3_symbolic"):
                self._v3 = PartitionedSolver(self.system, refine_iters=2)
                self._v3.symbolic()
        return self._v3

    def optimize(self, max_iterations: int = 5, min_dx_norm: float = 0.01) -> int:
        if self.system.n_edges == 0:
            return 0
        engine = self._resolve_engine()
        # sparse-Schur routing tables are exact-size (see LM): never feed
        # them a capacity-padded snapshot
        graph = self.system.snapshot(pad=self.pad and engine != "schur_sparse")
        last_error = float(_chi2(graph))
        applied = 0
        for it in range(max_iterations):
            self.n_iterations += 1
            with self.timer.phase("dogleg_step"):
                if engine == "v3":
                    new_states, pred, dx_norm, _ = self._v3_solver().dogleg_step(
                        graph, self.radius, self.relin_threshold
                    )
                elif engine == "schur_sparse":
                    new_states, pred, dx_norm, _ = self._ss_solver().dogleg_step(
                        graph, self.radius, self.relin_threshold
                    )
                else:
                    new_states, dx, pred, dx_norm, _ = _dogleg_step(
                        graph, self.radius, self.relin_threshold
                    )
                dx_norm = float(dx_norm)
            if not jnp.isfinite(dx_norm):
                # reference aborts iterating when the factorization fails
                # ("not pos def, aborting", NonlinearSolver_Lambda.h:658-660)
                import sys as _sys

                print(
                    "warning: system is not positive definite / numerical "
                    "failure in the linear solve, aborting iterations",
                    file=_sys.stderr,
                )
                break
            if dx_norm <= min_dx_norm:
                break
            candidate = graph.replace_states(new_states)
            f_error = float(_chi2(candidate))
            # gain ratio against the quadratic model (x2 since pred models chi2/2)
            rho = (last_error - f_error) / max(2.0 * float(pred), 1e-300)
            if rho > 0:
                graph = candidate
                last_error = f_error
                applied += 1
                if rho > 0.75:
                    self.radius = max(self.radius, 3.0 * dx_norm)
            if rho < 0.25:
                self.radius *= 0.5
                if self.radius < 1e-6:
                    break
            if self.verbose:
                print(
                    f"DL iter {it}: chi2={f_error:.4f} rho={rho:.3f} radius={self.radius:.3e}"
                )
        self.system.update_states({t: s for t, s in graph.states.items()})
        return applied

    def chi2(self) -> float:
        return float(_chi2(self.system.snapshot(pad=self.pad)))

    def dump(self) -> None:
        self.timer.dump()
