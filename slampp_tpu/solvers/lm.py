"""Levenberg-Marquardt on the Hessian (reference: CNonlinearSolver_Lambda_LM,
include/slam/NonlinearSolver_Lambda_LM.h:321, baseline trust-region policy
CLevenbergMarquardt_Baseline :135-243).

Replicates the reference's baseline damping policy exactly:
  * initial alpha = 1e-3 * max over edges of the max vertex-Hessian diagonal
    (f_InitialDamping, NonlinearSolver_Lambda_LM.h:152-199);
  * gain ratio rho = (err0 - err1) / dx.(alpha*dx + eta); accept if rho > 0
    with alpha *= max(1/3, 1-(2 rho-1)^3), nu = 2; else alpha *= nu, nu *= 2,
    roll back (Aftermath, :205-230);
  * damping is additive on the lambda diagonal (ApplyDamping, :235-243).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from slampp_tpu.core import assembly
from slampp_tpu.graph.system import GraphArrays, GraphSystem
from slampp_tpu.graph.types import get_edge_type, get_vertex_type
from slampp_tpu.linear.dense import solve_spd
from slampp_tpu.utils.timer import PhaseTimer


@jax.jit
def _max_edge_hessian_diag(graph: GraphArrays):
    """max over edges of max diag(J_a^T W J_a) — f_Max_VertexHessianDiagValue
    (BaseInterface.h) as used by the LM initial-damping heuristic."""
    best = jnp.zeros(())
    for name, ea in graph.edges.items():
        et = get_edge_type(name)
        vts = tuple(get_vertex_type(t) for t in et.vertex_types)
        slot_states = tuple(
            graph.states[et.vertex_types[s]][ea.local_idx[:, s]] for s in range(et.arity)
        )
        r, jacs = jax.vmap(
            lambda *a: assembly._edge_residual_and_jacobians(et, vts, a[:-1], a[-1])
        )(*slot_states, ea.meas)
        W = ea.sigma_inv
        for a in range(et.arity):
            Haa = jnp.einsum("eij,ejk,ekl->eil", jnp.swapaxes(jacs[a], 1, 2), W, jacs[a])
            d = jnp.max(jnp.diagonal(Haa, axis1=1, axis2=2), axis=1)
            best = jnp.maximum(best, jnp.max(jnp.where(ea.valid, d, 0.0)))
    return best


@jax.jit
def _assemble(graph: GraphArrays):
    return assembly.assemble_dense(graph)


@jax.jit
def _damped_step(graph: GraphArrays, H, g, alpha):
    N = H.shape[0]
    Hd = H + alpha * jnp.eye(N, dtype=H.dtype)
    dx = solve_spd(Hd, -g)
    new_states = assembly.apply_update(graph, dx)
    # rho denominator: dx . (alpha dx + eta), eta = -g in our sign convention
    denom = jnp.dot(dx, alpha * dx - g)
    return new_states, dx, denom, jnp.linalg.norm(dx)


@jax.jit
def _chi2(graph: GraphArrays):
    return assembly.graph_chi2(graph)


class LevenbergMarquardtSolver:
    """The default BA solver (CLI auto-upgrades lambda -> LM for BA,
    Main.cpp:203-207)."""

    name = "lambda_lm"

    def __init__(
        self,
        system: GraphSystem,
        use_schur: bool = False,
        verbose: bool = False,
        pad: bool = False,
        tau: float = 1e-3,
        engine: str = "dense",
    ):
        """``engine``: "dense" (assemble the full Hessian — small problems),
        "v3" (partitioned block-sparse engine, uniform block size — scales to
        arbitrarily long pose graphs without materializing H),
        "schur_sparse" (observation-wise landmark elimination + sparse pose
        solve for general landmark graphs — no dense H; reference slots
        CLinearSolver_Schur under EVERY nonlinear solver,
        LinearSolver_Schur.h:1424), or "big_ba" (observation-driven Schur for
        mono cam/xyz BA — Venice scale; see linear/ba_schur.BigBASolver; the
        CLI auto-selects it for large mono BA, apps/main.py)."""
        self.system = system
        self.use_schur = use_schur
        self.verbose = verbose
        self.pad = pad
        self.tau = tau
        self.engine = engine
        self.timer = PhaseTimer()
        self.n_iterations = 0
        self._schur_plan = None
        self._v3 = None
        self._big = None
        self._ss = None

    def _resolve_engine(self) -> str:
        """Auto-upgrade dense+use_schur to the sparse Schur engine on
        landmark graphs above the size threshold (same gate as
        GaussNewtonSolver._resolve_solver)."""
        import os

        from slampp_tpu.graph.types import get_vertex_type

        if self.engine == "dense" and self.use_schur:
            thresh = int(os.environ.get("SLAMPP_SPARSE_SCHUR_THRESHOLD", "1500"))
            has_lm = any(
                get_vertex_type(t).is_landmark
                for t, _ in self.system.vertex_index.values()
            )
            if has_lm and self.system.n_vertices >= thresh:
                return "schur_sparse"
        return self.engine

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

    def _plan(self):
        if not self.use_schur:
            return None
        if self._schur_plan is None:
            from slampp_tpu.linear.schur import build_schur_plan

            with self.timer.phase("schur_symbolic"):
                self._schur_plan = build_schur_plan(self.system)
        return self._schur_plan

    def optimize(self, max_iterations: int = 5, min_dx_norm: float = 0.01) -> int:
        if self.system.n_edges == 0:
            return 0
        engine = self._resolve_engine()
        if engine == "big_ba":
            # observation-driven Schur LM (no dense Hessian at any point):
            # the reference's default BA route -us at any scale
            # (src/slam_app/Main.cpp:203-207 -> LinearSolver_Schur.h:1623)
            from slampp_tpu.linear.ba_schur import BigBASolver

            if self._big is None:
                with self.timer.phase("big_ba_symbolic"):
                    self._big = BigBASolver(
                        self.system, verbose=self.verbose, tau=self.tau, sc_f64=False
                    )
            with self.timer.phase("solve"):
                applied = self._big.optimize(max_iterations, min_dx_norm)
            self.n_iterations += max_iterations
            return applied
        # sparse-Schur routing tables are exact-size: capacity-padded
        # per-edge arrays would misalign with the pp/pl routes (same fix as
        # GaussNewtonSolver._resolve_solver) — snapshot unpadded there
        graph = self.system.snapshot(pad=self.pad and engine != "schur_sparse")
        alpha = self.tau * float(_max_edge_hessian_diag(graph))
        nu = 2.0
        last_error = float(_chi2(graph))
        applied = 0
        it = 0
        while it < max_iterations:
            it += 1
            self.n_iterations += 1
            if engine == "v3":
                with self.timer.phase("solve"):
                    new_states, denom, dx_norm, _ = self._v3_solver().damped_step(
                        graph, alpha
                    )
                    dx_norm = float(dx_norm)
            elif engine == "schur_sparse":
                with self.timer.phase("solve"):
                    new_states, denom, dx_norm, _ = self._ss_solver().damped_step(
                        graph, alpha
                    )
                    dx_norm = float(dx_norm)
            else:
                with self.timer.phase("assemble"):
                    H, g, _ = _assemble(graph)
                with self.timer.phase("solve"):
                    if self.use_schur:
                        from slampp_tpu.linear.schur import schur_solve_dense_damped

                        new_states, dx, denom, dx_norm = schur_solve_dense_damped(
                            graph, H, g, alpha, self._plan()
                        )
                    else:
                        new_states, dx, denom, dx_norm = _damped_step(graph, H, g, alpha)
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
            rho = (last_error - f_error) / max(float(denom), 1e-300)
            if rho > 0:
                alpha *= max(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
                nu = 2.0
                last_error = f_error
                graph = candidate
                applied += 1
                if self.verbose:
                    print(f"LM iter {it}: accepted chi2={f_error:.4f} alpha={alpha:.3e}")
            else:
                alpha *= nu
                nu *= 2.0
                if self.verbose:
                    print(f"LM iter {it}: rejected chi2={f_error:.4f} alpha={alpha:.3e}")
        self.system.update_states({t: s for t, s in graph.states.items()})
        return applied

    def chi2(self) -> float:
        return float(_chi2(self.system.snapshot(pad=self.pad)))

    def dump(self) -> None:
        self.timer.dump()
