"""FastL resident-system incremental solver (solvers/fastl.py).

Covers: NumPy model-kernel parity with the JAX linearization, resident-H
consistency against a from-scratch assembly of the SYSTEM's edge list (the
non-circular oracle), chi2 parity with the generic windowed solver and the
batch optimum, resumed-Cholesky validity across freeze/promote/refreeze
events, and the performance contract (bounded per-step work, no JAX
dispatch on the hot path).

Reference capability being matched: CNonlinearSolver_FastL incremental
steps (include/slam/NonlinearSolver_FastL.h:818,954,1637)."""

import os
import tempfile

import numpy as np
import pytest

import jax

from slampp_tpu.graph.system import GraphSystem
from slampp_tpu.graph.types import get_edge_type, get_vertex_type
from slampp_tpu.io.datasets import make_manhattan
from slampp_tpu.io.parser import build_system, parse_file
from slampp_tpu.models import np_kernels as npk
from slampp_tpu.solvers.fastl import FastLSolver, supports_system
from slampp_tpu.solvers.incremental_windowed import WindowedIncrementalSolver


def _records(n_poses, seed=0, loop_prob=0.1):
    text, _ = make_manhattan(n_poses=n_poses, loop_prob=loop_prob, seed=seed)
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        return parse_file(path)
    finally:
        os.unlink(path)


def _run(n_poses, cls=FastLSolver, seed=0, **kw):
    system = GraphSystem()
    w = cls(system, solve_period=1, require_loop_closure=False, **kw)
    build_system(
        _records(n_poses, seed=seed),
        system=system,
        on_edge=lambda s, n: w.incremental_step(),
    )
    return system, w


# ------------------------------------------------------------- numpy kernels


@pytest.mark.parametrize(
    "name",
    ["edge_pose2d", "edge_pose_landmark2d_xy", "edge_pose_landmark2d_rb"],
)
def test_np_kernels_match_jax_linearization(name):
    """r and J of the NumPy kernels == the JAX autodiff linearization used
    by every batch solver (core/assembly.py), at f64."""
    import jax.numpy as jnp

    from slampp_tpu.core.assembly import _edge_residual_and_jacobians

    et = get_edge_type(name)
    vts = tuple(get_vertex_type(t) for t in et.vertex_types)
    rng = np.random.default_rng(3)
    E = 40
    states = tuple(rng.normal(size=(E, vt.state_dim)) * 2 for vt in vts)
    meas = rng.normal(size=(E, et.meas_dim))
    if name == "edge_pose_landmark2d_rb":
        meas[:, 0] = np.abs(meas[:, 0]) + 0.5
    r_np, jacs_np = npk.NP_EDGE_LIN[name](states, meas)
    f = jax.vmap(lambda *a: _edge_residual_and_jacobians(et, vts, a[:-1], a[-1]))
    r_j, jacs_j = f(*[jnp.asarray(s) for s in states], jnp.asarray(meas))
    np.testing.assert_allclose(r_np, np.asarray(r_j), atol=1e-12)
    for jn, jj in zip(jacs_np, jacs_j):
        np.testing.assert_allclose(jn, np.asarray(jj), atol=1e-12)


def test_supports_system_gating():
    system = build_system(_records(50))
    assert supports_system(system)


# -------------------------------------------------------- resident-H oracle


def test_resident_system_matches_from_scratch_assembly():
    """At every solve, H must equal the from-scratch assembly of the
    SYSTEM's live edge list at the solver's linearization points, plus the
    unary factor and the frozen-chunk Schur prior — the non-circular oracle
    (it reads the graph, not the solver's own caches)."""

    checked = {"n": 0}

    class Check(FastLSolver):
        def _solve(self):
            super()._solve()
            if self._H is None or self._lin_stale or self.n_solves % 7:
                return
            n = self._N
            Href = np.zeros((n, n))

            def lin(v):
                t, r = self._slot_vtrow[self._slot_of[v]]
                return self._vt_lin[t][r]

            def off(v):
                return self._slot_off[self._slot_of[v]]

            count = 0
            for tname in self.system.edge_type_names:
                rec = self.system._edges[tname]
                for e, vids in enumerate(rec["vids"]):
                    if any(v in self._frozen_of for v in vids):
                        continue
                    count += 1
                    ss = tuple(lin(v)[None] for v in vids)
                    r, jacs = npk.NP_EDGE_LIN[tname](
                        ss, np.asarray(rec["meas"][e])[None]
                    )
                    W = np.asarray(rec["sigma_inv"][e])
                    for a, va in enumerate(vids):
                        for b, vb in enumerate(vids):
                            Ja, Jb = jacs[a][0], jacs[b][0]
                            Href[
                                off(va) : off(va) + Ja.shape[1],
                                off(vb) : off(vb) + Jb.shape[1],
                            ] += Ja.T @ W @ Jb
            anchor = self.system._unary_anchor
            if anchor is not None and anchor in self._slot_of:
                o = off(anchor)
                Href[np.arange(o, o + 3), np.arange(o, o + 3)] += (
                    self.system.unary_information
                )
            sep = self._sep_scalars()
            n0 = self._sc.shape[0]
            if n0 and sep is not None:
                sel = sep[:n0]
                ok = sel >= 0
                Href[np.ix_(sel[ok], sel[ok])] += self._sc[np.ix_(ok, ok)]
            assert count == sum(es.n for es in self._E.values())
            np.testing.assert_allclose(Href, self._H[:n, :n], atol=1e-7)
            checked["n"] += 1

    system = GraphSystem()
    w = Check(system, solve_period=1, require_loop_closure=False)
    build_system(
        _records(300), system=system, on_edge=lambda s, n: w.incremental_step()
    )
    assert checked["n"] > 20
    assert w.n_freezes >= 1  # the oracle covered post-freeze states


def test_resumed_factor_matches_full_cholesky():
    """After every factor, Lf[:n,:n] == chol(H[:n,:n]) — the resumed-
    from-dirty-column path must be exact (BlockMatrix.h:3691 semantics)."""

    class Check(FastLSolver):
        def _factor(self):
            super()._factor()
            if self._H is None:
                return
            n = self._N
            L = np.linalg.cholesky(self._H[:n, :n] + 1e-12 * np.eye(n))
            # only the lower triangle is the contract: the strict upper is
            # never read (dtrtrs lower=1) and is left unset by dpotrf clean=0
            np.testing.assert_allclose(
                np.tril(L), np.tril(self._Lf[:n, :n]), atol=1e-6
            )

    system = GraphSystem()
    w = Check(system, solve_period=1, require_loop_closure=False)
    build_system(
        _records(250), system=system, on_edge=lambda s, n: w.incremental_step()
    )
    assert w.n_resumed_factor > 100  # the fast path actually ran


# ------------------------------------------------------------------- parity


def test_fastl_matches_windowed_chi2():
    """Same windowing economics, same answer: final chi2 equals the generic
    windowed solver's on the same closure-rich dataset."""
    _, wf = _run(400)
    wf.refresh_frozen()
    chi_f = wf.chi2()
    _, ww = _run(400, cls=WindowedIncrementalSolver)
    ww.refresh_frozen()
    chi_w = ww.chi2()
    assert abs(chi_f - chi_w) / max(chi_w, 1.0) < 0.05


def test_fastl_final_optimize_matches_batch():
    system, w = _run(300)
    w.optimize(max_iterations=15, min_dx_norm=1e-3)
    chi_w = w.chi2()

    from slampp_tpu.linear.partitioned import PartitionedSolver

    sys_b = build_system(_records(300))
    ps = PartitionedSolver(sys_b, mixed_precision=False)
    graph = sys_b.snapshot()
    for _ in range(15):
        states, dxn, chi2 = ps.gn_step(graph)
        graph = graph.replace_states(states)
        if float(dxn) < 1e-3:
            break
    from slampp_tpu.core.assembly import graph_chi2

    chi_b = float(jax.jit(graph_chi2)(graph))
    assert abs(chi_w - chi_b) / max(chi_b, 1.0) < 1e-2


def test_fastl_promote_and_refreeze_path():
    """Closures into frozen interiors must promote + refreeze and stay
    correct (small window forces deep freezing)."""
    system, w = _run(500, chunk=24, window=48)
    assert w.n_freezes > 5
    w.refresh_frozen()
    chi = w.chi2()
    # estimate is sane (unconverged-but-bounded; batch optimum is ~30)
    assert np.isfinite(chi) and chi < 5000.0


def test_fastl_hot_path_has_no_jax_dispatch(monkeypatch):
    """The per-step path must never hit JAX (the windowed solver's failure
    mode was ms-class dispatch per step).  jax.jit results are only allowed
    in chi2()/optimize()."""
    import jax as _jax

    calls = []
    orig = _jax.jit

    def spy(*a, **k):
        calls.append(a)
        return orig(*a, **k)

    monkeypatch.setattr(_jax, "jit", spy)
    system = GraphSystem()
    w = FastLSolver(system, solve_period=1, require_loop_closure=False)
    build_system(
        _records(200), system=system, on_edge=lambda s, n: w.incremental_step()
    )
    w.refresh_frozen()
    assert calls == []


def test_fastl_per_step_work_is_bounded():
    """The live dimension stays bounded by window + chunk + separator as the
    trajectory grows (the FastL economics)."""
    _, w1 = _run(400, chunk=32, window=64)
    _, w2 = _run(1200, chunk=32, window=64)
    bound2 = (w2.window + w2.chunk + len(w2.sep_ids) + 2) * 3
    assert w2._N <= bound2
    assert w2.n_freezes > w1.n_freezes
    assert len(w2._frozen_of) > 600


def test_fastl_se3_sphere_via_jax_adapter():
    """SE(3) pose graphs have no NumPy kernels — the batched-JAX adapter
    carries the FastL engine (exact-parity math, one dispatch per batch).
    Final chi2 must match the generic windowed solver's."""
    from slampp_tpu.io.datasets import make_sphere

    text, _ = make_sphere(n_poses=120, seed=1)
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        recs = parse_file(path)
    finally:
        os.unlink(path)

    def run(cls):
        system = GraphSystem()
        w = cls(system, solve_period=1, require_loop_closure=False,
                chunk=16, window=32)
        build_system(recs, system=system,
                     on_edge=lambda s, n: w.incremental_step())
        w.refresh_frozen()
        return w.chi2(), w

    chi_f, wf = run(FastLSolver)
    assert supports_system(wf.system)
    assert wf.n_freezes >= 1          # the windowed economics engaged
    chi_w, _ = run(WindowedIncrementalSolver)
    assert np.isfinite(chi_f)
    # both are intermediate (pre-final-batch) estimates; cadence differences
    # shift them a few percent — FastL must be at least as good
    assert chi_f < chi_w * 1.02
    assert abs(chi_f - chi_w) / max(chi_w, 1.0) < 0.10


def test_fastl_solve_period_gt_one():
    """-nsp 5 semantics: solves happen every 5 new vertices, queued edges
    are ingested at solve time, and the final estimate stays sane."""
    system = GraphSystem()
    w = FastLSolver(system, solve_period=5, require_loop_closure=False)
    build_system(
        _records(300), system=system, on_edge=lambda s, n: w.incremental_step()
    )
    assert 40 <= w.n_solves <= 75  # ~300/5 with closure-step jitter
    w.refresh_frozen()
    chi = w.chi2()
    assert np.isfinite(chi) and chi < 5000.0
    w.optimize(max_iterations=10, min_dx_norm=1e-3)
    assert w.chi2() < 50.0
