#!/usr/bin/env python
"""Golden-value regression suite.

Capability parity with the reference's de-facto correctness contract,
``scripts/tests/unit_tests.sh`` (353 lines: md5-pinned datasets, exact
iteration counts, rounded denormalized chi2).  The reference datasets are not
available in this environment (zero egress), so the suite pins *synthetic*
datasets by generator seed + md5 of the generated text, and golden chi2
values recorded from a verified build (regenerate with --record).

Usage:
    python scripts/regression.py            # verify against goldens
    python scripts/regression.py --record   # re-record goldens
"""

import argparse
import hashlib
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "regression_goldens.json")

# (name, generator, gen_kwargs, mode) — mirrors the unit_tests.sh matrix:
# batch pose-only 2D/3D, incremental 2D, BA batch with Schur
CONFIGS = [
    ("manhattan300_batch", "manhattan", dict(n_poses=300, loop_prob=0.6, loop_separation=20, loop_radius=5.0, seed=0), "batch"),
    ("manhattan1000_batch", "manhattan", dict(n_poses=1000, loop_prob=0.3, loop_separation=30, loop_radius=4.0, seed=1), "batch"),
    ("manhattan300_incremental", "manhattan", dict(n_poses=300, loop_prob=0.6, loop_separation=20, loop_radius=5.0, seed=0), "incremental"),
    ("sphere300_batch", "sphere", dict(n_poses=300, n_rings=15, seed=0), "batch"),
    ("ba_small_schur", "ba", dict(n_cams=10, n_points=120, obs_per_point=5, seed=0), "ba"),
]


def _gen(kind, kwargs):
    from slampp_tpu.io import datasets

    if kind == "manhattan":
        return datasets.make_manhattan(**kwargs)[0]
    if kind == "sphere":
        return datasets.make_sphere(**kwargs)[0]
    if kind == "ba":
        return datasets.make_ba_scene(**kwargs)[0]
    raise ValueError(kind)


def run_config(name, kind, kwargs, mode):
    import jax

    from slampp_tpu.io.parser import build_system, parse_file
    from slampp_tpu.solvers import (
        GaussNewtonSolver,
        IncrementalSolver,
        LevenbergMarquardtSolver,
    )

    text = _gen(kind, kwargs)
    md5 = hashlib.md5(text.encode()).hexdigest()
    with tempfile.NamedTemporaryFile("w", suffix=".g2o", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        recs = parse_file(path)
        if mode == "incremental":
            from slampp_tpu.graph.system import GraphSystem

            system = GraphSystem()
            solver = IncrementalSolver(system, solve_period=10, max_iterations=3)
            from slampp_tpu.models import se2 as m_se2

            for r in recs:
                if r.kind == "edge2":
                    system.add_edge("edge_pose2d", r.ids, r.values, r.info, m_se2.POSE_POSE_INITIALIZERS)
                    solver.incremental_step(r.ids)
            solver.optimize(5, 0.01)
            iters = solver.n_iterations
        else:
            system = build_system(recs)
            if mode == "ba":
                solver = LevenbergMarquardtSolver(system, use_schur=True)
            else:
                solver = GaussNewtonSolver(system)
            iters = solver.optimize(5, 0.01)
        chi2 = solver.chi2()
        return {"md5": md5, "chi2": chi2, "iterations": iters}
    finally:
        os.unlink(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--record", action="store_true")
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", args.platform)
    import slampp_tpu  # noqa: F401

    goldens = {}
    if os.path.exists(GOLDEN_PATH) and not args.record:
        with open(GOLDEN_PATH) as f:
            goldens = json.load(f)

    results = {}
    failures = 0
    for name, kind, kwargs, mode in CONFIGS:
        res = run_config(name, kind, kwargs, mode)
        results[name] = res
        if args.record:
            print(f"recorded {name}: chi2={res['chi2']:.4f} md5={res['md5']}")
            continue
        g = goldens.get(name)
        if g is None:
            print(f"MISSING golden for {name}")
            failures += 1
            continue
        ok_md5 = g["md5"] == res["md5"]
        # chi2 contract: match to 1e-6 relative (the reference rounds to int;
        # we are stricter since generator + solver are both deterministic)
        ok_chi2 = abs(g["chi2"] - res["chi2"]) <= 1e-6 * max(1.0, abs(g["chi2"]))
        status = "OK" if (ok_md5 and ok_chi2) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{status} {name}: chi2={res['chi2']:.6f} (golden {g['chi2']:.6f}) "
            f"md5={'ok' if ok_md5 else 'MISMATCH'}"
        )

    if args.record:
        with open(GOLDEN_PATH, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {GOLDEN_PATH}")
        return 0
    print("regression:", "PASS" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
