#!/usr/bin/env python
"""Sim(3) landmark-parameterization study (ACRA'15).

Reference analog: src/ba_parameter_acra (1,600 LoC) — the experiment behind
the ~30 Sim3 edge classes (Sim3_Types.h:247-3598): solve the same SfM problem
with landmarks parameterized as GLOBAL XYZ, GLOBAL INVERSE DEPTH, and
LOCAL-from-other INVERSE DISTANCE, and compare convergence (chi2 per GN
iteration) — the ACRA study's headline comparison.

Usage:  python examples/ba_parameter_acra_example.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import slampp_tpu  # noqa: F401
import jax.numpy as jnp

from slampp_tpu.geometry import sim3 as g_sim3
from slampp_tpu.graph.system import GraphSystem
from slampp_tpu.io.parser import _np_quat_to_aa, _np_rot_to_quat
from slampp_tpu.models import sim3 as m_sim3  # noqa: F401  (registers types)
from slampp_tpu.solvers.lm import LevenbergMarquardtSolver


def make_cams(n_cams, intr):
    cams = []
    for c in range(n_cams):
        a = 2 * np.pi * c / n_cams
        center = np.array([6 * np.cos(a), 6 * np.sin(a), 1.0])
        z = -center / np.linalg.norm(center)
        x = np.cross([0.0, 0, 1], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R_c2w = np.stack([x, y, z], axis=1)
        aa = _np_quat_to_aa(_np_rot_to_quat(R_c2w))
        tRs = np.concatenate([center, aa, [1.0]])
        log = np.asarray(g_sim3.sim3_log(jnp.asarray(tRs)))
        cams.append(log)
    return cams


def build(param: str, seed=0, n_cams=6, n_pts=40):
    rng = np.random.default_rng(seed)
    intr = np.array([400.0, 400.0, 320.0, 240.0, 0.0])
    cams = make_cams(n_cams, intr)
    system = GraphSystem()
    for c, log in enumerate(cams):
        system.add_vertex("camsim3", c, np.concatenate([log, intr]))
    pts = rng.normal(0, 1.5, (n_pts, 3))

    n_obs = 0
    for p in range(n_pts):
        pid = n_cams + p
        noisy = pts[p] + rng.normal(0, 0.1, 3)
        owner = int(rng.integers(0, n_cams))
        # observations first: a landmark needs >= 2 valid views to be
        # constrained (otherwise H is singular and GN produces NaN)
        views = []
        for c in rng.choice(n_cams, 3, replace=False):
            x_loc = np.asarray(
                g_sim3.world_to_local(jnp.asarray(cams[int(c)]), jnp.asarray(pts[p]))
            )
            if x_loc[2] < 0.3:
                continue
            uv = np.asarray(
                g_sim3.project_p2c_xyz(
                    jnp.asarray(cams[int(c)]), jnp.asarray(intr), jnp.asarray(pts[p])
                )
            ) + rng.normal(0, 0.5, 2)
            views.append((int(c), uv))
        if param == "invdist" and owner in [c for c, _ in views]:
            pass  # owner view handled below
        if len(views) < 2:
            continue
        if param == "xyz":
            system.add_vertex("xyz", pid, noisy)
        elif param == "invdepth":
            system.add_vertex(
                "invdepth", pid, np.asarray(g_sim3.xyz_to_invdepth(jnp.asarray(noisy)))
            )
        else:  # invdist, landmark owned by `owner` (local frame)
            x_loc = np.asarray(
                g_sim3.world_to_local(jnp.asarray(cams[owner]), jnp.asarray(noisy))
            )
            d = np.linalg.norm(x_loc)
            system.add_vertex(
                "invdist", pid, np.concatenate([[1.0 / max(d, 1e-3)], x_loc / max(d, 1e-3)])
            )
        for c, uv in views:
            if param == "xyz":
                system.add_edge("edge_p2c_xyz_sim3_g", (pid, c), uv, np.eye(2))
            elif param == "invdepth":
                system.add_edge("edge_p2c_invdepth_sim3_g", (pid, c), uv, np.eye(2))
            else:
                if c == owner:
                    continue
                system.add_edge(
                    "edge_p2c_invdist_sim3_lo", (pid, owner, c), uv, np.eye(2)
                )
            n_obs += 1
    return system, n_obs


def main():
    print("ACRA'15 Sim(3) landmark parameterization study "
          "(chi2 per GN iteration, identical scene):\n")
    for param in ["xyz", "invdepth", "invdist"]:
        system, n_obs = build(param)
        # LM, as in the reference study (BA auto-upgrades to LM; the scale
        # gauge leaves one exact zero mode that undamped GN cannot factor)
        lm = LevenbergMarquardtSolver(system)
        chis = [lm.chi2()]
        for _ in range(6):
            lm.optimize(max_iterations=1, min_dx_norm=1e-9)
            chis.append(lm.chi2())
        tail = "  ".join(f"{c:9.2f}" for c in chis)
        print(f"{param:9s} ({n_obs:3d} obs): {tail}")


if __name__ == "__main__":
    main()
