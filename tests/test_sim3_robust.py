"""Sim(3) geometry/model tests and robust-kernel tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slampp_tpu.geometry import sim3 as g_sim3
from slampp_tpu.geometry import sim3 as m_sim3_geo
import jax.numpy as jnp
from slampp_tpu.graph.system import GraphSystem
from slampp_tpu.models import robust, sim3 as m_sim3
from slampp_tpu.solvers import GaussNewtonSolver, LevenbergMarquardtSolver


def test_sim3_log_matches_reference_example():
    """The worked example in slam_app/Main.h:731-809 (TooN convention)."""
    tRs = jnp.array([2.0, 2.0, 2.0, 0.0, 0.523608, 0.0, 0.799988])
    v = np.array(g_sim3.sim3_log(tRs))
    np.testing.assert_allclose(
        v, [1.62293, 2.23145, 2.74863, 0.0, 0.523608, 0.0, -0.223158], atol=2e-5
    )
    np.testing.assert_allclose(np.array(g_sim3.sim3_exp(jnp.array(v))), np.array(tRs), atol=1e-9)


def test_sim3_compose_inverse():
    rng = np.random.default_rng(0)
    for _ in range(10):
        a = jnp.array(rng.normal(0, 0.7, 7))
        b = jnp.array(rng.normal(0, 0.7, 7))
        rel = g_sim3.absolute_to_relative(a, b)
        back = g_sim3.relative_to_absolute(a, rel)
        np.testing.assert_allclose(np.array(back), np.array(b), atol=1e-9)
        # transform roundtrip
        A = g_sim3.sim3_exp(a)
        X = jnp.array(rng.normal(0, 2, 3))
        np.testing.assert_allclose(
            np.array(g_sim3.transform_tRs(A, g_sim3.inv_transform_tRs(A, X))),
            np.array(X),
            atol=1e-10,
        )


def test_invdepth_roundtrip():
    X = jnp.array([1.5, -0.5, 4.0])
    v = g_sim3.xyz_to_invdepth(X)
    np.testing.assert_allclose(np.array(g_sim3.invdepth_to_xyz(v)), np.array(X), atol=1e-12)


def _sim3_ba_system(seed=0, n_cams=5, n_pts=40, edge="edge_p2c_xyz_sim3_g"):
    """Tiny Sim(3) BA problem built through the library API (the reference's
    slam_simple_example pattern)."""
    rng = np.random.default_rng(seed)
    intr = np.array([400.0, 400.0, 320.0, 240.0, 0.0])
    system = GraphSystem()
    cams = []
    for c in range(n_cams):
        a = 2 * np.pi * c / n_cams
        center = np.array([6 * np.cos(a), 6 * np.sin(a), 1.0])
        z = -center / np.linalg.norm(center)
        x = np.cross([0.0, 0, 1], z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R_c2w = np.stack([x, y, z], axis=1)
        from slampp_tpu.io.parser import _np_rot_to_quat, _np_quat_to_aa

        aa = _np_quat_to_aa(_np_rot_to_quat(R_c2w))
        tRs = np.concatenate([center, aa, [1.0]])
        log = np.asarray(g_sim3.sim3_log(jnp.asarray(tRs)))
        cams.append((tRs, log))
        system.add_vertex("camsim3", c, np.concatenate([log, intr]))
    pts = rng.normal(0, 1.5, (n_pts, 3))
    for p in range(n_pts):
        system.add_vertex("xyz", n_cams + p, pts[p] + rng.normal(0, 0.1, 3))
    n_obs = 0
    for p in range(n_pts):
        for c in rng.choice(n_cams, 3, replace=False):
            tRs, log = cams[c]
            uv = np.asarray(
                g_sim3.project_p2c_xyz(jnp.asarray(log), jnp.asarray(intr), jnp.asarray(pts[p]))
            )
            x_loc = np.asarray(
                g_sim3.inv_transform_tRs(g_sim3.sim3_exp(jnp.asarray(log)), jnp.asarray(pts[p]))
            )
            if x_loc[2] < 0.3:
                continue
            uv = uv + rng.normal(0, 0.5, 2)
            system.add_edge(edge, (n_cams + p, int(c)), uv, np.eye(2))
            n_obs += 1
    assert n_obs > 50
    return system, pts


def test_sim3_ba_lm_converges():
    system, pts = _sim3_ba_system()
    solver = LevenbergMarquardtSolver(system)
    chi2_0 = solver.chi2()
    solver.optimize(max_iterations=8, min_dx_norm=1e-8)
    chi2 = solver.chi2()
    assert chi2 < chi2_0 * 0.05
    dof = system.chi2_dof()
    assert chi2 < 3.0 * dof


def test_robust_weights_shapes_and_limits():
    e = jnp.array(0.0)
    for name, fn in robust.LOSSES.items():
        w0 = float(fn(jnp.array(1e-9)))
        assert abs(w0 - 1.0) < 1e-6, name  # weight -> 1 at zero error
        wbig = float(fn(jnp.array(100.0)))
        assert wbig < 0.2, name  # outliers downweighted


def test_robust_edge_rejects_outlier():
    """A robust Huber SE(2) graph must be pulled less by one gross outlier
    than the non-robust version (IRLS downweighting)."""
    from slampp_tpu.models import se2 as m_se2

    def build(edge_type):
        system = GraphSystem()
        info = np.eye(3) * 100.0
        for i in range(1, 20):
            system.add_edge(
                edge_type, (i - 1, i), np.array([1.0, 0.0, 0.0]), info,
                m_se2.POSE_POSE_INITIALIZERS,
            )
        # gross outlier loop closure
        system.add_edge(edge_type, (0, 19), np.array([5.0, 5.0, 1.0]), info)
        return system

    robust_et = robust.robustify(m_se2.EDGE_POSE2D, loss="huber", scale=0.5)

    plain = GaussNewtonSolver(build("edge_pose2d"))
    plain.optimize(10, 1e-8)
    rob = GaussNewtonSolver(build(robust_et.name))
    rob.optimize(10, 1e-8)

    # chain position of the robust solution stays closer to the odometry
    p_plain = plain.system.vertex_state(19)
    p_rob = rob.system.vertex_state(19)
    odo = np.array([19.0, 0.0, 0.0])
    assert np.linalg.norm(p_rob[:2] - odo[:2]) < np.linalg.norm(p_plain[:2] - odo[:2])


def test_cli_end_to_end(tmp_path):
    from slampp_tpu.apps.main import main
    from slampp_tpu.io.datasets import make_manhattan

    text, _ = make_manhattan(n_poses=80, loop_prob=0.4, loop_separation=10, seed=1)
    ds = tmp_path / "m80.g2o"
    ds.write_text(text)
    sol = tmp_path / "solution.txt"
    plot = tmp_path / "plot.png"
    rc = main(
        [
            "-i", str(ds), "-po", "--json", "-s", str(sol), "-p", str(plot),
            "--no-detailed-timing",
        ]
    )
    assert rc == 0
    assert sol.exists() and len(sol.read_text().splitlines()) == 80
    assert plot.exists()


def test_invdist_ls_edge_converges():
    """1-DoF inverse-distance landmark (stored ray) optimizes its depth."""
    from slampp_tpu.models.sim3 import invdist_to_xyz

    intr = np.array([400.0, 400.0, 320.0, 240.0, 0.0])
    X_true = np.array([0.4, -0.2, 5.0])  # in the owner camera frame
    ray = X_true / np.linalg.norm(X_true)
    q_true = 1.0 / np.linalg.norm(X_true)
    uv = np.asarray(
        m_sim3_geo.project_p2c_local_xyz(jnp.asarray(X_true), jnp.asarray(intr))
    )
    system = GraphSystem()
    system.add_vertex("invdist", 0, np.array([q_true * 2.0, *ray]))  # bad depth
    meas = np.concatenate([uv, intr])
    system.add_edge("edge_p2c_invdist_sim3_ls", (0,), meas, np.eye(2))
    # a second observation from a known other camera pins the depth
    cam2_tRs = np.array([0.5, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0])
    cam2_log = np.asarray(m_sim3_geo.sim3_log(jnp.asarray(cam2_tRs)))
    system.add_vertex("camsim3", 1, np.concatenate([cam2_log, intr]), const=True)
    owner_log = np.zeros(7)
    system.add_vertex("camsim3", 2, np.concatenate([owner_log, intr]), const=True)
    x_obs = np.asarray(
        m_sim3_geo.local_to_other(
            jnp.asarray(X_true), jnp.asarray(owner_log), jnp.asarray(cam2_log)
        )
    )
    uv2 = np.asarray(
        m_sim3_geo.project_p2c_local_xyz(jnp.asarray(x_obs), jnp.asarray(intr))
    )
    system.add_edge("edge_p2c_invdist_sim3_lo", (0, 2, 1), uv2, np.eye(2))

    solver = GaussNewtonSolver(system, linear_solver="dense")
    solver.optimize(15, 1e-12)
    st = system.vertex_state(0)
    assert abs(st[0] - q_true) < 1e-6
    np.testing.assert_allclose(
        np.asarray(invdist_to_xyz(jnp.asarray(st))), X_true, atol=1e-5
    )


def test_angle_error_zero_at_exact_observation():
    """Angle-error residual (Sim3_Types.h AngleErr family) must vanish when
    the pixel observation is exact, and grow with angular deviation."""
    intr = jnp.array([400.0, 400.0, 320.0, 240.0, 0.05])
    x_local = jnp.array([0.3, -0.2, 2.0])
    uv = g_sim3.project_p2c_local_xyz(x_local, intr)
    ray = g_sim3.backproject_ray(uv, intr)
    r = g_sim3.tangent_angle_error(ray, x_local)
    assert float(jnp.linalg.norm(r)) < 1e-3  # fixed-point undistort tolerance
    # no distortion: exactly zero
    intr0 = intr.at[4].set(0.0)
    uv0 = g_sim3.project_p2c_local_xyz(x_local, intr0)
    r0 = g_sim3.tangent_angle_error(g_sim3.backproject_ray(uv0, intr0), x_local)
    assert float(jnp.linalg.norm(r0)) < 1e-12
    # a rotated direction produces ~the rotation angle
    c, s = np.cos(0.01), np.sin(0.01)
    R = jnp.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    r1 = g_sim3.tangent_angle_error(g_sim3.backproject_ray(uv0, intr0), R @ x_local)
    # deviation = theta * sin(angle(v, axis)) — within 1% of theta here
    np.testing.assert_allclose(float(jnp.linalg.norm(r1)), 0.01, rtol=1e-2)


def test_sim3_ba_angle_error_lm_converges():
    """LM over angle-error edges (the ACRA study's second residual axis) must
    recover the same scene as the reprojection edges."""
    # angular information: sigma_px / f ~ 0.5/400 rad  ->  info = (f/0.5)^2
    system, pts = _sim3_ba_system(edge="edge_p2c_xyz_sim3_g_angle")
    # rescale informations to angular units so chi2/dof is comparable
    rec = system._edges["edge_p2c_xyz_sim3_g_angle"]
    for i in range(len(rec["sigma_inv"])):
        rec["sigma_inv"][i] = np.eye(2) * (400.0 / 0.5) ** 2
    solver = LevenbergMarquardtSolver(system)
    chi2_0 = solver.chi2()
    solver.optimize(max_iterations=10, min_dx_norm=1e-8)
    chi2 = solver.chi2()
    assert chi2 < chi2_0 * 0.05
    dof = system.chi2_dof()
    assert chi2 < 3.0 * dof
