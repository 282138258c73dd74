"""Multi-view geometry module tests vs synthetic ground truth."""

import numpy as np
import pytest

from slampp_tpu.geometry import mvg


def _scene(seed=0, n=30):
    rng = np.random.default_rng(seed)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    X = rng.normal(0, 1.0, (n, 3)) + np.array([0, 0, 6.0])
    # camera 2 pose (world-to-cam2)
    aa = rng.normal(0, 0.2, 3)
    from scipy.spatial.transform import Rotation

    R = Rotation.from_rotvec(aa).as_matrix()
    t = np.array([0.8, -0.1, 0.1])

    def proj(P, X):
        x = (X @ P[:, :3].T) + P[:, 3]
        return x[:, :2] / x[:, 2:3]

    P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = K @ np.hstack([R, t[:, None]])
    x1 = proj(P1, X)
    x2 = proj(P2, X)
    return K, X, R, t, P1, P2, x1, x2


def test_triangulation_exact():
    K, X, R, t, P1, P2, x1, x2 = _scene()
    for i in range(10):
        Xi = mvg.triangulate_dlt(P1, P2, x1[i], x2[i])
        np.testing.assert_allclose(Xi, X[i], atol=1e-8)


def test_fundamental_8pt_epipolar_constraint():
    K, X, R, t, P1, P2, x1, x2 = _scene()
    F = mvg.fundamental_8pt(x1, x2)
    h1 = np.concatenate([x1, np.ones((len(x1), 1))], 1)
    h2 = np.concatenate([x2, np.ones((len(x2), 1))], 1)
    res = np.abs(np.einsum("ni,ij,nj->n", h2, F, h1))
    assert res.max() < 1e-6


def test_fundamental_7pt_contains_truth():
    K, X, R, t, P1, P2, x1, x2 = _scene(seed=3)
    sols = mvg.fundamental_7pt(x1[:7], x2[:7])
    assert len(sols) >= 1
    h1 = np.concatenate([x1[:7], np.ones((7, 1))], 1)
    h2 = np.concatenate([x2[:7], np.ones((7, 1))], 1)
    best = min(
        np.abs(np.einsum("ni,ij,nj->n", h2, F, h1)).max() for F in sols
    )
    assert best < 1e-6


def test_pose_from_essential_recovers_rotation():
    K, X, R, t, P1, P2, x1, x2 = _scene(seed=1)
    F = mvg.fundamental_8pt(x1, x2)
    E = mvg.essential_from_fundamental(F, K, K)
    R_est, t_est = mvg.pose_from_essential(E, x1, x2, K, K)
    np.testing.assert_allclose(R_est, R, atol=1e-6)
    t_dir = t / np.linalg.norm(t)
    t_est_dir = t_est / np.linalg.norm(t_est)
    np.testing.assert_allclose(np.abs(t_dir @ t_est_dir), 1.0, atol=1e-6)


def test_pnp_dlt():
    K, X, R, t, P1, P2, x1, x2 = _scene(seed=2)
    R_est, t_est = mvg.pnp_dlt(X, x2, K)
    np.testing.assert_allclose(R_est, R, atol=1e-6)
    np.testing.assert_allclose(t_est, t, atol=1e-6)


def test_p3p_contains_truth():
    K, X, R, t, P1, P2, x1, x2 = _scene(seed=4)
    sols = mvg.p3p_grunert(X[:3], x2[:3], K)
    assert len(sols) >= 1
    errs = [np.linalg.norm(Rs - R) + np.linalg.norm(ts - t) for Rs, ts in sols]
    assert min(errs) < 1e-6


def test_kabsch_alignment():
    rng = np.random.default_rng(5)
    A = rng.normal(0, 1, (20, 3))
    from scipy.spatial.transform import Rotation

    R = Rotation.from_rotvec([0.2, -0.1, 0.4]).as_matrix()
    t = np.array([1.0, 2.0, -0.5])
    B = A @ R.T + t
    R_est, t_est, rmse = mvg.kabsch(A, B)
    assert rmse < 1e-10
    np.testing.assert_allclose(R_est, R, atol=1e-10)


def test_homography_dlt():
    rng = np.random.default_rng(6)
    H = np.array([[1.1, 0.02, 5.0], [-0.01, 0.95, -3.0], [1e-4, -2e-4, 1.0]])
    x1 = rng.uniform(0, 640, (12, 2))
    h1 = np.concatenate([x1, np.ones((12, 1))], 1) @ H.T
    x2 = h1[:, :2] / h1[:, 2:3]
    H_est = mvg.homography_dlt(x1, x2)
    np.testing.assert_allclose(H_est, H / H[2, 2], atol=1e-8)


def test_distortion_roundtrip():
    intr = np.array([500.0, 500.0, 320.0, 240.0, 0.0005])
    uv = np.array([[100.0, 50.0], [400.0, 300.0]])
    d = mvg.distort_radial(uv, intr)
    u = mvg.undistort_radial(d, intr, iters=20)
    np.testing.assert_allclose(u, uv, atol=1e-8)
