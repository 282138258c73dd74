"""Geometry-layer property tests vs NumPy/SciPy oracles.

Reference test-strategy analog: tier-1 kernel unit tests vs dense Eigen
(SURVEY.md §4) — here the oracle is scipy.spatial.transform.Rotation.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from slampp_tpu.geometry import se2, se3


def test_se2_compose_inverse_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        p1 = rng.normal(0, 2, 3)
        p2 = rng.normal(0, 2, 3)
        rel = se2.absolute_to_relative(jnp.array(p1), jnp.array(p2))
        p2_back = se2.relative_to_absolute(jnp.array(p1), rel)
        np.testing.assert_allclose(np.array(p2_back[:2]), p2[:2], atol=1e-12)
        # angles congruent mod 2pi
        da = float(p2_back[2]) - p2[2]
        assert abs(np.remainder(da + np.pi, 2 * np.pi) - np.pi) < 1e-12


def test_se2_jacobians_match_autodiff():
    rng = np.random.default_rng(1)
    p1 = jnp.array(rng.normal(0, 1, 3))
    p2 = jnp.array(rng.normal(0, 1, 3))
    h, j1, j2 = se2.absolute_to_relative_jacobians(p1, p2)
    j1_ad = jax.jacfwd(lambda a: se2.absolute_to_relative(a, p2))(p1)
    j2_ad = jax.jacfwd(lambda b: se2.absolute_to_relative(p1, b))(p2)
    np.testing.assert_allclose(np.array(j1), np.array(j1_ad), atol=1e-10)
    np.testing.assert_allclose(np.array(j2), np.array(j2_ad), atol=1e-10)


def test_axis_angle_quat_roundtrip():
    rng = np.random.default_rng(2)
    for _ in range(50):
        aa = rng.normal(0, 1.5, 3)
        q = se3.axis_angle_to_quat(jnp.array(aa))
        # oracle: scipy rotvec -> quat (x,y,z,w)
        q_ref = Rotation.from_rotvec(aa).as_quat()
        q_ref = np.array([q_ref[3], q_ref[0], q_ref[1], q_ref[2]])
        if q_ref[0] < 0:
            q_ref = -q_ref  # reference canonicalizes w >= 0
        np.testing.assert_allclose(np.array(q), q_ref, atol=1e-12)
        aa_back = se3.quat_to_axis_angle(q)
        rv_back = Rotation.from_quat(
            [float(q[1]), float(q[2]), float(q[3]), float(q[0])]
        ).as_rotvec()
        np.testing.assert_allclose(np.array(aa_back), rv_back, atol=1e-10)


def test_axis_angle_rot_matrix_matches_scipy():
    rng = np.random.default_rng(3)
    for _ in range(20):
        aa = rng.normal(0, 1, 3)
        R = se3.axis_angle_to_rot(jnp.array(aa))
        R_ref = Rotation.from_rotvec(aa).as_matrix()
        np.testing.assert_allclose(np.array(R), R_ref, atol=1e-12)
        # rot_to_axis_angle returns the canonical short rotation (like the
        # reference's copysign branch) — compare as rotations
        aa_back = np.array(se3.rot_to_axis_angle(jnp.array(R_ref)))
        np.testing.assert_allclose(
            Rotation.from_rotvec(aa_back).as_matrix(), R_ref, atol=1e-10
        )
        assert np.linalg.norm(aa_back) <= np.pi + 1e-9


def test_se3_compose_matches_matrix_composition():
    rng = np.random.default_rng(4)
    for _ in range(20):
        p1 = rng.normal(0, 1, 6)
        d = rng.normal(0, 0.5, 6)
        out = se3.relative_to_absolute(jnp.array(p1), jnp.array(d))
        R1 = Rotation.from_rotvec(p1[3:]).as_matrix()
        Rd = Rotation.from_rotvec(d[3:]).as_matrix()
        t_ref = p1[:3] + R1 @ d[:3]
        R_ref = R1 @ Rd
        np.testing.assert_allclose(np.array(out[:3]), t_ref, atol=1e-10)
        np.testing.assert_allclose(
            Rotation.from_rotvec(np.array(out[3:])).as_matrix(), R_ref, atol=1e-10
        )


def test_se3_relative_inverse_of_compose():
    rng = np.random.default_rng(5)
    p1 = jnp.array(rng.normal(0, 1, 6))
    d = jnp.array(rng.normal(0, 0.5, 6))
    p2 = se3.relative_to_absolute(p1, d)
    d_back = se3.absolute_to_relative(p1, p2)
    np.testing.assert_allclose(np.array(d_back), np.array(d), atol=1e-10)


def test_se3_pose_error_zero_at_truth():
    rng = np.random.default_rng(6)
    p1 = jnp.array(rng.normal(0, 1, 6))
    p2 = jnp.array(rng.normal(0, 1, 6))
    z = se3.absolute_to_relative(p1, p2)
    err = se3.pose_pose_error(p1, p2, z)
    np.testing.assert_allclose(np.array(err), np.zeros(6), atol=1e-10)
