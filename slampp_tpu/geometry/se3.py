"""SE(3) pose math as pure JAX functions.

Capability parity with ``C3DJacobians`` (include/slam/3DSolverBase.h:265):
poses are 6-vectors (translation, axis-angle rotation).  Composition uses
quaternions internally; the quaternion<->axis-angle conversions replicate the
reference's numerics (the "short rotation" branch selection via copysign and
the small-angle limits, 3DSolverBase.h:477-651) so converged chi-squared
matches the golden values.

Quaternions here are (w, x, y, z) arrays of shape (4,).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ------------------------------------------------------------------ quaternion
def quat_mul(q1, q2):
    w1, x1, y1, z1 = q1[0], q1[1], q1[2], q1[3]
    w2, x2, y2, z2 = q2[0], q2[1], q2[2], q2[3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


def quat_conj(q):
    return jnp.stack([q[0], -q[1], -q[2], -q[3]])


def quat_rotate(q, v):
    """Rotate vector v by unit quaternion q (Eigen's _transformVector)."""
    uv = 2.0 * jnp.cross(q[1:], v)
    return v + q[0] * uv + jnp.cross(q[1:], uv)


def quat_normalize(q):
    return q / jnp.linalg.norm(q)


def axis_angle_to_quat(aa):
    """Reference: C3DJacobians::f_AxisAngle_to_Quat (3DSolverBase.h:477).

    Uses sin(a/2)/a with the a->0 limit 0.5; flips sign so w >= 0 (the
    "fmod-free" canonicalization in the reference).

    All small-angle branches work on the *squared* norm with Taylor
    expansions so autodiff (the solvers' Jacobian path) stays NaN-free at
    aa = 0 — the untaken sqrt branch would otherwise poison jacfwd.
    """
    sq = jnp.sum(aa * aa)
    small = sq < 1e-16
    t = jnp.where(small, 1.0, sq)
    angle = jnp.sqrt(t)
    c = jnp.where(small, 1.0 - sq / 8.0, jnp.cos(angle * 0.5))
    f = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(angle * 0.5) / angle)
    f = jnp.where(c < 0, -f, f)
    c = jnp.abs(c)
    q = jnp.concatenate([c[None], aa * f])
    return quat_normalize(q)


def quat_to_axis_angle(q):
    """Reference: C3DJacobians::f_Quat_to_AxisAngle (3DSolverBase.h:557-651).

    half_angle = copysign(atan2(|v|, |w|), w) — the short rotation; the
    |v|->0 limit is 2*v/|w| (= 2*v for unit quaternions).  Squared-norm
    Taylor branches keep autodiff NaN-free at v = 0.
    """
    w = q[0]
    v = q[1:]
    sq = jnp.sum(v * v)
    small = sq < 1e-24
    t = jnp.where(small, 1.0, sq)
    vn = jnp.sqrt(t)
    aw = jnp.abs(w)
    sgn = jnp.where(w < 0, -1.0, 1.0)
    scale_big = sgn * 2.0 * jnp.arctan2(vn, aw) / vn
    aw_safe = jnp.maximum(aw, 1e-12)
    # atan2(vn, aw)/vn ~ 1/aw - vn^2/(3 aw^3)
    scale_small = sgn * 2.0 * (1.0 / aw_safe - sq / (3.0 * aw_safe**3))
    return v * jnp.where(small, scale_small, scale_big)


def axis_angle_to_rot(aa):
    """Rodrigues formula (reference t_AxisAngle_to_RotMatrix, 3DSolverBase.h:292),
    in the smooth sinc form R = I + sinc(a) K + ((1-cos a)/a^2) K^2 with
    K = skew(aa), Taylor-guarded at a = 0 for autodiff."""
    sq = jnp.sum(aa * aa)
    small = sq < 1e-16
    t = jnp.where(small, 1.0, sq)
    angle = jnp.sqrt(t)
    sinc = jnp.where(small, 1.0 - sq / 6.0, jnp.sin(angle) / angle)
    cosc = jnp.where(small, 0.5 - sq / 24.0, (1.0 - jnp.cos(angle)) / t)
    K = _skew(aa)
    return jnp.eye(3, dtype=aa.dtype) + sinc * K + cosc * (K @ K)


def _skew(v):
    return jnp.stack(
        [
            jnp.stack([jnp.zeros(()), -v[2], v[1]]),
            jnp.stack([v[2], jnp.zeros(()), -v[0]]),
            jnp.stack([-v[1], v[0], jnp.zeros(())]),
        ]
    )


def rot_to_axis_angle(R):
    """Via quaternion (robust); reference v_RotMatrix_to_AxisAngle."""
    return quat_to_axis_angle(rot_to_quat(R))


def rot_to_quat(R):
    """Shepperd's method, branch-free with jnp.where."""
    t = jnp.trace(R)
    # four candidate constructions, pick numerically best
    qw = jnp.sqrt(jnp.maximum(0.0, 1.0 + t)) / 2.0
    qx = jnp.sqrt(jnp.maximum(0.0, 1.0 + R[0, 0] - R[1, 1] - R[2, 2])) / 2.0
    qy = jnp.sqrt(jnp.maximum(0.0, 1.0 - R[0, 0] + R[1, 1] - R[2, 2])) / 2.0
    qz = jnp.sqrt(jnp.maximum(0.0, 1.0 - R[0, 0] - R[1, 1] + R[2, 2])) / 2.0
    qx = qx * jnp.sign(jnp.where(R[2, 1] - R[1, 2] == 0, 1.0, R[2, 1] - R[1, 2]))
    qy = qy * jnp.sign(jnp.where(R[0, 2] - R[2, 0] == 0, 1.0, R[0, 2] - R[2, 0]))
    qz = qz * jnp.sign(jnp.where(R[1, 0] - R[0, 1] == 0, 1.0, R[1, 0] - R[0, 1]))
    q = jnp.stack([qw, qx, qy, qz])
    return quat_normalize(q)


# ------------------------------------------------------------------- SE(3) ops
def relative_to_absolute(p1, d):
    """Compose poses: t = t1 + R1 d_t; rot = aa(q1 * q_d).

    Reference: C3DJacobians::Relative_to_Absolute (3DSolverBase.h:807).
    This is also the vertex retraction (CVertexPose3D::Operator_Plus,
    SE3_Types.h:45).
    """
    q1 = axis_angle_to_quat(p1[3:6])
    qd = axis_angle_to_quat(d[3:6])
    t = p1[0:3] + quat_rotate(q1, d[0:3])
    aa = quat_to_axis_angle(quat_mul(q1, qd))
    return jnp.concatenate([t, aa])


def absolute_to_relative(p1, p2):
    """Relative pose of p2 in frame of p1 (3DSolverBase.h:893)."""
    q1 = axis_angle_to_quat(p1[3:6])
    q2 = axis_angle_to_quat(p2[3:6])
    q1i = quat_conj(q1)
    t = quat_rotate(q1i, p2[0:3] - p1[0:3])
    aa = quat_to_axis_angle(quat_mul(q1i, q2))
    return jnp.concatenate([t, aa])


def pose_inverse(p):
    """3DSolverBase.h Pose_Inverse."""
    q = quat_conj(axis_angle_to_quat(p[3:6]))
    t = -quat_rotate(q, p[0:3])
    return jnp.concatenate([t, quat_to_axis_angle(q)])


def plus(state, delta):
    """SE(3) vertex retraction = right composition with the delta pose
    (CVertexPose3D::Operator_Plus, SE3_Types.h:45)."""
    return relative_to_absolute(state, delta)


def pose_pose_error(x0, x1, meas):
    """SE(3) odometry/loop edge residual (CEdgePose3D, SE3_Types.h:265-286):
    translation part z_t - h_t; rotation part aa(q_z * q_h^-1)."""
    h = absolute_to_relative(x0, x1)
    dt = meas[0:3] - h[0:3]
    qz = axis_angle_to_quat(meas[3:6])
    qh = axis_angle_to_quat(h[3:6])
    daa = quat_to_axis_angle(quat_mul(qz, quat_conj(qh)))
    return jnp.concatenate([dt, daa])


def pose_landmark_error(x0, lm, meas):
    """SE(3) pose->landmark XYZ edge (CEdgePoseLandmark3D, SE3_Types.h:443):
    expectation is the landmark in the pose frame."""
    q = axis_angle_to_quat(x0[3:6])
    h = quat_rotate(quat_conj(q), lm - x0[0:3])
    return meas - h


def rpy_to_rot(r):
    """The parser's RPY->rotation convention (ParsePrimitives.h:520-531):
    fields (p[3], p[4], p[5]) with cos_x=cos(p5), cos_y=cos(p4), cos_z=cos(p3)."""
    cx, sx = jnp.cos(r[2]), jnp.sin(r[2])
    cy, sy = jnp.cos(r[1]), jnp.sin(r[1])
    cz, sz = jnp.cos(r[0]), jnp.sin(r[0])
    return jnp.stack(
        [
            jnp.stack([cy * cx, -cz * sx + sz * sy * cx, sz * sx + cz * sy * cx]),
            jnp.stack([cy * sx, cz * cx + sz * sy * sx, -sz * cx + cz * sy * sx]),
            jnp.stack([-sy, sz * cy, cz * cy]),
        ]
    )
