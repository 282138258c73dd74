"""Sim(3) math as pure JAX functions.

Capability parity with ``CSim3Jacobians`` (include/slam/Sim3SolverBase.h,
4,117 LoC): exp/log maps between sim(3) algebra vectors (u(3), omega(3),
sigma) and the tRs representation (translation, axis-angle rotation, linear
scale) — the TooN-style convention documented in slam_app/Main.h:731-809
(verified against the worked example there in tests) — plus composition,
inversion, point transforms, inverse-depth conversions, and the Sim(3)
camera projections (Project_P2C_XYZ :630 family).

Vertex states are LOG coordinates (as in the reference's CVertexSim3 /
CVertexCamSim3); retraction is the post-multiplicative update
log(exp(x) * exp(delta)) (Sim3_Types.h:2106).
"""

from __future__ import annotations

import jax.numpy as jnp

from slampp_tpu.geometry import se3


def _sinc_coeffs(sq):
    """(sin t)/t and (1-cos t)/t^2 with Taylor guards (autodiff-safe)."""
    small = sq < 1e-16
    t = jnp.where(small, 1.0, sq)
    ang = jnp.sqrt(t)
    sinc = jnp.where(small, 1.0 - sq / 6.0, jnp.sin(ang) / ang)
    cosc = jnp.where(small, 0.5 - sq / 24.0, (1.0 - jnp.cos(ang)) / t)
    return sinc, cosc


def _W_matrix(omega, sigma):
    """The sim(3) 'V' matrix: t = W u in exp; closed form with limits.

    W = C I + A K + B K^2, K = skew(omega) (unnormalized); coefficients per
    the standard sim(3) exponential derivation, with Taylor-guarded limits
    for small sigma and/or small theta (autodiff-safe four-way select):

      general:  C = (s-1)/sigma
                A = (sigma s sin t + (1 - s cos t) t) / (t (sigma^2 + t^2))
                B = (C - ((s cos t - 1) sigma + s t sin t)/(sigma^2+t^2))/t^2
      sigma->0: C = 1, A = (1-cos t)/t^2, B = (t - sin t)/t^3
      theta->0: C = (s-1)/sigma, A = (sigma s + 1 - s)/sigma^2,
                B = (2(s-1) - sigma s (2 - sigma)) / (2 sigma^3)
      both->0:  C = 1, A = 1/2, B = 1/6
    """
    sq = jnp.sum(omega * omega)
    small_th = sq < 1e-16
    tsafe = jnp.sqrt(jnp.where(small_th, 1.0, sq))
    s = jnp.exp(sigma)
    K = se3._skew(omega)

    small_sig = jnp.abs(sigma) < 1e-8
    ssafe = jnp.where(small_sig, 1.0, sigma)

    C = jnp.where(small_sig, 1.0 + sigma / 2.0 + sigma * sigma / 6.0, (s - 1.0) / ssafe)

    sinth, costh = jnp.sin(tsafe), jnp.cos(tsafe)
    denom = ssafe * ssafe + jnp.where(small_th, 0.0, sq)
    sq_safe = jnp.where(small_th, 1.0, sq)

    A_gen = (ssafe * s * sinth + (1.0 - s * costh) * tsafe) / (tsafe * denom)
    A_sig0 = (1.0 - costh) / sq_safe
    A_th0 = (ssafe * s + 1.0 - s) / (ssafe * ssafe)
    A = jnp.where(
        small_th,
        jnp.where(small_sig, 0.5, A_th0),
        jnp.where(small_sig, A_sig0, A_gen),
    )

    B_gen = (C - ((s * costh - 1.0) * ssafe + s * tsafe * sinth) / denom) / sq_safe
    B_sig0 = (tsafe - sinth) / (sq_safe * tsafe)
    B_th0 = (2.0 * (s - 1.0) - ssafe * s * (2.0 - ssafe)) / (2.0 * ssafe**3)
    B = jnp.where(
        small_th,
        jnp.where(small_sig, 1.0 / 6.0, B_th0),
        jnp.where(small_sig, B_sig0, B_gen),
    )
    return C * jnp.eye(3) + A * K + B * (K @ K)


def sim3_exp(v):
    """exp: sim(3) vector (u, omega, sigma) -> tRs (t, aa, s)."""
    u, omega, sigma = v[0:3], v[3:6], v[6]
    W = _W_matrix(omega, sigma)
    t = W @ u
    return jnp.concatenate([t, omega, jnp.exp(sigma)[None]])


def sim3_log(tRs):
    """log: tRs -> sim(3) vector; inverse of :func:`sim3_exp`."""
    t, omega, s = tRs[0:3], tRs[3:6], tRs[6]
    sigma = jnp.log(s)
    W = _W_matrix(omega, sigma)
    u = jnp.linalg.solve(W, t)
    return jnp.concatenate([u, omega, sigma[None]])


def compose_tRs(a, b):
    """tRs composition: (t, R, s)(x) = s R x + t; a then b (a*b)."""
    Ra = se3.axis_angle_to_rot(a[3:6])
    t = a[0:3] + a[6] * (Ra @ b[0:3])
    qa = se3.axis_angle_to_quat(a[3:6])
    qb = se3.axis_angle_to_quat(b[3:6])
    aa = se3.quat_to_axis_angle(se3.quat_mul(qa, qb))
    return jnp.concatenate([t, aa, (a[6] * b[6])[None]])


def inverse_tRs(a):
    q = se3.quat_conj(se3.axis_angle_to_quat(a[3:6]))
    s_inv = 1.0 / a[6]
    t = -s_inv * se3.quat_rotate(q, a[0:3])
    return jnp.concatenate([t, se3.quat_to_axis_angle(q), s_inv[None]])


def transform_tRs(a, X):
    """Apply the similarity: s R X + t."""
    q = se3.axis_angle_to_quat(a[3:6])
    return a[6] * se3.quat_rotate(q, X) + a[0:3]


def inv_transform_tRs(a, X):
    """Apply the inverse similarity (v_InvTransform): R^T (X - t)/s."""
    q = se3.quat_conj(se3.axis_angle_to_quat(a[3:6]))
    return se3.quat_rotate(q, X - a[0:3]) / a[6]


def plus(state, delta):
    """Post-multiplicative Sim(3) retraction on log-coordinate states
    (CVertexSim3::Operator_Plus, Sim3_Types.h:2106)."""
    return sim3_log(compose_tRs(sim3_exp(state), sim3_exp(delta)))


def absolute_to_relative(x1, x2):
    """log(exp(x1)^-1 * exp(x2)) (Sim3SolverBase.h:345)."""
    return sim3_log(compose_tRs(inverse_tRs(sim3_exp(x1)), sim3_exp(x2)))


def relative_to_absolute(x1, d):
    """log(exp(x1) * exp(d)) (Sim3SolverBase.h:435)."""
    return sim3_log(compose_tRs(sim3_exp(x1), sim3_exp(d)))


# ------------------------------------------------------------------ inv depth
def invdepth_to_xyz(v):
    """(x/z, y/z, 1/z) -> XYZ (v_InvDepth_to_XYZ, Sim3SolverBase.h:529)."""
    depth = 1.0 / v[2]
    return jnp.stack([v[0] * depth, v[1] * depth, depth])


def xyz_to_invdepth(X):
    q = 1.0 / X[2]
    return jnp.stack([X[0] * q, X[1] * q, q])


def invdepth_plus(state, delta):
    """Inverse-depth retraction with the delta in XYZ space
    (Relative_to_Absolute_InvDepth_Epsilon, used by CVertexInvDepth)."""
    return xyz_to_invdepth(invdepth_to_xyz(state) + delta)


# ----------------------------------------------------------------- projection
def project_p2c_xyz(cam_log, intrinsics, X):
    """Project a GLOBAL XYZ point into a Sim(3) camera (Project_P2C_XYZ,
    Sim3SolverBase.h:630).  The camera pose is camera-to-world; note the
    mono distortion normalization k / (0.5 * fx * fy)."""
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    k = intrinsics[4] / (0.5 * (fx * fy))
    cam = sim3_exp(cam_log)
    x = inv_transform_tRs(cam, X)
    iz = 1.0 / x[2]
    u = fx * x[0] * iz + cx
    v = fy * x[1] * iz + cy
    r2 = (u - cx) ** 2 + (v - cy) ** 2
    d = 1.0 + r2 * k
    return jnp.stack([cx + d * (u - cx), cy + d * (v - cy)])


def project_p2c_local_xyz(x_local, intrinsics):
    """Project a CAMERA-LOCAL XYZ point (Project_P2C_LocalXYZ_Self, :702)."""
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    k = intrinsics[4] / (0.5 * (fx * fy))
    iz = 1.0 / x_local[2]
    u = fx * x_local[0] * iz + cx
    v = fy * x_local[1] * iz + cy
    r2 = (u - cx) ** 2 + (v - cy) ** 2
    d = 1.0 + r2 * k
    return jnp.stack([cx + d * (u - cx), cy + d * (v - cy)])


def local_to_other(x_local_owner, owner_cam_log, obs_cam_log):
    """Move a point from the owner camera's local frame to the observing
    camera's local frame (the LocalXYZ_Other family)."""
    owner = sim3_exp(owner_cam_log)
    obs = sim3_exp(obs_cam_log)
    Xw = transform_tRs(owner, x_local_owner)
    return inv_transform_tRs(obs, Xw)


def world_to_local(cam_log, X):
    """World point -> camera-local frame (first half of project_p2c_xyz)."""
    return inv_transform_tRs(sim3_exp(cam_log), X)


def backproject_ray(uv, intrinsics):
    """Unit observation ray in the camera frame from a pixel measurement.

    Inverts the radial-distortion model of project_p2c_local_xyz with one
    fixed-point step (the distortion is mild by construction in the reference
    datasets; the angle-error study needs direction parity, not sub-pixel
    undistortion).
    """
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    k = intrinsics[4] / (0.5 * (fx * fy))
    du = uv[0] - cx
    dv = uv[1] - cy
    r2 = du * du + dv * dv
    d = 1.0 + k * r2  # fixed-point undistort: r2 evaluated at the pixel
    x = (du / d) / fx
    y = (dv / d) / fy
    ray = jnp.stack([x, y, jnp.ones_like(x)])
    return ray / jnp.linalg.norm(ray)


def tangent_angle_error(ray_obs, x_local):
    """2-DoF angular residual between the observed unit ray and the direction
    to a camera-local point (the AngleErr residual family of Sim3_Types.h —
    error measured on the view sphere instead of the image plane).

    Components are the direction's projections onto an orthonormal tangent
    basis at the observed ray (= sin of the angular deviations); zero iff the
    directions coincide on the forward hemisphere.
    """
    d = x_local / jnp.maximum(jnp.linalg.norm(x_local), 1e-300)
    # deterministic tangent basis, branch-free for jit
    pick_y = jnp.abs(ray_obs[0]) > 0.9
    a = jnp.where(pick_y, jnp.array([0.0, 1.0, 0.0]), jnp.array([1.0, 0.0, 0.0]))
    e1 = jnp.cross(ray_obs, a)
    e1 = e1 / jnp.maximum(jnp.linalg.norm(e1), 1e-300)
    e2 = jnp.cross(ray_obs, e1)
    return jnp.stack([jnp.dot(d, e1), jnp.dot(d, e2)])
