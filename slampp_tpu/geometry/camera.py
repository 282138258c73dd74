"""Camera projection models for bundle adjustment.

Capability parity with ``CBAJacobians`` (include/slam/BASolverBase.h:57):
monocular pinhole with one radial-distortion parameter scaled by the mean
focal length (Project_P2C, BASolverBase.h:260), stereo (Project_P2SC,
:462), and the intrinsics-optimizing variant (Project_P2CI, :690).

Camera pose state is the *world-to-camera* transform (t, axis-angle) — the
parser already inverts the dataset's camera-to-world quaternion
(ParsePrimitives.h:902-915) — so projection is ``x_cam = R X + t``.
Intrinsics are (fx, fy, cx, cy, k) with k stored pre-scaled in the dataset
convention and rescaled by 2/(fx+fy) at projection time.
"""

from __future__ import annotations

import jax.numpy as jnp

from slampp_tpu.geometry import se3


def project_p2c(cam_pose, intrinsics, point):
    """Project a world point into a camera; returns (u, v).

    Reference: CBAJacobians::Project_P2C (BASolverBase.h:260).
    """
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    k = intrinsics[4] / (0.5 * (fx + fy))
    R = se3.axis_angle_to_rot(cam_pose[3:6])
    x = R @ point + cam_pose[0:3]
    iz = 1.0 / x[2]
    u = fx * x[0] * iz + cx
    v = fy * x[1] * iz + cy
    r2 = (u - cx) ** 2 + (v - cy) ** 2
    d = 1.0 + r2 * k
    return jnp.stack([cx + d * (u - cx), cy + d * (v - cy)])


def project_p2sc(cam_pose, intrinsics_baseline, point):
    """Stereo projection: (u, v, u - f*b/depth-style disparity column).

    Reference: CBAJacobians::Project_P2SC (BASolverBase.h:462) — intrinsics
    carry (fx, fy, cx, cy, baseline); residual is 3D (u_left, v, u_right).
    """
    fx, fy, cx, cy, b = (
        intrinsics_baseline[0],
        intrinsics_baseline[1],
        intrinsics_baseline[2],
        intrinsics_baseline[3],
        intrinsics_baseline[4],
    )
    R = se3.axis_angle_to_rot(cam_pose[3:6])
    x = R @ point + cam_pose[0:3]
    iz = 1.0 / x[2]
    u = fx * x[0] * iz + cx
    v = fy * x[1] * iz + cy
    u_right = fx * (x[0] - b) * iz + cx
    return jnp.stack([u, v, u_right])


def p2c_error(point, cam_state, meas):
    """Monocular reprojection residual z - h (CEdgeP2C3D, BA_Types.h:403).

    ``cam_state`` is the 11-wide camera vertex (pose 6 + intrinsics 5);
    slot order in the edge is (point, camera) per EDGE_PROJECT_P2MC.
    """
    return meas - project_p2c(cam_state[0:6], cam_state[6:11], point)


def p2ci_error(point, cam_state, intrinsics, meas):
    """Intrinsics-optimizing residual (CEdgeP2CI3D, BA_Types.h:562) —
    ternary (point, camera-pose, intrinsics)."""
    return meas - project_p2c(cam_state[0:6], intrinsics, point)


def p2sc_error(point, cam_state, meas):
    """Stereo residual (CEdgeP2SC3D, BA_Types.h:705)."""
    return meas - project_p2sc(cam_state[0:6], cam_state[6:11], point)
