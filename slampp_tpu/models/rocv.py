"""Range-only constant-velocity (ROCV) navigation types and the Spheron
spherical-camera types.

Reference: include/slam/ROCV_Types.h (CVertexPositionVelocity3D :31,
range edge CEdgePosVel_Landmark3D :78, landmark prior :228, const-velocity
process edge :326) and the Spheron problem (CVertexSpheron BA_Types.h:297,
CEdgeSpheronXYZ :996 — a 6-DoF pose observing XYZ landmarks in its local
frame, i.e. spherical stereo).
"""

from __future__ import annotations

import jax.numpy as jnp

from slampp_tpu.geometry import se3
from slampp_tpu.graph.types import (
    EdgeType,
    VertexType,
    register_edge_type,
    register_vertex_type,
)

POSVEL3D = register_vertex_type(
    VertexType(name="posvel3d", dim=6, retract=lambda x, d: x + d)
)

SPHERON = register_vertex_type(
    VertexType(name="spheron", dim=6, retract=se3.plus)
)


def _range_error(xs, z):
    """1-D range residual: z - ||p - l|| (CEdgePosVel_Landmark3D)."""
    pv, lm = xs
    d = pv[0:3] - lm
    return z - jnp.linalg.norm(d)[None]


def _const_velocity_error(xs, z):
    """Constant-velocity process edge: 6-D residual
    (p_cur - (p_prev + v_prev dt), v_cur - v_prev); measurement = dt
    (CEdgeConstVelocity3D, 6D-residual variant)."""
    prev, cur = xs
    dt = z[0]
    pos_res = cur[0:3] - (prev[0:3] + prev[3:6] * dt)
    vel_res = cur[3:6] - prev[3:6]
    return jnp.concatenate([pos_res, vel_res])


def _landmark_prior_error(xs, z):
    """Landmark ANCHOR factor (reference CEdgeLandmark3DPrior,
    ROCV_Types.h:240-320): the error is identically ZERO and the chi2
    contribution is zero — only the information (via the hand-coded
    identity Jacobian below) enters the Hessian, pinning the gauge."""
    (lm,) = xs
    return jnp.zeros(3, lm.dtype)


def _landmark_prior_jacobian(xs, z):
    (lm,) = xs
    return jnp.zeros(3, lm.dtype), (jnp.eye(3, dtype=lm.dtype),)


def _spheron_xyz_error(xs, z):
    """CEdgeSpheronXYZ (BA_Types.h:1127-1150): landmark expressed in the
    spheron pose's local frame, plain z - h."""
    return se3.pose_landmark_error(xs[0], xs[1], z)


EDGE_ROCV_RANGE = register_edge_type(
    EdgeType(
        name="edge_rocv_range",
        vertex_types=("posvel3d", "landmark3d"),
        res_dim=1,
        meas_dim=1,
        error_fn=_range_error,
    )
)

EDGE_ROCV_CONST_VEL = register_edge_type(
    EdgeType(
        name="edge_rocv_const_vel",
        vertex_types=("posvel3d", "posvel3d"),
        res_dim=6,
        meas_dim=1,
        error_fn=_const_velocity_error,
    )
)

EDGE_LANDMARK3D_PRIOR = register_edge_type(
    EdgeType(
        name="edge_landmark3d_prior",
        vertex_types=("landmark3d",),
        res_dim=3,
        meas_dim=3,
        error_fn=_landmark_prior_error,
        jacobian_fn=_landmark_prior_jacobian,
    )
)

EDGE_SPHERON_XYZ = register_edge_type(
    EdgeType(
        name="edge_spheron_xyz",
        vertex_types=("spheron", "landmark3d"),
        res_dim=3,
        meas_dim=3,
        error_fn=_spheron_xyz_error,
    )
)


# --- parse-time vertex auto-initializers (reference CInitialize* policies) ---
import numpy as np


def init_posvel_from_prev(known, meas):
    """Receiver initialized from the previous pos-vel state propagated by dt
    (constant-velocity motion model)."""
    prev = np.asarray(known.get(0, np.zeros(6)))
    dt = float(np.asarray(meas).reshape(-1)[0])
    return np.concatenate([prev[0:3] + prev[3:6] * dt, prev[3:6]])


def init_landmark_null(known, meas):
    return np.zeros(3)


ROCV_CONST_VEL_INITIALIZERS = (None, init_posvel_from_prev)
ROCV_RANGE_INITIALIZERS = (None, init_landmark_null)

# spheron landmark init = pose (+) (meas translation, identity rotation),
# reference CRelative_to_Absolute_XYZ_Initializer (BA_Types.h:1010-1037)
from slampp_tpu.models.se3 import init_landmark3d as _init_lm3d  # noqa: E402

SPHERON_XYZ_INITIALIZERS = (None, _init_lm3d)
