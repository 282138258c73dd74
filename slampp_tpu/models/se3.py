"""SE(3) problem types (reference: include/slam/SE3_Types.h)."""

from __future__ import annotations

import numpy as np

from slampp_tpu.geometry import se3
from slampp_tpu.graph.types import (
    EdgeType,
    VertexType,
    register_edge_type,
    register_vertex_type,
)

POSE3D = register_vertex_type(
    VertexType(
        name="pose3d", dim=6, retract=se3.plus,
        # boxminus inverse of plus: plus(ref, absolute_to_relative(ref, cur)) == cur
        local_diff=lambda cur, ref: se3.absolute_to_relative(ref, cur),
    )
)

LANDMARK3D = register_vertex_type(
    VertexType(name="landmark3d", dim=3, retract=lambda x, d: x + d, is_landmark=True)
)

EDGE_POSE3D = register_edge_type(
    EdgeType(
        name="edge_pose3d",
        vertex_types=("pose3d", "pose3d"),
        res_dim=6,
        meas_dim=6,
        error_fn=lambda xs, z: se3.pose_pose_error(xs[0], xs[1], z),
    )
)

EDGE_POSE_LANDMARK3D = register_edge_type(
    EdgeType(
        name="edge_pose_landmark3d",
        vertex_types=("pose3d", "landmark3d"),
        res_dim=3,
        meas_dim=3,
        error_fn=lambda xs, z: se3.pose_landmark_error(xs[0], xs[1], z),
    )
)


# NumPy mirrors of the composition math for host-side vertex initialization
# (reference CRelative_to_Absolute_XYZ_Initializer, SE3_Types.h:130).
def _np_aa_to_quat(aa):
    angle = np.linalg.norm(aa)
    if angle < 1e-12:
        q = np.array([np.cos(angle * 0.5), *(aa * 0.5)])
    else:
        c = np.cos(angle * 0.5)
        f = np.sin(angle * 0.5) / angle
        if c < 0:
            c, f = -c, -f
        q = np.array([c, *(aa * f)])
    return q / np.linalg.norm(q)


def _np_quat_mul(q1, q2):
    w1, x1, y1, z1 = q1
    w2, x2, y2, z2 = q2
    return np.array(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


def _np_quat_conj(q):
    return np.array([q[0], -q[1], -q[2], -q[3]])


def _np_quat_rotate(q, v):
    uv = 2.0 * np.cross(q[1:], v)
    return v + q[0] * uv + np.cross(q[1:], uv)


def _np_quat_to_aa(q):
    w, v = q[0], q[1:]
    vn = np.linalg.norm(v)
    if vn < 1e-12:
        return v * 2.0
    half = np.copysign(np.arctan2(vn, abs(w)), w if w != 0 else 1.0)
    return v * (2.0 * half / vn)


def np_relative_to_absolute(p1, d):
    q1 = _np_aa_to_quat(p1[3:6])
    qd = _np_aa_to_quat(d[3:6])
    t = p1[0:3] + _np_quat_rotate(q1, d[0:3])
    return np.concatenate([t, _np_quat_to_aa(_np_quat_mul(q1, qd))])


def init_pose3d_from_pose(known, meas):
    p1 = np.asarray(known.get(0, np.zeros(6)))
    return np_relative_to_absolute(p1, np.asarray(meas)[:6])


def init_landmark3d(known, meas):
    p1 = np.asarray(known.get(0, np.zeros(6)))
    q1 = _np_aa_to_quat(p1[3:6])
    return p1[0:3] + _np_quat_rotate(q1, np.asarray(meas)[:3])


POSE_POSE3D_INITIALIZERS = (None, init_pose3d_from_pose)
POSE_LANDMARK3D_INITIALIZERS = (None, init_landmark3d)
