"""SE(2) problem types (reference: include/slam/SE2_Types.h).

Vertex types: pose2d (x, y, theta), landmark2d (x, y).
Edge types: pose-pose odometry/loop edges, pose-landmark XY and range-bearing.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from slampp_tpu.geometry import se2
from slampp_tpu.graph.types import (
    EdgeType,
    VertexType,
    register_edge_type,
    register_vertex_type,
)

def _pose2d_local_diff(cur, ref):
    d = cur - ref
    return d.at[2].set(se2.clamp_angular_error_2pi(d[2]))


POSE2D = register_vertex_type(
    VertexType(name="pose2d", dim=3, retract=se2.plus, local_diff=_pose2d_local_diff)
)

LANDMARK2D = register_vertex_type(
    VertexType(
        name="landmark2d",
        dim=2,
        retract=lambda x, d: x + d,  # CVertexLandmark2D::Operator_Plus (plain add)
        is_landmark=True,
    )
)

EDGE_POSE2D = register_edge_type(
    EdgeType(
        name="edge_pose2d",
        vertex_types=("pose2d", "pose2d"),
        res_dim=3,
        meas_dim=3,
        error_fn=lambda xs, z: se2.pose_pose_error(xs[0], xs[1], z),
    )
)

EDGE_POSE_LANDMARK2D_XY = register_edge_type(
    EdgeType(
        name="edge_pose_landmark2d_xy",
        vertex_types=("pose2d", "landmark2d"),
        res_dim=2,
        meas_dim=2,
        error_fn=lambda xs, z: se2.pose_landmark_xy_error(xs[0], xs[1], z),
    )
)

EDGE_POSE_LANDMARK2D_RB = register_edge_type(
    EdgeType(
        name="edge_pose_landmark2d_rb",
        vertex_types=("pose2d", "landmark2d"),
        res_dim=2,
        meas_dim=2,
        error_fn=lambda xs, z: se2.pose_landmark_rb_error(xs[0], xs[1], z),
    )
)


# ---------------------------------------------------------------- initializers
# Reference: CRelative_to_Absolute_XYT_Initializer (SE2_Types.h:184) — the
# endpoint of an odometry edge is initialized by composing the origin pose with
# the measurement; missing origin poses initialize to zero.

def _np_rel_to_abs(p1, d):
    c, s = np.cos(p1[2]), np.sin(p1[2])
    a = np.fmod(p1[2] + d[2], 2 * np.pi)
    return np.array([p1[0] + c * d[0] - s * d[1], p1[1] + s * d[0] + c * d[1], a])


def init_pose_from_pose(known, meas):
    p1 = known.get(0, np.zeros(3))
    return _np_rel_to_abs(np.asarray(p1), np.asarray(meas)[:3])


def init_landmark_xy(known, meas):
    p1 = np.asarray(known.get(0, np.zeros(3)))
    c, s = np.cos(p1[2]), np.sin(p1[2])
    mx, my = meas[0], meas[1]
    return np.array([p1[0] + c * mx - s * my, p1[1] + s * mx + c * my])


def init_landmark_rb(known, meas):
    p1 = np.asarray(known.get(0, np.zeros(3)))
    rng, brg = meas[0], meas[1]
    a = p1[2] + brg
    return np.array([p1[0] + rng * np.cos(a), p1[1] + rng * np.sin(a)])


POSE_POSE_INITIALIZERS = (None, init_pose_from_pose)
POSE_LANDMARK_XY_INITIALIZERS = (None, init_landmark_xy)
POSE_LANDMARK_RB_INITIALIZERS = (None, init_landmark_rb)
