"""Bundle-adjustment problem types (reference: include/slam/BA_Types.h).

Vertex types:
  * ``xyz``     — 3D point landmark (CVertexXYZ, BA_Types.h:355)
  * ``cam``     — monocular camera: 6-DoF world-to-camera pose + 5 stored
                  intrinsics (fx fy cx cy k) (CVertexCam, BA_Types.h:54)
  * ``intrinsics`` — optimizable 5-DoF intrinsics (CVertexIntrinsics, :141)
  * ``scam``    — stereo camera: 6-DoF pose + (fx fy cx cy baseline)
                  (CVertexSCam, :211)

Edge slot order follows the dataset tokens: EDGE_PROJECT_P2MC is
(point, camera) (ParsePrimitives.h:1134+).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from slampp_tpu.geometry import camera as cam_geo
from slampp_tpu.geometry import se3
from slampp_tpu.graph.types import (
    EdgeType,
    VertexType,
    register_edge_type,
    register_vertex_type,
)

XYZ = register_vertex_type(
    VertexType(name="xyz", dim=3, retract=lambda x, d: x + d, is_landmark=True)
)


def _cam_retract(state, delta):
    """Pose part composes like SE(3) (CVertexCam::Operator_Plus keeps
    intrinsics constant, BA_Types.h:54-140)."""
    return jnp.concatenate([se3.plus(state[0:6], delta), state[6:11]])


CAM = register_vertex_type(
    VertexType(name="cam", dim=6, retract=_cam_retract, _state_dim=11)
)

INTRINSICS = register_vertex_type(
    VertexType(name="intrinsics", dim=5, retract=lambda x, d: x + d)
)

SCAM = register_vertex_type(
    VertexType(name="scam", dim=6, retract=_cam_retract, _state_dim=11)
)

EDGE_P2C = register_edge_type(
    EdgeType(
        name="edge_p2c",
        vertex_types=("xyz", "cam"),
        res_dim=2,
        meas_dim=2,
        error_fn=lambda xs, z: cam_geo.p2c_error(xs[0], xs[1], z),
    )
)

EDGE_P2CI = register_edge_type(
    EdgeType(
        name="edge_p2ci",
        vertex_types=("xyz", "cam", "intrinsics"),
        res_dim=2,
        meas_dim=2,
        error_fn=lambda xs, z: cam_geo.p2ci_error(xs[0], xs[1], xs[2], z),
    )
)

EDGE_P2SC = register_edge_type(
    EdgeType(
        name="edge_p2sc",
        vertex_types=("xyz", "scam"),
        res_dim=3,
        meas_dim=3,
        error_fn=lambda xs, z: cam_geo.p2sc_error(xs[0], xs[1], z),
    )
)
