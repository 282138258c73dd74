"""Sim(3) problem types (reference: include/slam/Sim3_Types.h, the ACRA'15
parameterization study).

Vertex types: ``sim3`` (7 log-coordinates), ``camsim3`` (7 log + 5 stored
intrinsics), ``invdepth`` (3, (x/z, y/z, 1/z) with XYZ-space deltas), plus
the shared ``xyz`` landmark from models/ba.

Edge family per the reference's {XYZ, InvDepth} x {global, local-self,
local-other} grid (Sim3_Types.h:247-3598):
  * _G: landmark in world coordinates, observed by a camera
  * _LS: landmark stored in the OWNING camera's local frame, observed by it
    (a unary edge on the landmark; the camera is fixed by construction)
  * _LO: landmark local to an owner camera, observed by another
Plus the Sim(3) relative pose edge (pose-graph in Sim(3)), the
SE(3)-pose <-> Sim(3)-camera edge (CEdgePoseCamSim3), and the InvDist
(1-DoF inverse distance along a stored ray) parameterization (LS/LO).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from slampp_tpu.geometry import se3, sim3
from slampp_tpu.graph.types import (
    EdgeType,
    VertexType,
    register_edge_type,
    register_vertex_type,
)

SIM3 = register_vertex_type(VertexType(name="sim3", dim=7, retract=sim3.plus))


def _camsim3_retract(state, delta):
    return jnp.concatenate([sim3.plus(state[0:7], delta), state[7:12]])


CAMSIM3 = register_vertex_type(
    VertexType(name="camsim3", dim=7, retract=_camsim3_retract, _state_dim=12)
)

INVDEPTH = register_vertex_type(
    VertexType(name="invdepth", dim=3, retract=sim3.invdepth_plus, is_landmark=True)
)


def _invdist_retract(state, delta):
    """CVertexInvDist (Sim3_Types.h:102): 1-DoF inverse distance q along a
    stored unit observation ray (state = (q, rx, ry, rz), only q optimized;
    Operator_Plus adds the delta to q only, :161-171)."""
    return state.at[0].add(delta[0])


INVDIST = register_vertex_type(
    VertexType(
        name="invdist", dim=1, retract=_invdist_retract, is_landmark=True, _state_dim=4
    )
)


def invdist_to_xyz(state):
    """Position (in the owner frame) of an inverse-distance landmark:
    ray / q (v_InvDist_to_XYZ analog)."""
    return state[1:4] / state[0]


def _p2c_xyz_g(xs, z):
    """CEdgeP2C_XYZ_Sim3_G: (xyz world landmark, camsim3) reprojection."""
    X, cam = xs
    return z - sim3.project_p2c_xyz(cam[0:7], cam[7:12], X)


def _p2c_invdepth_g(xs, z):
    """CEdgeP2C_InvDepth_Sim3_G: inverse-depth world landmark."""
    v, cam = xs
    return z - sim3.project_p2c_xyz(cam[0:7], cam[7:12], sim3.invdepth_to_xyz(v))


def _p2c_xyz_ls(xs, z):
    """CEdgeLandmark_XYZ_Sim3_LS: landmark in the observing camera's own
    frame (unary; projection needs intrinsics only).  The measurement vector
    carries (u, v, fx, fy, cx, cy, k) — observation + the owner intrinsics —
    since unary edges have no camera vertex."""
    (x_local,) = xs
    return z[0:2] - sim3.project_p2c_local_xyz(x_local, z[2:7])


def _p2c_invdepth_ls(xs, z):
    (v,) = xs
    return z[0:2] - sim3.project_p2c_local_xyz(sim3.invdepth_to_xyz(v), z[2:7])


def _p2c_xyz_lo(xs, z):
    """CEdgeP2C_XYZ_Sim3_LO: landmark local to its owner camera, observed by
    another camera (ternary: landmark, owner cam, observing cam)."""
    x_local, owner, obs = xs
    x_obs = sim3.local_to_other(x_local, owner[0:7], obs[0:7])
    return z - sim3.project_p2c_local_xyz(x_obs, obs[7:12])


def _p2c_invdepth_lo(xs, z):
    v, owner, obs = xs
    x_obs = sim3.local_to_other(sim3.invdepth_to_xyz(v), owner[0:7], obs[0:7])
    return z - sim3.project_p2c_local_xyz(x_obs, obs[7:12])


def _p2c_invdist_ls(xs, z):
    """CEdgeP2C_InvDist_Sim3_LS: inverse-distance landmark in its owning
    camera's frame (unary; measurement = (u, v, intrinsics...))."""
    (v,) = xs
    return z[0:2] - sim3.project_p2c_local_xyz(invdist_to_xyz(v), z[2:7])


def _p2c_invdist_lo(xs, z):
    """CEdgeP2C_InvDist_Sim3_LO: observed from another camera (ternary)."""
    v, owner, obs = xs
    x_obs = sim3.local_to_other(invdist_to_xyz(v), owner[0:7], obs[0:7])
    return z - sim3.project_p2c_local_xyz(x_obs, obs[7:12])


def _sim3_pose_pose(xs, z):
    """Relative Sim(3) constraint: r = z (-) log(exp(x0)^-1 exp(x1))."""
    h = sim3.absolute_to_relative(xs[0], xs[1])
    # manifold difference of the two log vectors (right-minus)
    return sim3.sim3_log(
        sim3.compose_tRs(sim3.inverse_tRs(sim3.sim3_exp(h)), sim3.sim3_exp(z))
    )


def _pose_cam_sim3(xs, z):
    """CEdgePoseCamSim3: ties an SE(3) pose vertex to a Sim(3) camera
    (scale observed as 1); residual is the 7-dof sim(3) log difference."""
    pose_se3, cam = xs
    x0 = jnp.concatenate([pose_se3, jnp.zeros(1)])  # SE(3) as sim(3), sigma=0
    h = sim3.absolute_to_relative(x0, cam[0:7])
    return sim3.sim3_log(
        sim3.compose_tRs(sim3.inverse_tRs(sim3.sim3_exp(h)), sim3.sim3_exp(z))
    )


EDGE_P2C_XYZ_SIM3_G = register_edge_type(
    EdgeType(
        name="edge_p2c_xyz_sim3_g",
        vertex_types=("xyz", "camsim3"),
        res_dim=2,
        meas_dim=2,
        error_fn=_p2c_xyz_g,
    )
)

EDGE_P2C_INVDEPTH_SIM3_G = register_edge_type(
    EdgeType(
        name="edge_p2c_invdepth_sim3_g",
        vertex_types=("invdepth", "camsim3"),
        res_dim=2,
        meas_dim=2,
        error_fn=_p2c_invdepth_g,
    )
)

EDGE_P2C_XYZ_SIM3_LS = register_edge_type(
    EdgeType(
        name="edge_p2c_xyz_sim3_ls",
        vertex_types=("xyz",),
        res_dim=2,
        meas_dim=7,
        error_fn=_p2c_xyz_ls,
    )
)

EDGE_P2C_INVDEPTH_SIM3_LS = register_edge_type(
    EdgeType(
        name="edge_p2c_invdepth_sim3_ls",
        vertex_types=("invdepth",),
        res_dim=2,
        meas_dim=7,
        error_fn=_p2c_invdepth_ls,
    )
)

EDGE_P2C_XYZ_SIM3_LO = register_edge_type(
    EdgeType(
        name="edge_p2c_xyz_sim3_lo",
        vertex_types=("xyz", "camsim3", "camsim3"),
        res_dim=2,
        meas_dim=2,
        error_fn=_p2c_xyz_lo,
    )
)

EDGE_P2C_INVDEPTH_SIM3_LO = register_edge_type(
    EdgeType(
        name="edge_p2c_invdepth_sim3_lo",
        vertex_types=("invdepth", "camsim3", "camsim3"),
        res_dim=2,
        meas_dim=2,
        error_fn=_p2c_invdepth_lo,
    )
)

EDGE_P2C_INVDIST_SIM3_LS = register_edge_type(
    EdgeType(
        name="edge_p2c_invdist_sim3_ls",
        vertex_types=("invdist",),
        res_dim=2,
        meas_dim=7,
        error_fn=_p2c_invdist_ls,
    )
)

EDGE_P2C_INVDIST_SIM3_LO = register_edge_type(
    EdgeType(
        name="edge_p2c_invdist_sim3_lo",
        vertex_types=("invdist", "camsim3", "camsim3"),
        res_dim=2,
        meas_dim=2,
        error_fn=_p2c_invdist_lo,
    )
)

EDGE_POSE_SIM3 = register_edge_type(
    EdgeType(
        name="edge_pose_sim3",
        vertex_types=("sim3", "sim3"),
        res_dim=7,
        meas_dim=7,
        error_fn=_sim3_pose_pose,
    )
)

EDGE_POSE_CAM_SIM3 = register_edge_type(
    EdgeType(
        name="edge_pose_cam_sim3",
        vertex_types=("pose3d", "camsim3"),
        res_dim=7,
        meas_dim=7,
        error_fn=_pose_cam_sim3,
    )
)


# ---------------------------------------------------------------------------
# Angle-error variants (the second residual axis of the ACRA'15 study:
# Sim3_Types.h "angle-err" edge grid).  Same vertex grids as the reprojection
# edges above; the residual is the 2-DoF tangent-plane angular deviation
# between the observed ray (back-projected pixel) and the predicted landmark
# direction, measured on the view sphere.
# ---------------------------------------------------------------------------


def _angle_err_local(x_local, uv, intrinsics):
    ray = sim3.backproject_ray(uv, intrinsics)
    return sim3.tangent_angle_error(ray, x_local)


def _p2c_xyz_sim3_g_angle(xs, z):
    """CEdgeP2C_XYZ_Sim3_G AngleErr: world landmark vs camsim3, angular."""
    X, cam = xs
    return _angle_err_local(sim3.world_to_local(cam[0:7], X), z, cam[7:12])


def _p2c_invdepth_sim3_g_angle(xs, z):
    v, cam = xs
    return _angle_err_local(
        sim3.world_to_local(cam[0:7], sim3.invdepth_to_xyz(v)), z, cam[7:12]
    )


def _p2c_xyz_sim3_ls_angle(xs, z):
    """Self-owned local landmark (unary); z = (u, v, fx, fy, cx, cy, k)."""
    (x_local,) = xs
    return _angle_err_local(x_local, z[0:2], z[2:7])


def _p2c_invdepth_sim3_ls_angle(xs, z):
    (v,) = xs
    return _angle_err_local(sim3.invdepth_to_xyz(v), z[0:2], z[2:7])


def _p2c_invdist_sim3_ls_angle(xs, z):
    (v,) = xs
    return _angle_err_local(invdist_to_xyz(v), z[0:2], z[2:7])


def _p2c_xyz_sim3_lo_angle(xs, z):
    x_local, owner, obs = xs
    x_obs = sim3.local_to_other(x_local, owner[0:7], obs[0:7])
    return _angle_err_local(x_obs, z, obs[7:12])


def _p2c_invdepth_sim3_lo_angle(xs, z):
    v, owner, obs = xs
    x_obs = sim3.local_to_other(sim3.invdepth_to_xyz(v), owner[0:7], obs[0:7])
    return _angle_err_local(x_obs, z, obs[7:12])


def _p2c_invdist_sim3_lo_angle(xs, z):
    v, owner, obs = xs
    x_obs = sim3.local_to_other(invdist_to_xyz(v), owner[0:7], obs[0:7])
    return _angle_err_local(x_obs, z, obs[7:12])


EDGE_P2C_XYZ_SIM3_G_ANGLE = register_edge_type(
    EdgeType(
        name="edge_p2c_xyz_sim3_g_angle",
        vertex_types=("xyz", "camsim3"),
        res_dim=2,
        meas_dim=2,
        error_fn=_p2c_xyz_sim3_g_angle,
    )
)

EDGE_P2C_INVDEPTH_SIM3_G_ANGLE = register_edge_type(
    EdgeType(
        name="edge_p2c_invdepth_sim3_g_angle",
        vertex_types=("invdepth", "camsim3"),
        res_dim=2,
        meas_dim=2,
        error_fn=_p2c_invdepth_sim3_g_angle,
    )
)

EDGE_P2C_XYZ_SIM3_LS_ANGLE = register_edge_type(
    EdgeType(
        name="edge_p2c_xyz_sim3_ls_angle",
        vertex_types=("xyz",),
        res_dim=2,
        meas_dim=7,
        error_fn=_p2c_xyz_sim3_ls_angle,
    )
)

EDGE_P2C_INVDEPTH_SIM3_LS_ANGLE = register_edge_type(
    EdgeType(
        name="edge_p2c_invdepth_sim3_ls_angle",
        vertex_types=("invdepth",),
        res_dim=2,
        meas_dim=7,
        error_fn=_p2c_invdepth_sim3_ls_angle,
    )
)

EDGE_P2C_INVDIST_SIM3_LS_ANGLE = register_edge_type(
    EdgeType(
        name="edge_p2c_invdist_sim3_ls_angle",
        vertex_types=("invdist",),
        res_dim=2,
        meas_dim=7,
        error_fn=_p2c_invdist_sim3_ls_angle,
    )
)

EDGE_P2C_XYZ_SIM3_LO_ANGLE = register_edge_type(
    EdgeType(
        name="edge_p2c_xyz_sim3_lo_angle",
        vertex_types=("xyz", "camsim3", "camsim3"),
        res_dim=2,
        meas_dim=2,
        error_fn=_p2c_xyz_sim3_lo_angle,
    )
)

EDGE_P2C_INVDEPTH_SIM3_LO_ANGLE = register_edge_type(
    EdgeType(
        name="edge_p2c_invdepth_sim3_lo_angle",
        vertex_types=("invdepth", "camsim3", "camsim3"),
        res_dim=2,
        meas_dim=2,
        error_fn=_p2c_invdepth_sim3_lo_angle,
    )
)

EDGE_P2C_INVDIST_SIM3_LO_ANGLE = register_edge_type(
    EdgeType(
        name="edge_p2c_invdist_sim3_lo_angle",
        vertex_types=("invdist", "camsim3", "camsim3"),
        res_dim=2,
        meas_dim=2,
        error_fn=_p2c_invdist_sim3_lo_angle,
    )
)


def embed_ba_system_sim3(ba_system):
    """Re-express a parsed SE(3) mono-BA system in Sim(3) — the embedding the
    reference's 3DV'17 app performs on standard BA datasets
    (src/incremental_ba_3dv/Main.cpp:236-259: SE(3) camera -> TSim3 with
    scale 1 -> Invert -> log; landmarks stay global XYZ; observations become
    CEdgeP2C_XYZ_Sim3_G).  Returns a new GraphSystem over camsim3/xyz.
    """
    import numpy as np

    import jax.numpy as jnp

    from slampp_tpu.graph.system import GraphSystem

    out = GraphSystem()
    for vid in ba_system._vorder:
        t, _ = ba_system.vertex_index[vid]
        st = ba_system.vertex_state(vid)
        if t == "cam":
            # our parsed cam state is w2c (t, aa) + intrinsics; the Sim(3)
            # camera is camera-to-world log coordinates (project_p2c_xyz)
            w2c = jnp.concatenate([jnp.asarray(st[0:6]), jnp.ones(1)])
            c2w = sim3.inverse_tRs(w2c)
            log = np.asarray(sim3.sim3_log(c2w))
            out.add_vertex(
                "camsim3", vid, np.concatenate([log, st[6:11]]),
                const=ba_system._vconst.get(vid, False),
            )
        elif t == "xyz":
            out.add_vertex("xyz", vid, st,
                           const=ba_system._vconst.get(vid, False))
        else:
            raise ValueError(f"embed_ba_system_sim3: unsupported type {t}")
    rec = ba_system._edges.get("edge_p2c", {"vids": []})
    for e, vids in enumerate(rec["vids"]):
        out.add_edge(
            "edge_p2c_xyz_sim3_g", tuple(vids), rec["meas"][e],
            rec["sigma_inv"][e],
        )
    return out
