"""Distributed bundle adjustment via sharded Schur reduction.

The BASELINE.json north-star capability (absent in the reference, which is
single-process): partition landmarks and their observations across devices;
each shard assembles its local contributions, the reduced camera system is
psum-ed over the mesh (one collective per iteration riding ICI), factored
replicated, and landmarks back-substitute shard-locally:

  per shard:  H_cc += sum_obs J_c^T W J_c        (partial, psum-ed)
              D_l   = sum_obs J_l^T W J_l        (local landmarks)
              U_l   = stacked J_c^T W J_l        (local couplings)
              SC_part = H_cc_part - sum_l U_l D_l^-1 U_l^T
  psum:       SC, rhs_c, chi2
  replicated: dense Cholesky of SC -> dx_c
  local:      dx_l = D_l^-1 (g_l - U_l^T dx_c)

This is SURVEY.md §2.12's mandated design; the same code runs on the virtual
CPU mesh (tests / driver dry-run) and real TPU slices.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from slampp_tpu.geometry import camera as cam_geo
from slampp_tpu.geometry import se3
from slampp_tpu.linear.dense import solve_spd


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BAShards:
    """Landmark-sharded BA problem (leading axis of lm_*/obs_* arrays is
    sharded over the mesh; cam_states is replicated)."""

    cam_states: jnp.ndarray  # (n_c, 11) replicated
    lm_states: jnp.ndarray  # (N_l, 3) sharded
    lm_valid: jnp.ndarray  # (N_l,) sharded
    obs_cam: jnp.ndarray  # (M,) int32 camera index, sharded
    obs_lm: jnp.ndarray  # (M,) int32 LOCAL landmark index within shard
    obs_uv: jnp.ndarray  # (M, 2) sharded
    obs_info: jnp.ndarray  # (M, 2, 2) sharded
    obs_valid: jnp.ndarray  # (M,) sharded
    anchor_cam: int  # gauge anchor camera index (-1 if the anchor is a point)
    anchor_lm: int  # gauge anchor landmark index (-1 if the anchor is a camera)

    def tree_flatten(self):
        return (
            self.cam_states,
            self.lm_states,
            self.lm_valid,
            self.obs_cam,
            self.obs_lm,
            self.obs_uv,
            self.obs_info,
            self.obs_valid,
        ), (self.anchor_cam, self.anchor_lm)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0], aux[1])


def build_ba_shards(system, mesh: Mesh, axis: str = "lm") -> BAShards:
    """Partition a BA GraphSystem (cam/xyz vertices + edge_p2c) by landmark
    into mesh-shard-aligned arrays."""
    n_dev = mesh.shape[axis]
    cam_ids = sorted(
        v for v, (t, _) in system.vertex_index.items() if t == "cam"
    )
    lm_ids = sorted(v for v, (t, _) in system.vertex_index.items() if t == "xyz")
    cam_pos = {v: i for i, v in enumerate(cam_ids)}
    lm_pos = {v: i for i, v in enumerate(lm_ids)}
    cam_states = np.stack([system.vertex_state(v) for v in cam_ids])

    # contiguous landmark partition
    n_l = len(lm_ids)
    per = (n_l + n_dev - 1) // n_dev
    N_l = per * n_dev
    lm_states = np.zeros((N_l, 3))
    lm_valid = np.zeros(N_l, bool)
    for i, v in enumerate(lm_ids):
        lm_states[i] = system.vertex_state(v)
        lm_valid[i] = True

    # observations grouped by owning shard
    rec = system._edges["edge_p2c"]
    shard_obs = [[] for _ in range(n_dev)]
    for e, vids in enumerate(rec["vids"]):
        p, c = vids  # (point, camera) slot order
        li = lm_pos[p]
        shard = li // per
        shard_obs[shard].append((cam_pos[c], li, rec["meas"][e], rec["sigma_inv"][e]))
    m_per = max(len(s) for s in shard_obs)
    M = m_per * n_dev
    obs_cam = np.zeros(M, np.int32)
    obs_lm = np.zeros(M, np.int32)
    obs_uv = np.zeros((M, 2))
    obs_info = np.zeros((M, 2, 2))
    obs_valid = np.zeros(M, bool)
    for s in range(n_dev):
        base = s * m_per
        for k, (ci, li, uv, info) in enumerate(shard_obs[s]):
            obs_cam[base + k] = ci
            obs_lm[base + k] = li  # global; made shard-local inside shard_map
            obs_uv[base + k] = uv
            obs_info[base + k] = info
            obs_valid[base + k] = True

    # match the system's unary gauge anchor (vertex id 0 by default,
    # else the first edge's first vertex — often a point in BA datasets)
    av = system._unary_anchor
    if av in cam_pos:
        anchor_cam, anchor_lm = cam_pos[av], -1
    elif av in lm_pos:
        anchor_cam, anchor_lm = -1, lm_pos[av]
    else:
        anchor_cam, anchor_lm = 0, -1
    shards = BAShards(
        jnp.asarray(cam_states),
        jnp.asarray(lm_states),
        jnp.asarray(lm_valid),
        jnp.asarray(obs_cam),
        jnp.asarray(obs_lm),
        jnp.asarray(obs_uv),
        jnp.asarray(obs_info),
        jnp.asarray(obs_valid),
        anchor_cam,
        anchor_lm,
    )
    spec = BAShards(
        P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
        anchor_cam, anchor_lm,
    )
    leaves, treedef = jax.tree_util.tree_flatten(shards)
    spec_leaves = jax.tree_util.tree_flatten(spec)[0]
    placed = [
        jax.device_put(x, NamedSharding(mesh, s)) for x, s in zip(leaves, spec_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, placed)


def _p2c_residual_jacs(point, cam_state, uv):
    def err(dp, dc):
        cam = jnp.concatenate([se3.plus(cam_state[0:6], dc), cam_state[6:11]])
        return cam_geo.p2c_error(point + dp, cam, uv)

    r = cam_geo.p2c_error(point, cam_state, uv)
    Jp, Jc = jax.jacfwd(err, argnums=(0, 1))(jnp.zeros(3), jnp.zeros(6))
    return r, Jp, Jc


def distributed_ba_lm_step(shards: BAShards, mesh: Mesh, alpha, axis: str = "lm"):
    """One damped (LM) BA iteration with sharded Schur reduction.

    Returns (new_cam_states (replicated), new_lm_states (sharded), dx_norm,
    chi2, denom) — denom is the LM gain-ratio denominator dx.(alpha dx - g).
    """
    n_c = shards.cam_states.shape[0]
    spec = BAShards(
        P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
        shards.anchor_cam, shards.anchor_lm,
    )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, P()),
        out_specs=(P(), P(axis), P(), P(), P()),
        check_vma=False,
    )
    def step(sh: BAShards, alpha):
        per = sh.lm_states.shape[0]  # local landmarks
        shard_id = jax.lax.axis_index(axis)
        lm_local = sh.obs_lm - shard_id * per  # global -> local index

        r, Jp, Jc = jax.vmap(_p2c_residual_jacs)(
            sh.lm_states[lm_local], sh.cam_states[sh.obs_cam], sh.obs_uv
        )
        W = jnp.where(sh.obs_valid[:, None, None], sh.obs_info, 0.0)
        chi2 = jax.lax.psum(jnp.sum(jnp.einsum("ei,eij,ej->e", r, W, r)), axis)

        WJc = jnp.einsum("eij,ejk->eik", W, Jc)
        WJp = jnp.einsum("eij,ejk->eik", W, Jp)

        # camera system partials (6x6 blocks scattered into dense H_cc)
        Hcc = jnp.zeros((n_c * 6, n_c * 6))
        rows = sh.obs_cam[:, None] * 6 + jnp.arange(6)[None, :]
        Hcc_blk = jnp.einsum("eij,eik->ejk", Jc, WJc)
        Hcc = Hcc.at[rows[:, :, None], rows[:, None, :]].add(Hcc_blk)
        g_c = jnp.zeros((n_c * 6,))
        g_c = g_c.at[rows].add(jnp.einsum("eij,ei->ej", WJc, r))

        # landmark blocks (local segment-sum by landmark)
        D = jax.ops.segment_sum(
            jnp.einsum("eij,eik->ejk", Jp, WJp), lm_local, num_segments=per
        )
        g_l = jax.ops.segment_sum(
            jnp.einsum("eij,ei->ej", WJp, r), lm_local, num_segments=per
        )
        D = D + alpha * jnp.eye(3)
        if sh.anchor_lm >= 0:
            # gauge anchor on a landmark: +I on its diagonal block (local)
            loc = sh.anchor_lm - shard_id * per
            mine = jnp.logical_and(loc >= 0, loc < per)
            D = D.at[jnp.clip(loc, 0, per - 1)].add(
                jnp.where(mine, 1.0, 0.0) * jnp.eye(3)
            )
        D = jnp.where(
            sh.lm_valid[:, None, None], D, jnp.eye(3)[None]
        )  # padding landmarks: identity
        Dinv = jnp.linalg.inv(D)

        # SC subtraction: for each observation pair (same landmark), the
        # coupling B_e = J_c^T W J_p (6x3).  SC -= B_i Dinv B_j^T for all
        # pairs sharing a landmark: done as (sum_e gathered) per landmark via
        # U_l = segment stack — use scatter over per-landmark accumulators
        B = jnp.einsum("eij,eik->ejk", Jc, WJp)  # (M, 6, 3)
        BD = jnp.einsum("eij,ejk->eik", B, Dinv[lm_local])  # (M, 6, 3)
        # SC -= sum over landmark l of U_l Dinv U_l^T; expand over obs pairs:
        # for obs e (cam a, lm l) and obs f (cam b, lm l):
        #   SC[a, b] -= B_e Dinv_l B_f^T = BD_e @ B_f^T
        # realize with a dense per-landmark camera-stacked accumulator:
        # T_l = sum_e (rows_e scattered BD_e) — (per, n_c*6, 3) would be big;
        # instead accumulate via segment over (l, cam-slot) pairs using a
        # (per, 6*n_c, 3) tensor only when n_c is small, else via gather
        # pairs.  Here: T = scatter BD by (lm, cam) then contract with the
        # same scatter of B.
        T_BD = jnp.zeros((per, n_c * 6, 3))
        T_B = jnp.zeros((per, n_c * 6, 3))
        T_BD = T_BD.at[lm_local[:, None], rows, :].add(
            jnp.where(sh.obs_valid[:, None, None], BD, 0.0)
        )
        T_B = T_B.at[lm_local[:, None], rows, :].add(
            jnp.where(sh.obs_valid[:, None, None], B, 0.0)
        )
        SC_part = Hcc - jnp.einsum("lad,lbd->ab", T_BD, T_B)
        rhs_part = g_c - jnp.einsum("lad,ld->a", T_BD, g_l)

        SC = jax.lax.psum(SC_part, axis)
        rhs = jax.lax.psum(rhs_part, axis)

        # gauge anchor + LM damping on the camera diagonal
        SC = SC + alpha * jnp.eye(n_c * 6)
        if sh.anchor_cam >= 0:
            aidx = sh.anchor_cam * 6 + jnp.arange(6)
            SC = SC.at[aidx, aidx].add(1.0)

        dx_c = solve_spd(SC, -rhs)
        # landmarks back-substitution (local)
        BTdx = jnp.einsum("lad,a->ld", T_B, dx_c)
        dx_l = jnp.einsum("lde,le->ld", Dinv, -g_l - BTdx)
        dx_l = jnp.where(sh.lm_valid[:, None], dx_l, 0.0)

        # updates
        new_cams = jax.vmap(
            lambda s, d: jnp.concatenate([se3.plus(s[0:6], d), s[6:11]])
        )(sh.cam_states, dx_c.reshape(n_c, 6))
        new_lms = sh.lm_states + dx_l

        sq = jnp.dot(dx_c, dx_c) + jax.lax.psum(jnp.sum(dx_l * dx_l), axis)
        dx_norm = jnp.sqrt(sq)
        g_dot = jnp.dot(dx_c, rhs) + jax.lax.psum(jnp.sum(dx_l * g_l), axis)
        denom = alpha * sq - g_dot
        return new_cams, new_lms, dx_norm, chi2, denom

    return step(shards, jnp.asarray(alpha, jnp.float64))
