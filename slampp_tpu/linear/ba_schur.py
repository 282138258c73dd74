"""Large-scale bundle-adjustment Schur solver (observation-driven).

The dense-H Schur path (linear/schur.py) materializes the full Hessian —
fine for small scenes, impossible for Venice-class BA (871 cameras, 10^5-10^6
landmarks).  This module builds the reduced camera system DIRECTLY from
observations, the way the reference's BA pipeline uses its block-sparse
lambda (SURVEY.md §3.3), but organized for TPU:

  * observations sorted by landmark: landmark blocks D_l, g_l and the
    back-substitution are sorted-segment reductions (prefix-sum trick);
  * a camera-sorted permutation gives the block-diagonal part of H_cc and
    the camera RHS the same way (pure BA has no cam-cam edges, so H_cc is
    block-diagonal before the Schur subtraction);
  * the SC off-diagonal mass, SC -= sum_l U_l D_l^-1 U_l^T, expands into
    per-observation-PAIR 6x6 GEMMs (pairs of observations sharing a
    landmark), host-sorted by (cam_i, cam_j) so the reduction is again a
    prefix-sum + ONE sorted-unique scatter into the dense SC;
  * the dense SC (6 n_c)^2 factors with the MXU (mixed precision optional).

This is the role the reference's GPU Schur backend plays
(LinearSolver_Schur_GPU.cpp) — as the default, at Venice scale, on one chip.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from slampp_tpu.geometry import camera as cam_geo
from slampp_tpu.geometry import se3
from slampp_tpu.ops.small_blocks import inverse_spd_small

HI = lax.Precision.HIGHEST


class BASchurPlan(NamedTuple):
    n_c: int
    n_l: int
    n_obs: int
    # observation arrays SORTED BY LANDMARK
    obs_cam: jnp.ndarray  # (m,) int32
    obs_lm: jnp.ndarray  # (m,) int32 (sorted ascending)
    obs_uv: jnp.ndarray  # (m, 2)
    obs_info: jnp.ndarray  # (m, 2, 2)
    lm_starts: jnp.ndarray  # (n_l,) segment starts into obs
    lm_ends: jnp.ndarray  # (n_l,)
    # camera-sorted permutation of observations + segments per camera
    cam_perm: jnp.ndarray  # (m,) int32: obs indices sorted by camera
    cam_starts: jnp.ndarray  # (n_c,)
    cam_ends: jnp.ndarray  # (n_c,)
    # observation pairs sharing a landmark, sorted by (cam_i * n_c + cam_j).
    # Unchunked mode: (M2,) flat lists + one global segment table.  Chunked
    # mode (Venice scale — the (M2, 6, 6) pair products would not fit HBM):
    # pairs are split at SC-block boundaries into rows of a (C, cap) layout
    # scanned on device, each chunk scattering its sorted-unique SC blocks.
    pair_e: jnp.ndarray  # (M2,) or (C, cap) int32 obs index (row side)
    pair_f: jnp.ndarray  # (M2,) or (C, cap) int32 obs index (col side)
    pair_distinct_flat: jnp.ndarray  # (n_distinct,) or (C, dmax) flat ids
    pair_starts: jnp.ndarray  # (n_distinct,) or (C, dmax)
    pair_ends: jnp.ndarray  # (n_distinct,) or (C, dmax)
    anchor_cam: int  # -1 when the gauge anchor is a landmark
    anchor_lm: int  # -1 when the gauge anchor is a camera
    chunked: bool = False


# Register as a pytree with the scalars static so plans pass as jit ARGUMENTS
# (closure-captured plans embed megabytes of constants into the MLIR and blow
# up compile time / crash the remote compiler).
_BA_STATIC = ("n_c", "n_l", "n_obs", "anchor_cam", "anchor_lm", "chunked")
_BA_FIELDS = BASchurPlan._fields


def _ba_flatten(p):
    arrays = tuple(getattr(p, f) for f in _BA_FIELDS if f not in _BA_STATIC)
    aux = tuple(getattr(p, f) for f in _BA_FIELDS if f in _BA_STATIC)
    return arrays, aux


def _ba_unflatten(aux, arrays):
    kw = dict(zip([f for f in _BA_FIELDS if f in _BA_STATIC], aux))
    kw.update(zip([f for f in _BA_FIELDS if f not in _BA_STATIC], arrays))
    return BASchurPlan(**kw)


jax.tree_util.register_pytree_node(BASchurPlan, _ba_flatten, _ba_unflatten)


def build_ba_schur_plan(system) -> BASchurPlan:
    """Host symbolic phase from a BA GraphSystem (cam/xyz + edge_p2c)."""
    cam_ids = sorted(v for v, (t, _) in system.vertex_index.items() if t == "cam")
    lm_ids = sorted(v for v, (t, _) in system.vertex_index.items() if t == "xyz")
    cam_pos = {v: i for i, v in enumerate(cam_ids)}
    lm_pos = {v: i for i, v in enumerate(lm_ids)}
    n_c, n_l = len(cam_ids), len(lm_ids)

    rec = system._edges["edge_p2c"]
    m = len(rec["vids"])
    oc = np.empty(m, np.int64)
    ol = np.empty(m, np.int64)
    uv = np.empty((m, 2))
    info = np.empty((m, 2, 2))
    for e, vids in enumerate(rec["vids"]):
        p, c = vids
        oc[e] = cam_pos[c]
        ol[e] = lm_pos[p]
        uv[e] = rec["meas"][e]
        info[e] = rec["sigma_inv"][e]

    av = system._unary_anchor
    if av in cam_pos:
        anchor_cam, anchor_lm = cam_pos[av], -1
    elif av in lm_pos:
        anchor_cam, anchor_lm = -1, lm_pos[av]
    else:
        anchor_cam, anchor_lm = 0, -1

    return build_ba_schur_plan_arrays(
        n_c, n_l, oc, ol, uv, info, anchor_cam=anchor_cam, anchor_lm=anchor_lm
    )


def build_ba_schur_plan_arrays(
    n_c: int,
    n_l: int,
    oc: np.ndarray,
    ol: np.ndarray,
    uv: np.ndarray,
    info: np.ndarray,
    anchor_cam: int = 0,
    anchor_lm: int = -1,
    pair_chunk: int = 2_000_000,
) -> BASchurPlan:
    """Vectorized host symbolic phase from raw observation arrays (the
    Venice-scale entry point — no Python loop over observations or
    landmarks).  When the landmark-sharing pair count exceeds ``pair_chunk``
    the SC reduction is laid out in device-scanned chunks split at SC-block
    boundaries, bounding peak HBM at ~chunk * 36 * 8 bytes."""
    m = len(oc)
    order = np.argsort(ol, kind="stable")
    oc, ol, uv, info = oc[order], ol[order], uv[order], info[order]

    lm_starts = np.searchsorted(ol, np.arange(n_l))
    lm_ends = np.searchsorted(ol, np.arange(n_l) + 1)

    cam_perm = np.argsort(oc, kind="stable")
    oc_sorted = oc[cam_perm]
    cam_starts = np.searchsorted(oc_sorted, np.arange(n_c))
    cam_ends = np.searchsorted(oc_sorted, np.arange(n_c) + 1)

    # all ordered observation pairs sharing a landmark, vectorized:
    # pair t belongs to landmark lm_of[t]; within its deg^2 block,
    # (row, col) = divmod(t - block_start, deg)
    deg = (lm_ends - lm_starts).astype(np.int64)
    d2 = deg * deg
    M2 = int(d2.sum())
    block_start = np.cumsum(d2) - d2
    t_idx = np.arange(M2, dtype=np.int64)
    within = t_idx - np.repeat(block_start, d2)
    deg_r = np.repeat(deg, d2)
    base = np.repeat(lm_starts.astype(np.int64), d2)
    pair_e = base + within // deg_r
    pair_f = base + within % deg_r
    flat = oc[pair_e] * n_c + oc[pair_f]
    po = np.argsort(flat, kind="stable")
    pair_e, pair_f, flat = pair_e[po], pair_f[po], flat[po]
    distinct, starts = np.unique(flat, return_index=True)
    ends = np.concatenate([starts[1:], [len(flat)]])

    chunked = M2 > pair_chunk
    if chunked:
        # split the pair stream at SC-block boundaries into rows <= cap
        cap = pair_chunk
        cuts = [0]
        g = 0
        n_groups = len(distinct)
        while g < n_groups:
            limit = cuts[-1] + cap
            # last group fully within [cuts[-1], limit)
            h = int(np.searchsorted(ends, limit, side="right"))
            if h <= g:  # single group larger than cap: take it alone
                h = g + 1
            cuts.append(int(ends[h - 1]))
            g = h
        C = len(cuts) - 1
        caps = max(int(np.diff(cuts).max()), 1)
        gcounts = []
        ce = np.zeros((C, caps), np.int64)
        cf = np.zeros((C, caps), np.int64)
        for i in range(C):
            a, b = cuts[i], cuts[i + 1]
            ce[i, : b - a] = pair_e[a:b]
            cf[i, : b - a] = pair_f[a:b]
        # per-chunk groups
        gidx = np.searchsorted(ends, np.array(cuts[1:]), side="right")
        gstart = np.concatenate([[0], gidx[:-1]])
        dmax = max(int((gidx - gstart).max()), 1)
        cids = np.full((C, dmax), n_c * n_c, np.int64)
        cst = np.zeros((C, dmax), np.int64)
        cen = np.zeros((C, dmax), np.int64)
        for i in range(C):
            lo, hi = int(gstart[i]), int(gidx[i])
            k = hi - lo
            cids[i, :k] = distinct[lo:hi]
            cst[i, :k] = starts[lo:hi] - cuts[i]
            cen[i, :k] = ends[lo:hi] - cuts[i]
        pair_e_dev = jnp.asarray(ce, jnp.int32)
        pair_f_dev = jnp.asarray(cf, jnp.int32)
        dist_dev = jnp.asarray(cids, jnp.int32)
        st_dev = jnp.asarray(cst, jnp.int32)
        en_dev = jnp.asarray(cen, jnp.int32)
    else:
        pair_e_dev = jnp.asarray(pair_e, jnp.int32)
        pair_f_dev = jnp.asarray(pair_f, jnp.int32)
        dist_dev = jnp.asarray(distinct, jnp.int32)
        st_dev = jnp.asarray(starts, jnp.int32)
        en_dev = jnp.asarray(ends, jnp.int32)

    return BASchurPlan(
        n_c=n_c,
        n_l=n_l,
        n_obs=m,
        obs_cam=jnp.asarray(oc, jnp.int32),
        obs_lm=jnp.asarray(ol, jnp.int32),
        obs_uv=jnp.asarray(uv),
        obs_info=jnp.asarray(info),
        lm_starts=jnp.asarray(lm_starts, jnp.int32),
        lm_ends=jnp.asarray(lm_ends, jnp.int32),
        cam_perm=jnp.asarray(cam_perm, jnp.int32),
        cam_starts=jnp.asarray(cam_starts, jnp.int32),
        cam_ends=jnp.asarray(cam_ends, jnp.int32),
        pair_e=pair_e_dev,
        pair_f=pair_f_dev,
        pair_distinct_flat=dist_dev,
        pair_starts=st_dev,
        pair_ends=en_dev,
        anchor_cam=int(anchor_cam),
        anchor_lm=int(anchor_lm),
        chunked=bool(chunked),
    )


def _p2c_residual_jacs(point, cam_state, uv):
    def err(dp, dc):
        cam = jnp.concatenate([se3.plus(cam_state[0:6], dc), cam_state[6:11]])
        return cam_geo.p2c_error(point + dp, cam, uv)

    r = cam_geo.p2c_error(point, cam_state, uv)
    Jp, Jc = jax.jacfwd(err, argnums=(0, 1))(jnp.zeros(3), jnp.zeros(6))
    return r, Jp, Jc


def _jacs_chunked(points, cam_states, uvs, chunk: int = 131072):
    """Per-observation residuals + Jacobians in BATCH-LAST layout:
    r (2, m), Jp (2, 3, m), Jc (2, 6, m).

    Two reasons for the layout and the chunking: (a) the vmapped jacfwd over
    ALL observations materializes O(m * tangents * dim) intermediates (~18 GB
    at Venice scale) — a lax.map over fixed chunks bounds that; (b) TPU
    tiling pads the two MINOR dims to (8, 128), so a batch-FIRST (m, 6, 3)
    f64 array occupies 4.5 GB of HBM while (6, 3, m) takes ~1.3x its logical
    size.  Every per-observation array in this module keeps m last."""
    m = points.shape[0]
    if m <= chunk:
        r, Jp, Jc = jax.vmap(_p2c_residual_jacs, out_axes=-1)(points, cam_states, uvs)
        return r, Jp, Jc
    C = (m + chunk - 1) // chunk
    pad = C * chunk - m
    pp = jnp.pad(points, ((0, pad), (0, 0)))
    cp = jnp.pad(cam_states, ((0, pad), (0, 0)))
    up = jnp.pad(uvs, ((0, pad), (0, 0)))
    if pad:  # keep padded rows numerically benign (unit focal, z=1 points)
        cp = cp.at[m:, 6:8].set(1.0)
        pp = pp.at[m:, 2].set(1.0)
    r, Jp, Jc = lax.map(
        lambda args: jax.vmap(_p2c_residual_jacs, out_axes=-1)(*args),
        (pp.reshape(C, chunk, 3), cp.reshape(C, chunk, cp.shape[-1]),
         up.reshape(C, chunk, 2)),
    )  # (C, 2, chunk), (C, 2, 3, chunk), (C, 2, 6, chunk)
    r = jnp.moveaxis(r, 0, -2).reshape(2, C * chunk)[:, :m]
    Jp = jnp.moveaxis(Jp, 0, -2).reshape(2, 3, C * chunk)[:, :, :m]
    Jc = jnp.moveaxis(Jc, 0, -2).reshape(2, 6, C * chunk)[:, :, :m]
    return r, Jp, Jc


def _segsum_last(data, starts, ends):
    """Sorted segment sums over the LAST axis via exclusive prefix sums."""
    cum0 = jnp.concatenate(
        [jnp.zeros(data.shape[:-1] + (1,), data.dtype), jnp.cumsum(data, -1)], -1
    )
    return cum0[..., ends] - cum0[..., starts]


def _inv3_last(D):
    """Closed-form batched 3x3 inverse for (3, 3, n) arrays (adjugate/det) —
    elementwise over the lane dim; TPU has no f64 LU and batch-first tiling
    wastes 50x the memory."""
    a, b, c = D[0, 0], D[0, 1], D[0, 2]
    d, e, f = D[1, 0], D[1, 1], D[1, 2]
    g, h, i = D[2, 0], D[2, 1], D[2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    Dd = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * Dd + c * G
    inv_det = 1.0 / det
    row0 = jnp.stack([A, B, C])
    row1 = jnp.stack([Dd, E, F])
    row2 = jnp.stack([G, H, I])
    return jnp.stack([row0, row1, row2]) * inv_det


def ba_schur_lm_step(plan: BASchurPlan, cam_states, lm_states, alpha, sc_f64: bool = True):
    """One damped (LM) BA iteration without any dense Hessian.

    cam_states: (n_c, 11); lm_states: (n_l, 3).  Returns
    (new_cams, new_lms, dx_norm, chi2, denom).  ``sc_f64`` selects an exact
    f64 SC factorization (the SC is only (6 n_c)^2 — cheap even emulated);
    False uses the equilibrated f32 + refinement path.

    All per-observation arrays are BATCH-LAST (see _jacs_chunked) so Venice
    scale (~1e6 observations) fits HBM under TPU tiling.
    """
    n_c = plan.n_c
    r, Jp, Jc = _jacs_chunked(
        lm_states[plan.obs_lm], cam_states[plan.obs_cam], plan.obs_uv
    )
    Wt = jnp.moveaxis(plan.obs_info, 0, -1)  # (2, 2, m)
    # NOTE on contraction style: every per-observation contraction below is a
    # broadcast-multiply-reduce over the TINY leading dims, NOT an einsum —
    # a dot_general with the batch dim last gets transposed to batch-first by
    # the TPU lowering, and a batch-first (m, 6, 6) f64 temporary tiles to
    # 20+ GB at Venice scale.
    Wr = jnp.sum(Wt * r[None, :, :], axis=1)  # (2, m)
    chi2 = jnp.sum(r * Wr)
    WJc = jnp.sum(Wt[:, :, None, :] * Jc[None, :, :, :], axis=1)  # (2, 6, m)
    WJp = jnp.sum(Wt[:, :, None, :] * Jp[None, :, :, :], axis=1)  # (2, 3, m)

    # landmark blocks + rhs (obs sorted by lm)
    D = _segsum_last(
        jnp.sum(Jp[:, :, None, :] * WJp[:, None, :, :], axis=0),
        plan.lm_starts, plan.lm_ends,
    )  # (3, 3, n_l)
    g_l = _segsum_last(
        jnp.sum(WJp * r[:, None, :], axis=0), plan.lm_starts, plan.lm_ends
    )  # (3, n_l)
    D = D + alpha * jnp.eye(3, dtype=D.dtype)[:, :, None]
    if plan.anchor_lm >= 0:
        D = D.at[:, :, plan.anchor_lm].add(jnp.eye(3, dtype=D.dtype))
    Dinv = _inv3_last(D)  # (3, 3, n_l)

    # camera block-diagonal + rhs (via the camera-sorted permutation).
    # Last-axis gathers of rank-3 arrays make XLA transpose to batch-first
    # (whose (8,128)-tiled minors cost 20+ GB at this scale) — so every
    # gather/permutation below runs on a 2-D (k, m) FLATTENED view.
    m = r.shape[-1]
    Hcc_e = jnp.sum(Jc[:, :, None, :] * WJc[:, None, :, :], axis=0).reshape(36, m)
    gc_e = jnp.sum(WJc * r[:, None, :], axis=0)  # (6, m)
    Hcc_diag = _segsum_last(
        Hcc_e[:, plan.cam_perm], plan.cam_starts, plan.cam_ends
    ).reshape(6, 6, n_c)
    g_c = _segsum_last(gc_e[:, plan.cam_perm], plan.cam_starts, plan.cam_ends)  # (6, n_c)

    # couplings per observation
    Dinv_obs = Dinv.reshape(9, -1)[:, plan.obs_lm].reshape(3, 3, m)
    B = jnp.sum(Jc[:, :, None, :] * WJp[:, None, :, :], axis=0)  # (6, 3, m)
    BD = jnp.sum(B[:, :, None, :] * Dinv_obs[None, :, :, :], axis=1)  # (6, 3, m)
    B2 = B.reshape(18, m)
    BD2 = BD.reshape(18, m)

    # SC pair mass: P_ef = BD_e @ B_f^T, reduced per distinct (cam_i, cam_j),
    # accumulated into a (6, 6, n_c^2 + 1) flat grid (last row = dummy)
    SCf = jnp.zeros((6, 6, n_c * n_c + 1), BD.dtype)

    def pair_reduce(SCf, pe, pf, ids, st, en):
        BDg = BD2[:, pe].reshape(6, 3, pe.shape[-1])
        Bg = B2[:, pf].reshape(6, 3, pf.shape[-1])
        prod = jnp.sum(BDg[:, None, :, :] * Bg[None, :, :, :], axis=2)  # (6,6,cap)
        red = _segsum_last(prod, st, en)
        return SCf.at[:, :, ids].add(
            -red, indices_are_sorted=True, unique_indices=True
        )

    if plan.chunked:
        def body(SCf, ch):
            pe, pf, ids, st, en = ch
            return pair_reduce(SCf, pe, pf, ids, st, en), None

        SCf, _ = lax.scan(
            body, SCf,
            (plan.pair_e, plan.pair_f, plan.pair_distinct_flat,
             plan.pair_starts, plan.pair_ends),
        )
    else:
        SCf = pair_reduce(
            SCf, plan.pair_e, plan.pair_f, plan.pair_distinct_flat,
            plan.pair_starts, plan.pair_ends,
        )
    diag_ids = jnp.arange(n_c) * (n_c + 1)
    diag_add = Hcc_diag + alpha * jnp.eye(6, dtype=SCf.dtype)[:, :, None]
    if plan.anchor_cam >= 0:
        diag_add = diag_add.at[:, :, plan.anchor_cam].add(jnp.eye(6, dtype=SCf.dtype))
    SCf = SCf.at[:, :, diag_ids].add(diag_add)
    SC = (
        SCf[:, :, :-1]
        .reshape(6, 6, n_c, n_c)
        .transpose(2, 0, 3, 1)
        .reshape(n_c * 6, n_c * 6)
    )

    # reduced rhs: g_c - sum_l U_l Dinv_l g_l  (per-obs contribution BD_e g_l)
    r2_e = jnp.sum(BD * g_l[:, plan.obs_lm][None, :, :], axis=1)  # (6, m)
    r2 = _segsum_last(r2_e[:, plan.cam_perm], plan.cam_starts, plan.cam_ends)
    rhs = -(g_c - r2).T.reshape(-1)

    if sc_f64:
        L = lax.linalg.cholesky(SC, symmetrize_input=True)
        y = lax.linalg.triangular_solve(L, rhs[:, None], left_side=True, lower=True)
        dx_c = lax.linalg.triangular_solve(
            L, y, left_side=True, lower=True, transpose_a=True
        )[:, 0]
    else:
        # equilibrated f32 factorization + one f64 refinement
        s = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(SC), 1e-30))
        SCs = (SC * s[:, None] * s[None, :]).astype(jnp.float32)
        SCs = SCs + 1e-6 * jnp.eye(SC.shape[0], dtype=jnp.float32)
        L = lax.linalg.cholesky(SCs)

        def solve32(rr):
            y = lax.linalg.triangular_solve(
                L, (s * rr).astype(jnp.float32)[:, None], left_side=True, lower=True
            )
            z = lax.linalg.triangular_solve(
                L, y, left_side=True, lower=True, transpose_a=True
            )[:, 0]
            return s * z.astype(SC.dtype)

        dx_c = solve32(rhs)
        dx_c = dx_c + solve32(rhs - SC @ dx_c)

    # landmark back-substitution: dx_l = Dinv (-g_l - sum_e B_e^T dx_c[cam_e])
    dxc_blocks = dx_c.reshape(n_c, 6)
    bt_e = jnp.sum(B * dxc_blocks.T[:, plan.obs_cam][:, None, :], axis=0)  # (3, m)
    BT = _segsum_last(bt_e, plan.lm_starts, plan.lm_ends)  # (3, n_l)
    dx_l = jnp.sum(Dinv * (-g_l - BT)[None, :, :], axis=1)  # (3, n_l)

    new_cams = jax.vmap(
        lambda st, d: jnp.concatenate([se3.plus(st[0:6], d), st[6:11]])
    )(cam_states, dxc_blocks)
    new_lms = lm_states + dx_l.T

    sq = jnp.dot(dx_c, dx_c) + jnp.sum(dx_l * dx_l)
    # LM gain denominator dx.(alpha dx - g) with the FULL gradient (g_c, g_l)
    g_dot = jnp.sum(dxc_blocks.T * g_c) + jnp.sum(dx_l * g_l)
    denom = alpha * sq - g_dot
    return new_cams, new_lms, jnp.sqrt(sq), chi2, denom


class BigBASolver:
    """LM over the observation-driven Schur step (the Venice-class solver)."""

    def __init__(self, system, verbose: bool = False, tau: float = 1e-3,
                 sc_f64: bool = True):
        self.system = system
        self.verbose = verbose
        self.tau = tau
        self.sc_f64 = sc_f64
        self.plan = None
        self._step = None
        self._cams = None
        self._lms = None

    @classmethod
    def from_arrays(cls, cam_states, lm_states, obs_cam, obs_lm, uv, info,
                    verbose: bool = False, tau: float = 1e-3,
                    sc_f64: bool = False, pair_chunk: int = 2_000_000):
        """Venice-scale constructor from raw observation arrays (no
        GraphSystem / parser in the loop)."""
        self = cls(system=None, verbose=verbose, tau=tau, sc_f64=sc_f64)
        self.plan = build_ba_schur_plan_arrays(
            len(cam_states), len(lm_states), obs_cam, obs_lm, uv, info,
            pair_chunk=pair_chunk,
        )
        self._cams = jnp.asarray(cam_states)
        self._lms = jnp.asarray(lm_states)
        return self

    def _make_step(self):
        if self._step is None:
            step = jax.jit(ba_schur_lm_step, static_argnames=("sc_f64",))
            self._step = lambda c, l, a: step(self.plan, c, l, a, sc_f64=self.sc_f64)

    def _prepare(self):
        if self.plan is None:
            self.plan = build_ba_schur_plan(self.system)
        self._make_step()
        if self.system is None:
            return None, None, self._cams, self._lms
        cam_ids = sorted(v for v, (t, _) in self.system.vertex_index.items() if t == "cam")
        lm_ids = sorted(v for v, (t, _) in self.system.vertex_index.items() if t == "xyz")
        cams = jnp.asarray(np.stack([self.system.vertex_state(v) for v in cam_ids]))
        lms = jnp.asarray(np.stack([self.system.vertex_state(v) for v in lm_ids]))
        return cam_ids, lm_ids, cams, lms

    def optimize(self, max_iterations: int = 5, min_dx_norm: float = 0.01) -> int:
        cam_ids, lm_ids, cams, lms = self._prepare()
        # initial damping from the max Hessian diagonal (LM heuristic)
        alpha = self.tau * 1e3  # scale-free start; adapted by the gain ratio
        nu = 2.0
        _, _, _, chi2, _ = self._step(cams, lms, alpha)
        last_error = float(chi2)
        applied = 0
        for it in range(max_iterations):
            nc, nl, dxn, chi2, denom = self._step(cams, lms, alpha)
            if not np.isfinite(float(dxn)) or float(dxn) <= min_dx_norm:
                break
            _, _, _, chi2_new, _ = self._step(nc, nl, alpha)
            f_error = float(chi2_new)
            rho = (last_error - f_error) / max(float(denom), 1e-300)
            if rho > 0:
                alpha *= max(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
                nu = 2.0
                cams, lms = nc, nl
                last_error = f_error
                applied += 1
                if self.verbose:
                    print(f"BigBA iter {it}: accepted chi2={f_error:.2f} alpha={alpha:.2e}")
            else:
                alpha *= nu
                nu *= 2.0
                if self.verbose:
                    print(f"BigBA iter {it}: rejected chi2={f_error:.2f} alpha={alpha:.2e}")
        # write back
        self._cams, self._lms = cams, lms
        if self.system is not None:
            cams_np, lms_np = np.asarray(cams), np.asarray(lms)
            for i, v in enumerate(cam_ids):
                self.system.set_vertex_state(v, cams_np[i])
            for i, v in enumerate(lm_ids):
                self.system.set_vertex_state(v, lms_np[i])
        return applied

    def chi2(self) -> float:
        cam_ids, lm_ids, cams, lms = self._prepare()
        _, _, _, chi2, _ = self._step(cams, lms, 0.0)
        return float(chi2)
