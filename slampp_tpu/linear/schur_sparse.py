"""Sparse Schur complement for GENERAL landmark graphs (no dense Hessian).

The dense-H Schur path (linear/schur.py) gathers A/U/C out of an assembled
(N, N) Hessian — fine for toy scenes, O(N^2) for cityTrees10k/victoria-park
class problems.  This module eliminates the landmarks observation-wise (the
way linear/ba_schur.py does for BA) and assembles the REDUCED pose system
directly in the partitioned (v3) fine-block format, so the pose solve is the
sparse partitioned engine — never a dense matrix.

Pipeline (reference: CLinearSolver_Schur::Solve_PosDef_Blocky,
include/slam/LinearSolver_Schur.h:1623-1770 — Permute -> SliceTo A/U/C ->
InverseOf_BlockDiag -> SC = A - U C^-1 V -> inner solve -> back-substitute):

  host symbolic:  landmark set from guided ordering (vertex types flagged
      is_landmark, LinearSolver_Schur.h:725); SC fill pattern = pose-pose
      edges  U  landmark-induced pose pairs; v3 geometry over pose blocks
      (build_v3_geometry); sorted contribution->slot routing tables.
  device numeric: per-type batched Jacobians -> landmark blocks D_l, g_l by
      sorted segment reduction -> couplings B_e -> pair corrections
      -B_e D^-1 B_f^T -> ONE sorted segment reduction into fine slots ->
      partitioned solve -> landmark back-substitution.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from slampp_tpu.core import assembly
from slampp_tpu.graph.system import GraphArrays, GraphSystem
from slampp_tpu.graph.types import get_edge_type, get_vertex_type
from slampp_tpu.linear import partitioned as v3
from slampp_tpu.ops.small_blocks import inverse_spd_small


class SparseSchurPlan(NamedTuple):
    # statics
    n_p: int  # pose blocks
    n_l: int  # landmarks
    bs: int  # pose block dim
    dl: int  # landmark dim
    n_src: int  # Hessian block contributions (incl. dummy row at end)
    n_rsrc: int  # rhs contributions
    anchor_kind: str  # "pose" | "landmark" | "none"
    anchor_idx: int
    anchor_dim: int
    anchor_info: float
    # device routing
    src_perm: jnp.ndarray  # (n_src,) sort of contributions by fine slot
    src_starts: jnp.ndarray  # (n_slots_hit,)
    src_ends: jnp.ndarray
    slot_inv: jnp.ndarray  # (nnzb,) -> hit index or n_hit (zero)
    src_tflag: jnp.ndarray  # (n_src,) 1.0 where contribution is transposed
    rsrc_perm: jnp.ndarray  # (n_rsrc,)
    rsrc_starts: jnp.ndarray  # (n_p,)
    rsrc_ends: jnp.ndarray
    # landmark segment tables over the lm-sorted pl-edge list
    lm_starts: jnp.ndarray  # (n_l,)
    lm_ends: jnp.ndarray
    pl_lm: jnp.ndarray  # (n_pl,) landmark index per (sorted) pl edge
    pl_pose: jnp.ndarray  # (n_pl,) pose block per (sorted) pl edge
    # pair tables (over the lm-sorted pl edges)
    pair_e: jnp.ndarray  # (n_pairs,)
    pair_f: jnp.ndarray
    # solution scatter
    pose_dx_offsets: jnp.ndarray  # (n_p, bs) global scalar offsets (dummy=state_dim)
    lm_dx_offsets: jnp.ndarray  # (n_l, dl)
    # pp-edge pose ids (device copies, for the matvec used by dogleg)
    pp_ei: jnp.ndarray  # (n_pp,)
    pp_ej: jnp.ndarray  # (n_pp,)
    anchor_orig: int  # original pose-block id of a pose anchor (-1 otherwise)


# pytree registration: scalars static, arrays dynamic
_SS_STATIC = ("n_p", "n_l", "bs", "dl", "n_src", "n_rsrc",
              "anchor_kind", "anchor_idx", "anchor_dim", "anchor_info",
              "anchor_orig")
_SS_FIELDS = SparseSchurPlan._fields


def _ss_flatten(p):
    arrays = tuple(getattr(p, f) for f in _SS_FIELDS if f not in _SS_STATIC)
    aux = tuple(getattr(p, f) for f in _SS_FIELDS if f in _SS_STATIC)
    return arrays, aux


def _ss_unflatten(aux, arrays):
    kw = dict(zip([f for f in _SS_FIELDS if f in _SS_STATIC], aux))
    kw.update(zip([f for f in _SS_FIELDS if f not in _SS_STATIC], arrays))
    return SparseSchurPlan(**kw)


jax.tree_util.register_pytree_node(SparseSchurPlan, _ss_flatten, _ss_unflatten)


class SparseSchurSolver:
    """General-graph Schur solver: landmark elimination + v3 pose solve.

    Same step interface as PartitionedSolver (gn_step / damped_step) so the
    GN/LM solvers can route landmark graphs through it.
    """

    def __init__(self, system: GraphSystem, target: int = 64,
                 mixed_precision: bool = True, refine_iters: int = 1,
                 damping_rel: float = 1e-6):
        self.system = system
        self.target = target
        self.mixed_precision = mixed_precision
        self.refine_iters = refine_iters
        self.damping_rel = damping_rel
        self.plan: SparseSchurPlan | None = None
        self.v3_plan = None
        self._symbolic_key = None
        self._type_meta = None  # per edge-type classification (host)
        self._step_fns = {}

    # ------------------------------------------------------------------ host
    def symbolic(self) -> None:
        system = self.system
        # classify vertices
        pose_block: Dict[int, int] = {}
        lm_pos: Dict[int, int] = {}
        bs_set, dl_set = set(), set()
        for vid in system._vorder:
            t, _ = system.vertex_index[vid]
            vt = get_vertex_type(t)
            if vt.is_landmark:
                lm_pos[vid] = len(lm_pos)
                dl_set.add(vt.dim)
            else:
                pose_block[vid] = len(pose_block)
                bs_set.add(vt.dim)
        if not lm_pos:
            raise ValueError("no landmark-like vertices to eliminate")
        if len(bs_set) != 1 or len(dl_set) != 1:
            raise ValueError(
                f"uniform pose/landmark dims required, got {bs_set}/{dl_set}")
        bs, dl = bs_set.pop(), dl_set.pop()
        n_p, n_l = len(pose_block), len(lm_pos)

        # classify edge types; collect pp pairs and pl edge lists (host order:
        # type registration order, then pool order — matches the device concat)
        type_meta = []
        pp_i, pp_j = [], []  # per pp edge, pose block ids
        pl_pose, pl_lm = [], []  # per pl edge
        for tname in system.edge_type_names:
            et = get_edge_type(tname)
            if et.arity == 1:
                vt0 = get_vertex_type(et.vertex_types[0])
                kind = "u_lm" if vt0.is_landmark else "u_pose"
                type_meta.append((tname, kind, None))
                if kind == "u_pose":
                    for (v0,) in system._edges[tname]["vids"]:
                        pp_i.append(pose_block[v0])
                        pp_j.append(pose_block[v0])
                else:
                    for (v0,) in system._edges[tname]["vids"]:
                        pl_lm.append(lm_pos[v0])
                        pl_pose.append(-1)
                continue
            if et.arity != 2:
                raise NotImplementedError(
                    f"sparse Schur supports unary/binary edges, got {tname}")
            lm_slots = [get_vertex_type(v).is_landmark for v in et.vertex_types]
            if not any(lm_slots):
                type_meta.append((tname, "pp", None))
                for vids in system._edges[tname]["vids"]:
                    pp_i.append(pose_block[vids[0]])
                    pp_j.append(pose_block[vids[1]])
            elif all(lm_slots):
                raise ValueError(
                    f"landmark-landmark edge type {tname}: C not block-diagonal")
            else:
                sl = int(lm_slots.index(True))
                type_meta.append((tname, "pl", sl))
                sp = 1 - sl
                for vids in system._edges[tname]["vids"]:
                    pl_pose.append(pose_block[vids[sp]])
                    pl_lm.append(lm_pos[vids[sl]])
        self._type_meta = type_meta
        n_pp = len(pp_i)
        n_pl = len(pl_pose)
        pp_i = np.asarray(pp_i, np.int64).reshape(-1)
        pp_j = np.asarray(pp_j, np.int64).reshape(-1)
        pl_pose = np.asarray(pl_pose, np.int64).reshape(-1)
        pl_lm = np.asarray(pl_lm, np.int64).reshape(-1)

        # sort pl edges by landmark (device gathers use lm_sort)
        lm_sort = np.argsort(pl_lm, kind="stable")
        pl_lm_s = pl_lm[lm_sort]
        pl_pose_s = pl_pose[lm_sort]
        lm_starts = np.searchsorted(pl_lm_s, np.arange(n_l))
        lm_ends = np.searchsorted(pl_lm_s, np.arange(n_l) + 1)
        self._lm_sort = lm_sort

        # pairs of pl edges sharing a landmark (ordered, both directions)
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

        # SC fill pattern in ORIGINAL pose-block ids
        pe_pose = pl_pose_s[pair_e]
        pf_pose = pl_pose_s[pair_f]
        valid_pair = (pe_pose >= 0) & (pf_pose >= 0)
        pattern = set()
        for a, b in zip(pp_i, pp_j):
            if a != b:
                pattern.add((max(a, b), min(a, b)))
        hi = np.maximum(pe_pose, pf_pose)
        lo = np.minimum(pe_pose, pf_pose)
        offd = valid_pair & (hi != lo)
        pattern.update(
            {(int(a), int(b)) for a, b in zip(hi[offd], lo[offd])}
        )

        # generous separator gate: the dense SC core handles any size
        # correctly; landmark-induced coupling makes pose graphs less
        # chain-like than pure odometry (cityTrees/victoria-park class)
        plan_v3, slot_of, inv = v3.build_v3_geometry(
            n_p, sorted(pattern), bs, self.target, max_sep_frac=0.85
        )
        self.v3_plan = plan_v3
        nnzb = plan_v3.nnzb

        def slot_and_flag(i, j):
            """fine slot + transpose flag for contribution with row block i,
            col block j (original ids)."""
            pi, pj = int(inv[i]), int(inv[j])
            if pi >= pj:
                return slot_of[(pi, pj)], 0.0
            return slot_of[(pj, pi)], 1.0

        # contribution -> slot routing, in device concat order:
        #   [pp Hii | pp Hjj | pp Hij | pl Hpp | pair corrections]
        dest = np.empty(3 * n_pp + n_pl + M2, np.int64)
        tflag = np.zeros(3 * n_pp + n_pl + M2)
        for k in range(n_pp):
            dest[k] = slot_of[(int(inv[pp_i[k]]), int(inv[pp_i[k]]))]
            dest[n_pp + k] = slot_of[(int(inv[pp_j[k]]), int(inv[pp_j[k]]))]
            if pp_i[k] == pp_j[k]:  # unary pose edge: drop the duplicate+offd
                dest[n_pp + k] = nnzb + 1
                dest[2 * n_pp + k] = nnzb + 1
            else:
                s, f = slot_and_flag(int(pp_i[k]), int(pp_j[k]))
                dest[2 * n_pp + k] = s
                tflag[2 * n_pp + k] = f
        for k in range(n_pl):
            p = pl_pose_s[k]
            dest[3 * n_pp + k] = (
                slot_of[(int(inv[p]), int(inv[p]))] if p >= 0 else nnzb + 1
            )
        # pair corrections: keep ordered pairs mapping to the lower triangle
        # (rank_e >= rank_f); contribution rows = pose_e -> matches slot rows
        pair_off = 3 * n_pp + n_pl
        rk_e = np.where(pe_pose >= 0, inv[np.maximum(pe_pose, 0)], -1)
        rk_f = np.where(pf_pose >= 0, inv[np.maximum(pf_pose, 0)], -1)
        keep = valid_pair & (rk_e >= rk_f)
        pdest = np.full(M2, nnzb + 1, np.int64)
        for t in np.flatnonzero(keep):
            pdest[t] = slot_of[(int(rk_e[t]), int(rk_f[t]))]
        dest[pair_off:] = pdest

        src_perm = np.argsort(dest, kind="stable")
        sdest = dest[src_perm]
        kept = int(np.searchsorted(sdest, nnzb + 1))
        uniq, starts = np.unique(sdest[:kept], return_index=True)
        ends = np.concatenate([starts[1:], [kept]]).astype(np.int64) if len(uniq) else np.zeros(0, np.int64)
        n_hit = len(uniq)
        grid = np.arange(nnzb, dtype=np.int64)
        if n_hit:
            pos = np.minimum(np.searchsorted(uniq, grid), n_hit - 1)
            slot_inv = np.where(uniq[pos] == grid, pos, n_hit)
        else:
            slot_inv = np.full(nnzb, n_hit, np.int64)

        # rhs routing: [pp g_i | pp g_j | pl g_p | pair-correction g per pl edge]
        rdest = np.concatenate([
            pp_i, np.where(pp_i == pp_j, n_p + 1, pp_j),
            np.where(pl_pose_s >= 0, pl_pose_s, n_p + 1),
            np.where(pl_pose_s >= 0, pl_pose_s, n_p + 1),
        ])
        # rhs is assembled in PERMUTED fine layout for the v3 solve
        rdest = np.where(rdest < n_p, inv[np.minimum(rdest, n_p - 1)], n_p + 1)
        rsrc_perm = np.argsort(rdest, kind="stable")
        srd = rdest[rsrc_perm]
        keptr = int(np.searchsorted(srd, n_p + 1))
        uniq_r, starts_r = np.unique(srd[:keptr], return_index=True)
        assert len(uniq_r) == n_p, "every pose block needs a rhs contribution"
        ends_r = np.concatenate([starts_r[1:], [keptr]]).astype(np.int64)

        # anchor (gauge) handling
        av = system._unary_anchor
        anchor_kind, anchor_idx, anchor_dim, anchor_orig = "none", 0, 0, -1
        if av is not None and not system._vconst.get(av, False):
            vt = get_vertex_type(system.vertex_index[av][0])
            if av in pose_block:
                anchor_kind, anchor_idx = "pose", int(inv[pose_block[av]])
                anchor_orig = int(pose_block[av])
            else:
                anchor_kind, anchor_idx = "landmark", lm_pos[av]
                anchor_orig = lm_pos[av]
            anchor_dim = vt.dim

        # dx scatter offsets
        offsets, total = system._layout()
        pose_off = np.full((n_p, bs), total, np.int64)
        for vid, b in pose_block.items():
            if vid in offsets:
                o = offsets[vid]
                pose_off[b] = np.arange(o, o + bs)
        lm_off = np.full((n_l, dl), total, np.int64)
        for vid, b in lm_pos.items():
            if vid in offsets:
                o = offsets[vid]
                lm_off[b] = np.arange(o, o + dl)

        dev = lambda a, dt=jnp.int32: jnp.asarray(a, dt)
        self.plan = SparseSchurPlan(
            n_p=n_p, n_l=n_l, bs=bs, dl=dl,
            n_src=len(dest), n_rsrc=len(rdest),
            anchor_kind=anchor_kind, anchor_idx=anchor_idx,
            anchor_dim=anchor_dim, anchor_info=float(system.unary_information),
            src_perm=dev(src_perm), src_starts=dev(starts), src_ends=dev(ends),
            slot_inv=dev(slot_inv), src_tflag=jnp.asarray(tflag),
            rsrc_perm=dev(rsrc_perm), rsrc_starts=dev(starts_r),
            rsrc_ends=dev(ends_r),
            lm_starts=dev(lm_starts), lm_ends=dev(lm_ends),
            pl_lm=dev(pl_lm_s), pl_pose=dev(np.maximum(pl_pose_s, 0)),
            pair_e=dev(pair_e), pair_f=dev(pair_f),
            pose_dx_offsets=dev(pose_off), lm_dx_offsets=dev(lm_off),
            pp_ei=dev(pp_i), pp_ej=dev(pp_j), anchor_orig=anchor_orig,
        )
        self._inv_map = jnp.asarray(inv, jnp.int32)  # orig block -> permuted
        self._lm_sort_dev = jnp.asarray(lm_sort, jnp.int32)
        self._symbolic_key = (system.n_vertices, system.n_edges)

    def ensure_symbolic(self):
        key = (self.system.n_vertices, self.system.n_edges)
        if self._symbolic_key != key:
            self.symbolic()
            self._step_fns = {}

    # ---------------------------------------------------------------- device
    def _edge_terms(self, graph: GraphArrays, lm_sort):
        """Per-edge contributions, concatenated in the host's routing order.

        Returns (pp_Hii, pp_Hjj, pp_Hij, pp_gi, pp_gj, pl_Hpp, pl_gp,
        pl_D, pl_gl, pl_B, chi2) with the pl_* arrays in LANDMARK-SORTED
        order (host lm_sort applied)."""
        bs, dl = self.plan.bs, self.plan.dl
        Hii, Hjj, Hij, gi, gj = [], [], [], [], []
        Hpp, gp, Dl, gl, Bc = [], [], [], [], []
        chi2 = jnp.zeros(())
        for tname, kind, sl in self._type_meta:
            et = get_edge_type(tname)
            ea = graph.edges[tname]
            vts = tuple(get_vertex_type(t) for t in et.vertex_types)
            slot_states = tuple(
                graph.states[et.vertex_types[s]][ea.local_idx[:, s]]
                for s in range(et.arity)
            )
            r, jacs = jax.vmap(
                lambda *a: assembly._edge_residual_and_jacobians(et, vts, a[:-1], a[-1])
            )(*slot_states, ea.meas)
            W = ea.sigma_inv  # zero on padding rows -> contributions vanish
            Wr = jnp.einsum("eij,ej->ei", W, r)
            chi2 = chi2 + jnp.sum(jnp.where(ea.valid, jnp.einsum("ei,ei->e", r, Wr), 0.0))
            WJ = [jnp.einsum("eij,ejk->eik", W, J) for J in jacs]
            if kind == "pp":
                Hii.append(jnp.einsum("eri,erj->eij", jacs[0], WJ[0]))
                Hjj.append(jnp.einsum("eri,erj->eij", jacs[1], WJ[1]))
                Hij.append(jnp.einsum("eri,erj->eij", jacs[0], WJ[1]))
                gi.append(jnp.einsum("eri,er->ei", WJ[0], r))
                gj.append(jnp.einsum("eri,er->ei", WJ[1], r))
            elif kind == "u_pose":
                Hii.append(jnp.einsum("eri,erj->eij", jacs[0], WJ[0]))
                Hjj.append(jnp.zeros_like(Hii[-1]))
                Hij.append(jnp.zeros_like(Hii[-1]))
                gi.append(jnp.einsum("eri,er->ei", WJ[0], r))
                gj.append(jnp.zeros_like(gi[-1]))
            elif kind == "u_lm":
                Dl.append(jnp.einsum("eri,erj->eij", jacs[0], WJ[0]))
                gl.append(jnp.einsum("eri,er->ei", WJ[0], r))
                Hpp.append(jnp.zeros((r.shape[0], bs, bs), r.dtype))
                gp.append(jnp.zeros((r.shape[0], bs), r.dtype))
                Bc.append(jnp.zeros((r.shape[0], bs, dl), r.dtype))
            else:  # pl
                sp = 1 - sl
                Hpp.append(jnp.einsum("eri,erj->eij", jacs[sp], WJ[sp]))
                gp.append(jnp.einsum("eri,er->ei", WJ[sp], r))
                Dl.append(jnp.einsum("eri,erj->eij", jacs[sl], WJ[sl]))
                gl.append(jnp.einsum("eri,er->ei", WJ[sl], r))
                Bc.append(jnp.einsum("eri,erj->eij", jacs[sp], WJ[sl]))

        cat = lambda xs, shp: (
            jnp.concatenate(xs, 0) if xs else jnp.zeros((0,) + shp)
        )
        Dl_c = cat(Dl, (dl, dl))[lm_sort]
        gl_c = cat(gl, (dl,))[lm_sort]
        Hpp_c = cat(Hpp, (bs, bs))[lm_sort]
        gp_c = cat(gp, (bs,))[lm_sort]
        B_c = cat(Bc, (bs, dl))[lm_sort]
        return (
            cat(Hii, (bs, bs)), cat(Hjj, (bs, bs)), cat(Hij, (bs, bs)),
            cat(gi, (bs,)), cat(gj, (bs,)),
            Hpp_c, gp_c, Dl_c, gl_c, B_c, chi2,
        )

    def _solve_from_terms(self, p: SparseSchurPlan, v3p, inv_map, graph,
                          terms, alpha):
        """Landmark elimination + sparse pose solve from per-edge terms.

        Returns (dx (state_dim,), gvec (state_dim,), chi2, D_undamped) —
        shared by the damped (LM/GN) step and the dogleg step."""
        bs, dl, n_p = p.bs, p.dl, p.n_p
        (Hii, Hjj, Hij, gi, gj, Hpp, gp, Dle, gle, B, chi2) = terms

        # landmark blocks (sorted segment sums over the lm-sorted pl edges)
        def segsum0(data, starts, ends):
            cum0 = jnp.concatenate(
                [jnp.zeros((1,) + data.shape[1:], data.dtype), jnp.cumsum(data, 0)], 0
            )
            return cum0[ends] - cum0[starts]

        D0 = segsum0(Dle, p.lm_starts, p.lm_ends)  # (n_l, dl, dl) undamped
        g_l = segsum0(gle, p.lm_starts, p.lm_ends)  # (n_l, dl)
        D = D0 + alpha * jnp.eye(dl, dtype=D0.dtype)
        if p.anchor_kind == "landmark":
            add = jnp.zeros((dl, dl), D.dtype).at[
                jnp.arange(p.anchor_dim), jnp.arange(p.anchor_dim)
            ].set(p.anchor_info)
            D = D.at[p.anchor_idx].add(add)
        Dinv = inverse_spd_small(D)

        # pair corrections: -B_e Dinv_lm B_f^T
        Dinv_e = Dinv[p.pl_lm]
        BD = jnp.einsum("eij,ejk->eik", B, Dinv_e)  # (n_pl, bs, dl)
        BDg = BD[p.pair_e]
        Bg = B[p.pair_f]
        pair_c = -jnp.einsum("tik,tjk->tij", BDg, Bg)  # (M2, bs, bs)

        # fine-slot assembly: concat in routing order, transpose-flagged
        contribs = jnp.concatenate([Hii, Hjj, Hij, Hpp, pair_c], 0)
        tf = p.src_tflag[:, None, None]
        contribs = (1.0 - tf) * contribs + tf * jnp.swapaxes(contribs, 1, 2)
        G = contribs[p.src_perm]
        red = segsum0(G, p.src_starts, p.src_ends)
        redp = jnp.concatenate([red, jnp.zeros((1, bs, bs), red.dtype)], 0)
        vals = redp[p.slot_inv]  # (nnzb, bs, bs)
        d = jnp.arange(bs)
        vals = vals.at[:n_p, d, d].add(alpha)
        if p.anchor_kind == "pose":
            da = jnp.arange(p.anchor_dim)
            vals = vals.at[p.anchor_idx, da, da].add(p.anchor_info)

        # rhs: g_p - BD g_l per pl edge; permuted fine layout
        r2 = jnp.einsum("eik,ek->ei", BD, g_l[p.pl_lm])  # (n_pl, bs)
        rcontrib = jnp.concatenate([gi, gj, gp, -r2], 0)
        Gr = rcontrib[p.rsrc_perm]
        rhs = segsum0(Gr, p.rsrc_starts, p.rsrc_ends)  # (n_p, bs) permuted

        vals_p = jnp.concatenate([vals, jnp.zeros((1, bs, bs), vals.dtype)], 0)
        rhs_p = jnp.concatenate([rhs, jnp.zeros((1, bs), rhs.dtype)], 0)
        x_perm = v3._v3_solve_refined(
            v3p, vals_p, -rhs_p, self.refine_iters, self.damping_rel,
            self.mixed_precision,
        )  # (n_p, bs) permuted

        # landmark back-substitution: dx_l = Dinv (-g_l - B^T dx_pose)
        x_pose = x_perm[inv_map]  # (n_p, bs) original order
        bt = jnp.einsum("eik,ei->ek", B, x_pose[p.pl_pose])  # (n_pl, dl)
        BT = segsum0(bt, p.lm_starts, p.lm_ends)
        dx_l = jnp.einsum("lij,lj->li", Dinv, -g_l - BT)

        # global dx scatter
        total = graph.state_dim
        dx = jnp.zeros(total + 1, x_pose.dtype)
        dx = dx.at[p.pose_dx_offsets.reshape(-1)].set(x_pose.reshape(-1))
        dx = dx.at[p.lm_dx_offsets.reshape(-1)].set(dx_l.reshape(-1))
        dx = dx[:total]
        # NOTE: gvec here is the NEGATED gradient contribution layout used by
        # the LM gain denominator: rhs rows are -(g_p - BD g_l) per pose; the
        # landmark rows carry raw g_l (matches the dense-oracle denominator)
        gvec = jnp.zeros(total + 1, x_pose.dtype)
        gvec = gvec.at[p.pose_dx_offsets.reshape(-1)].set(
            rhs[inv_map].reshape(-1)
        )
        gvec = gvec.at[p.lm_dx_offsets.reshape(-1)].set(g_l.reshape(-1))
        gvec = gvec[:total]
        return dx, gvec, chi2, D0

    def _step_impl(self, p: SparseSchurPlan, v3p, lm_sort, inv_map,
                   graph: GraphArrays, alpha):
        terms = self._edge_terms(graph, lm_sort)
        dx, gvec, chi2, _ = self._solve_from_terms(
            p, v3p, inv_map, graph, terms, alpha
        )
        new_states = assembly.apply_update(graph, dx)
        denom = jnp.dot(dx, alpha * dx - gvec)
        return new_states, denom, jnp.linalg.norm(dx), chi2

    def _gradient(self, p: SparseSchurPlan, graph, terms):
        """TRUE negative-gradient vector g (J^T W r layout): pose rows g_p,
        landmark rows g_l, in global state coordinates."""
        (Hii, Hjj, Hij, gi, gj, Hpp, gp, Dle, gle, B, chi2) = terms
        total = graph.state_dim
        g = jnp.zeros(total + 1, gi.dtype if gi.size else gp.dtype)
        po = p.pose_dx_offsets  # (n_p, bs)
        if gi.shape[0]:
            g = g.at[po[p.pp_ei].reshape(-1)].add(gi.reshape(-1))
            g = g.at[po[p.pp_ej].reshape(-1)].add(gj.reshape(-1))
        if gp.shape[0]:
            # u_lm rows have gp == 0 and pl_pose clamped to 0 — safe to add
            g = g.at[po[p.pl_pose].reshape(-1)].add(gp.reshape(-1))
            lo = p.lm_dx_offsets  # (n_l, dl)
            g = g.at[lo[p.pl_lm].reshape(-1)].add(gle.reshape(-1))
        return g[:total]

    def _hessian_matvec(self, p: SparseSchurPlan, graph, terms, v):
        """H @ v WITHOUT forming H: per-edge block products + anchor term.

        Uses the per-edge Hessian blocks already computed in terms (the
        reference computes these products on the block matrix; here the edge
        list IS the block matrix).  v, result: (state_dim,)."""
        (Hii, Hjj, Hij, gi, gj, Hpp, gp, Dle, gle, B, chi2) = terms
        total = graph.state_dim
        vp = jnp.concatenate([v, jnp.zeros(1, v.dtype)])
        po, lo = p.pose_dx_offsets, p.lm_dx_offsets
        out = jnp.zeros(total + 1, v.dtype)
        if Hii.shape[0]:
            vi = vp[po[p.pp_ei]]  # (n_pp, bs)
            vj = vp[po[p.pp_ej]]
            oi = (jnp.einsum("eij,ej->ei", Hii, vi)
                  + jnp.einsum("eij,ej->ei", Hij, vj))
            oj = (jnp.einsum("eji,ej->ei", Hij, vi)
                  + jnp.einsum("eij,ej->ei", Hjj, vj))
            out = out.at[po[p.pp_ei].reshape(-1)].add(oi.reshape(-1))
            out = out.at[po[p.pp_ej].reshape(-1)].add(oj.reshape(-1))
        if Hpp.shape[0]:
            vpp = vp[po[p.pl_pose]]  # (n_pl, bs)
            vll = vp[lo[p.pl_lm]]  # (n_pl, dl)
            # B == 0 on u_lm rows masks the clamped pl_pose gather
            op = (jnp.einsum("eij,ej->ei", Hpp, vpp)
                  + jnp.einsum("eij,ej->ei", B, vll))
            ol = (jnp.einsum("eji,ej->ei", B, vpp)
                  + jnp.einsum("eij,ej->ei", Dle, vll))
            out = out.at[po[p.pl_pose].reshape(-1)].add(op.reshape(-1))
            out = out.at[lo[p.pl_lm].reshape(-1)].add(ol.reshape(-1))
        if p.anchor_kind != "none" and p.anchor_orig >= 0:
            offs = (po if p.anchor_kind == "pose" else lo)[p.anchor_orig]
            offs = offs[: p.anchor_dim]
            out = out.at[offs].add(p.anchor_info * vp[offs])
        return out[:total]

    def _dogleg_impl(self, p: SparseSchurPlan, v3p, lm_sort, inv_map,
                     graph: GraphArrays, delta, relin_threshold):
        """Powell dogleg with the Schur GN substep and observation-wise H
        matvecs — (new_states, pred, dx_norm, chi2), the PartitionedSolver
        dogleg_step contract; never materializes H
        (reference: NonlinearSolver_Lambda_DL.h:242 over the Schur slot)."""
        terms = self._edge_terms(graph, lm_sort)
        dx_gn, _, chi2, _ = self._solve_from_terms(
            p, v3p, inv_map, graph, terms, 0.0
        )
        g = self._gradient(p, graph, terms)  # same J^T W r sign as assemble_dense
        gTg = jnp.dot(g, g)
        Hg = self._hessian_matvec(p, graph, terms, g)
        gHg = jnp.dot(g, Hg)
        alpha_c = gTg / jnp.maximum(gHg, 1e-300)
        dx_sd = -alpha_c * g

        n_gn = jnp.linalg.norm(dx_gn)
        n_sd = jnp.linalg.norm(dx_sd)

        def blend():
            d = dx_gn - dx_sd
            a = jnp.dot(d, d)
            b = 2.0 * jnp.dot(dx_sd, d)
            c = jnp.dot(dx_sd, dx_sd) - delta * delta
            disc = jnp.sqrt(jnp.maximum(b * b - 4 * a * c, 0.0))
            t = (-b + disc) / jnp.maximum(2 * a, 1e-300)
            return dx_sd + jnp.clip(t, 0.0, 1.0) * d

        dx = jnp.where(
            n_gn <= delta,
            dx_gn,
            jnp.where(
                n_sd >= delta,
                dx_sd * (delta / jnp.maximum(n_sd, 1e-300)),
                blend(),
            ),
        )
        Hdx = self._hessian_matvec(p, graph, terms, dx)
        pred = -(jnp.dot(g, dx) + 0.5 * jnp.dot(dx, Hdx))
        new_states = assembly.apply_update_gated(graph, dx, relin_threshold)
        return new_states, pred, jnp.linalg.norm(dx), chi2

    def damped_step(self, graph: GraphArrays, alpha: float):
        """(new_states, denom, dx_norm, chi2) — PartitionedSolver contract."""
        self.ensure_symbolic()
        fn = self._step_fns.get("damped")
        if fn is None:
            # SparseSchurPlan passes as a jit ARGUMENT (registered pytree,
            # scalars static) so its index tables are runtime buffers; the
            # V3Plan is a plain NamedTuple whose int fields must stay
            # static, so it is closed over (PartitionedSolver pattern)
            v3p = self.v3_plan
            fn = jax.jit(
                lambda plan, lm_sort, inv_map, g, a: self._step_impl(
                    plan, v3p, lm_sort, inv_map, g, a
                )
            )
            self._step_fns["damped"] = fn
        return fn(
            self.plan, self._lm_sort_dev, self._inv_map,
            graph, jnp.asarray(alpha, jnp.float64),
        )

    def dogleg_step(self, graph: GraphArrays, delta, relin_threshold=0.0):
        """(new_states, pred, dx_norm, chi2) — dogleg over the Schur slot."""
        self.ensure_symbolic()
        fn = self._step_fns.get("dogleg")
        if fn is None:
            v3p = self.v3_plan
            fn = jax.jit(
                lambda plan, lm_sort, inv_map, g, d, rt: self._dogleg_impl(
                    plan, v3p, lm_sort, inv_map, g, d, rt
                )
            )
            self._step_fns["dogleg"] = fn
        return fn(
            self.plan, self._lm_sort_dev, self._inv_map, graph,
            jnp.asarray(delta, jnp.float64),
            jnp.asarray(relin_threshold, jnp.float64),
        )

    def gn_step(self, graph: GraphArrays):
        """(new_states, dx_norm, chi2) — GN step (alpha=0)."""
        new_states, _, dxn, chi2 = self.damped_step(graph, 0.0)
        return new_states, dxn, chi2
