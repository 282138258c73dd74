"""Recursive sparse marginals on the block factor (block Takahashi).

Capability parity with the reference's ICRA'15 algorithm
(``Calculate_DenseMarginals_Recurrent_FBS``, include/slam/Marginals.h:1694,
kernel :931): compute the covariance ONLY on the sparsity pattern of the
factor L, by the block Takahashi recurrences processed in reverse
elimination order:

    W_j        = L[R_j, j] L[j,j]^-1
    Sigma[i,j] = - Sigma[i, R_j] W_j          (i in R_j)
    Sigma[j,j] = L[j,j]^-T L[j,j]^-1 - W_j^T Sigma[R_j, j]

All Sigma blocks referenced live on L's own pattern (the filled graph's
clique property), so Sigma shares the packed (diag | offd) layout of the v2
engine and the computation reuses its scatter-free machinery: reverse-level
scan, contiguous window writes, prefix-sum segment reductions, gathers only.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from slampp_tpu.core.sparse_chol2 import PlanV2, _segsum
from slampp_tpu.ops import small_blocks

HI = lax.Precision.HIGHEST


class TakahashiPlan(NamedTuple):
    max_tk: int  # max recurrence triples per level
    # triples (grouped by level, sorted by dst offd slot):
    #   dst Sigma[r1, j] (this level's offd slots) <-
    #       sum_r2 Sigma(r1, r2) @ W(r2, j)
    tk_src_sigma: jnp.ndarray  # (n_levels, max_tk) packed Sigma slot id
    tk_src_w: jnp.ndarray  # (n_levels, max_tk) LOCAL offd id of W(r2, j)
    tk_transpose: jnp.ndarray  # (n_levels, max_tk) bool: use Sigma^T
    tk_starts: jnp.ndarray  # (n_levels, max_off)
    tk_ends: jnp.ndarray  # (n_levels, max_off)
    # diag correction: Sigma[j,j] -= W(r,j)^T Sigma[r,j], segments by column
    dg_starts: jnp.ndarray  # (n_levels, max_cols) into the level's offd range
    dg_ends: jnp.ndarray  # (n_levels, max_cols)


def _tk_flatten(p):
    return tuple(getattr(p, f) for f in TakahashiPlan._fields[1:]), (p.max_tk,)


def _tk_unflatten(aux, leaves):
    return TakahashiPlan(aux[0], *leaves)


jax.tree_util.register_pytree_node(TakahashiPlan, _tk_flatten, _tk_unflatten)


def takahashi_plan(plan: PlanV2) -> TakahashiPlan:
    """Host planning from the factor's own pattern (plan.rows/cols)."""
    n, n_off = plan.n, plan.n_off
    rows = plan.rows[n:]
    cols = plan.cols[n:]
    slot_of = {}
    col_rows: List[List[int]] = [[] for _ in range(n)]
    for k in range(n_off):
        i, j = int(rows[k]), int(cols[k])
        slot_of[(i, j)] = k
        col_rows[j].append(i)

    col_start = np.asarray(plan.lvl_col_start)
    ncols = np.asarray(plan.lvl_ncols)
    off_start = np.asarray(plan.lvl_off_start)
    noff = np.asarray(plan.lvl_noff)
    n_levels = plan.n_levels

    tk_sigma_rows, tk_w_rows, tk_tr_rows = [], [], []
    tk_st_rows, tk_en_rows = [], []
    dg_st_rows, dg_en_rows = [], []
    for lv in range(n_levels):
        triples = []  # (dst_local, sigma_slot, w_local, transpose)
        for si in range(int(noff[lv])):
            gid = int(off_start[lv]) + si
            j = int(cols[gid])
            r1 = int(rows[gid])
            for r2 in col_rows[j]:
                # LOCAL W index within this level's off-slot window
                w_local = slot_of[(r2, j)] - int(off_start[lv])
                if r1 == r2:
                    sslot = r2  # diag Sigma slot (packed id = column)
                    tr = False
                elif (r1, r2) in slot_of:
                    sslot = n + slot_of[(r1, r2)]
                    tr = False
                else:
                    sslot = n + slot_of[(r2, r1)]
                    tr = True
                triples.append((si, sslot, w_local, tr))
        triples.sort(key=lambda t: t[0])
        tk_sigma_rows.append(np.array([t[1] for t in triples], np.int64))
        tk_w_rows.append(np.array([t[2] for t in triples], np.int64))
        tk_tr_rows.append(np.array([t[3] for t in triples], bool))
        st = np.zeros(int(noff[lv]), np.int64)
        en = np.zeros(int(noff[lv]), np.int64)
        pos = 0
        for si in range(int(noff[lv])):
            st[si] = pos
            while pos < len(triples) and triples[pos][0] == si:
                pos += 1
            en[si] = pos
        tk_st_rows.append(st)
        tk_en_rows.append(en)
        # diag segments: the level's offd slots grouped by column (same
        # boundaries as the backward-solve grouping)
        st2 = np.zeros(int(ncols[lv]), np.int64)
        en2 = np.zeros(int(ncols[lv]), np.int64)
        pos = 0
        for ci in range(int(ncols[lv])):
            col = int(col_start[lv]) + ci
            st2[ci] = pos
            while pos < int(noff[lv]) and int(cols[int(off_start[lv]) + pos]) == col:
                pos += 1
            en2[ci] = pos
        dg_st_rows.append(st2)
        dg_en_rows.append(en2)

    max_tk = max(1, max((len(r) for r in tk_sigma_rows), default=1))

    def pad(rows_, width, fill, dtype=np.int64):
        out = np.full((len(rows_), width), fill, dtype)
        for i, r in enumerate(rows_):
            out[i, : len(r)] = r
        return jnp.asarray(out, jnp.int32 if dtype == np.int64 else bool)

    return TakahashiPlan(
        max_tk=max_tk,
        tk_src_sigma=pad(tk_sigma_rows, max_tk, n + n_off),
        tk_src_w=pad(tk_w_rows, max_tk, plan.max_off),
        tk_transpose=pad(tk_tr_rows, max_tk, 0, bool),
        tk_starts=pad(tk_st_rows, plan.max_off, 0),
        tk_ends=pad(tk_en_rows, plan.max_off, 0),
        dg_starts=pad(dg_st_rows, plan.max_cols, 0),
        dg_ends=pad(dg_en_rows, plan.max_cols, 0),
    )


def sparse_marginals(plan: PlanV2, tk: TakahashiPlan, Ld: jnp.ndarray, Loff: jnp.ndarray):
    """Covariance blocks on the factor pattern.

    Inputs: factorize2 output.  Returns (Sigma_diag (n, P, P) full symmetric
    blocks, Sigma_off (n_off, P, P) blocks at the L pattern positions).
    """
    n, n_off, P = plan.n, plan.n_off, Ld.shape[-1]
    eye = jnp.eye(P, dtype=Ld.dtype)
    # packed Sigma: [diag | offd | overhang padding] — the padding must cover
    # the largest window overhang or dynamic_update_slice CLAMPS the start
    # index and corrupts neighboring slots
    S = jnp.zeros((n + n_off + max(plan.max_off, plan.max_cols) + 1, P, P), Ld.dtype)
    Dp = jnp.concatenate([Ld, jnp.broadcast_to(eye, (plan.max_cols, P, P))], 0)
    Op = jnp.concatenate([Loff, jnp.zeros((plan.max_off + 1, P, P), Ld.dtype)], 0)

    def step(S, idx):
        (cs, nc, os_, no, colpos, tk_ss, tk_sw, tk_tr, tk_st, tk_en, dg_st, dg_en) = idx
        colmask3 = (jnp.arange(plan.max_cols) < nc)[:, None, None]
        offmask3 = (jnp.arange(plan.max_off) < no)[:, None, None]
        # level windows of L
        Lw = lax.dynamic_slice(Dp, (cs, jnp.int32(0), jnp.int32(0)), (plan.max_cols, P, P))
        Lw = jnp.where(colmask3, Lw, eye[None])
        Ow = lax.dynamic_slice(Op, (os_, jnp.int32(0), jnp.int32(0)), (plan.max_off, P, P))
        Ow = jnp.where(offmask3, Ow, 0.0)
        # W = L[R_j, j] Ljj^-1  (solve X Ljj = L[R_j, j]; Ljj lower) —
        # equivalently X = solve_triangular_right with L^T? We need X Ljj =
        # B -> X = B Ljj^-1; column-unrolled lower-triangular right-solve:
        W = _solve_right_lower(Ow, Lw[colpos])
        # Sigma[r1, j] = - sum_r2 Sigma(r1, r2) W(r2, j)
        Wg = jnp.concatenate([W, jnp.zeros((1, P, P), W.dtype)], 0)
        src_sig = S[tk_ss]
        src_sig = jnp.where(tk_tr[:, None, None], jnp.swapaxes(src_sig, 1, 2), src_sig)
        prod = -jnp.einsum("eij,ejk->eik", src_sig, Wg[tk_sw], precision=HI)
        cum0 = jnp.concatenate([jnp.zeros((1, P, P), prod.dtype), jnp.cumsum(prod, 0)], 0)
        Soff_lvl = _segsum(cum0, tk_st, tk_en)  # (max_off, P, P)
        Soff_lvl = jnp.where(offmask3, Soff_lvl, 0.0)
        S = lax.dynamic_update_slice(
            S,
            jnp.where(
                offmask3,
                Soff_lvl,
                lax.dynamic_slice(S, (jnp.int32(n) + os_, jnp.int32(0), jnp.int32(0)), (plan.max_off, P, P)),
            ),
            (jnp.int32(n) + os_, jnp.int32(0), jnp.int32(0)),
        )
        # Sigma[j,j] = Ljj^-T Ljj^-1 - W^T Sigma[R_j, j]
        Linv_cols = _lower_inverse(Lw)  # (max_cols, P, P) = Ljj^-1
        base = jnp.einsum("cji,cjk->cik", Linv_cols, Linv_cols, precision=HI)
        corr_e = jnp.einsum("eji,ejk->eik", W, Soff_lvl, precision=HI)
        cum2 = jnp.concatenate([jnp.zeros((1, P, P), corr_e.dtype), jnp.cumsum(corr_e, 0)], 0)
        corr = _segsum(cum2, dg_st, dg_en)  # (max_cols, P, P)
        Sdiag_lvl = base - corr
        Sd_old = lax.dynamic_slice(S, (cs, jnp.int32(0), jnp.int32(0)), (plan.max_cols, P, P))
        S = lax.dynamic_update_slice(
            S, jnp.where(colmask3, Sdiag_lvl, Sd_old), (cs, jnp.int32(0), jnp.int32(0))
        )
        return S, None

    rev = lambda a: jnp.flip(a, 0)
    S, _ = lax.scan(
        step,
        S,
        (
            rev(plan.lvl_col_start),
            rev(plan.lvl_ncols),
            rev(plan.lvl_off_start),
            rev(plan.lvl_noff),
            rev(plan.off_colpos),
            rev(tk.tk_src_sigma),
            rev(tk.tk_src_w),
            rev(tk.tk_transpose),
            rev(tk.tk_starts),
            rev(tk.tk_ends),
            rev(tk.dg_starts),
            rev(tk.dg_ends),
        ),
    )
    return S[:n], S[n : n + n_off]


def _solve_right_lower(B, L):
    """Batched X = B @ L^-1 for lower-triangular L, unrolled/blocked:
    X L = B -> columns forward: X[:, j] = (B[:, j] - sum_{k>j} X[:, k] L[k, j]) / L[j, j]
    (note L lower: B = X L means B[:, j] = sum_{k>=j} X[:, k] L[k, j])."""
    bs = L.shape[-1]
    X = [None] * bs
    for j in reversed(range(bs)):
        v = B[..., :, j]
        for k in range(j + 1, bs):
            v = v - X[k] * L[..., k, j][..., None]
        X[j] = v / L[..., j, j][..., None]
    return jnp.stack(X, axis=-1)


def _lower_inverse(L):
    """Batched inverse of lower-triangular blocks (columns of I solved)."""
    bs = L.shape[-1]
    cols = []
    for j in range(bs):
        e = jnp.zeros(L.shape[:-1], L.dtype).at[..., j].set(1.0)
        cols.append(small_blocks.solve_lower_blocked(L, e))
    return jnp.stack(cols, axis=-1)
