"""Public block-sparse matrix container.

Capability parity with the reference's ``CUberBlockMatrix`` public surface
(include/slam/BlockMatrix.h:161) as a library-facing API: append/find blocks,
dense conversion, SpMV, AtA products, scaling/addition, permutation, BSR/CSR
export (BlockMatrixVBR.h analog), MatrixMarket I/O (Save_MatrixMarket), and
sparsity rasterization (Rasterize).

Internally the numeric data is a packed (nnzb, br, bc) array + host index
arrays — the same layout the device kernels consume — so a BlockSparseMatrix
can be handed to jitted code without conversion.  The solver hot paths do
NOT go through this class (they use the purpose-built plans in
core/block_assembly.py); this is the interop/debug/analysis surface.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


class BlockSparseMatrix:
    """Uniform-block sparse matrix (block rows x block cols of (br, bc))."""

    def __init__(self, n_block_rows: int, n_block_cols: int, br: int, bc: int):
        self.nbr, self.nbc = n_block_rows, n_block_cols
        self.br, self.bc = br, bc
        self._slots: Dict[Tuple[int, int], int] = {}
        self._blocks: list = []

    # ------------------------------------------------------------- structure
    def append_block(self, i: int, j: int, block) -> None:
        """Append_Block (BlockMatrix.h:1211): set/accumulate block (i, j)."""
        block = np.asarray(block, float).reshape(self.br, self.bc)
        s = self._slots.get((i, j))
        if s is None:
            self._slots[(i, j)] = len(self._blocks)
            self._blocks.append(block.copy())
        else:
            self._blocks[s] = self._blocks[s] + block

    def find_block(self, i: int, j: int) -> Optional[np.ndarray]:
        """p_FindBlock (BlockMatrix.h:1118)."""
        s = self._slots.get((i, j))
        return None if s is None else self._blocks[s]

    @property
    def nnz_blocks(self) -> int:
        return len(self._blocks)

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.nbr * self.br, self.nbc * self.bc)

    def values(self) -> np.ndarray:
        return np.stack(self._blocks) if self._blocks else np.zeros((0, self.br, self.bc))

    def indices(self) -> Tuple[np.ndarray, np.ndarray]:
        ij = np.array(sorted(self._slots, key=self._slots.get), np.int64)
        if len(ij) == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        return ij[:, 0], ij[:, 1]

    # ------------------------------------------------------------ operations
    def to_dense(self) -> np.ndarray:
        A = np.zeros(self.shape)
        for (i, j), s in self._slots.items():
            A[i * self.br : (i + 1) * self.br, j * self.bc : (j + 1) * self.bc] = self._blocks[s]
        return A

    def matvec(self, x: np.ndarray) -> np.ndarray:
        """SpMV (the PostMultiply family)."""
        x = np.asarray(x, float).reshape(self.nbc, self.bc)
        y = np.zeros((self.nbr, self.br))
        rows, cols = self.indices()
        vals = self.values()
        np.add.at(y, rows, np.einsum("eij,ej->ei", vals, x[cols]))
        return y.reshape(-1)

    def ata(self) -> "BlockSparseMatrix":
        """A^T A (PreMultiplyWithSelfTransposeTo, BlockMatrix.h:2744)."""
        out = BlockSparseMatrix(self.nbc, self.nbc, self.bc, self.bc)
        by_row: Dict[int, list] = {}
        for (i, j), s in self._slots.items():
            by_row.setdefault(i, []).append((j, s))
        for i, entries in by_row.items():
            for ja, sa in entries:
                for jb, sb in entries:
                    if jb < ja:
                        continue
                    out.append_block(ja, jb, self._blocks[sa].T @ self._blocks[sb])
                    if jb != ja:
                        out.append_block(jb, ja, self._blocks[sb].T @ self._blocks[sa])
        return out

    def multiply(self, other: "BlockSparseMatrix") -> "BlockSparseMatrix":
        """GEMM (ProductOf, BlockMatrix.h:2662) — Gustavson row-wise."""
        assert self.nbc == other.nbr and self.bc == other.br
        out = BlockSparseMatrix(self.nbr, other.nbc, self.br, other.bc)
        b_by_row: Dict[int, list] = {}
        for (k, j), s in other._slots.items():
            b_by_row.setdefault(k, []).append((j, s))
        for (i, k), sa in self._slots.items():
            for j, sb in b_by_row.get(k, []):
                out.append_block(i, j, self._blocks[sa] @ other._blocks[sb])
        return out

    # ------------------------------------------------- device (XLA) products
    def ata_device(self) -> "BlockSparseMatrix":
        """A^T A on the accelerator: batched per-pair block GEMMs + one
        grouped segment-sum per destination block.

        The general device block-BLAS the reference gets from
        ``PreMultiplyWithSelfTransposeTo[_FBS_Parallel]``
        (BlockMatrix.h:2744-2795): the host enumerates the contributing
        (slot_a, slot_b) pairs per block-row (the symbolic phase, same
        O(sum deg^2) class as the reference's), the device does ALL the
        arithmetic in two fused programs."""
        by_row: Dict[int, list] = {}
        for (i, j), s in self._slots.items():
            by_row.setdefault(i, []).append((j, s))
        sa_l, sb_l, key_l = [], [], []
        for i, entries in by_row.items():
            for ja, sa in entries:
                for jb, sb in entries:
                    sa_l.append(sa)
                    sb_l.append(sb)
                    key_l.append(ja * self.nbc + jb)
        out = BlockSparseMatrix(self.nbc, self.nbc, self.bc, self.bc)
        if not sa_l:
            return out
        prods = _pair_products_T(
            jnp.asarray(self.values()),
            jnp.asarray(np.asarray(sa_l, np.int32)),
            jnp.asarray(np.asarray(sb_l, np.int32)),
        )
        keys, summed = _reduce_by_dest(np.asarray(key_l, np.int64), prods)
        summed = np.asarray(summed)
        for d, key in enumerate(keys):
            out.append_block(int(key // self.nbc), int(key % self.nbc), summed[d])
        return out

    def multiply_device(self, other: "BlockSparseMatrix") -> "BlockSparseMatrix":
        """GEMM on the accelerator (ProductOf role, BlockMatrix.h:2662):
        host-side Gustavson symbolic pass, device-side batched block GEMMs
        + grouped segment reduction per destination block."""
        assert self.nbc == other.nbr and self.bc == other.br
        b_by_row: Dict[int, list] = {}
        for (k, j), s in other._slots.items():
            b_by_row.setdefault(k, []).append((j, s))
        sa_l, sb_l, key_l = [], [], []
        for (i, k), sa in self._slots.items():
            for j, sb in b_by_row.get(k, ()):
                sa_l.append(sa)
                sb_l.append(sb)
                key_l.append(i * other.nbc + j)
        out = BlockSparseMatrix(self.nbr, other.nbc, self.br, other.bc)
        if not sa_l:
            return out
        prods = _pair_products(
            jnp.asarray(self.values()),
            jnp.asarray(other.values()),
            jnp.asarray(np.asarray(sa_l, np.int32)),
            jnp.asarray(np.asarray(sb_l, np.int32)),
        )
        keys, summed = _reduce_by_dest(np.asarray(key_l, np.int64), prods)
        summed = np.asarray(summed)
        for d, key in enumerate(keys):
            out.append_block(int(key // other.nbc), int(key % other.nbc), summed[d])
        return out

    def add(self, other: "BlockSparseMatrix", factor: float = 1.0) -> "BlockSparseMatrix":
        """AddTo with factor (BlockMatrix.h:2390)."""
        out = BlockSparseMatrix(self.nbr, self.nbc, self.br, self.bc)
        for (i, j), s in self._slots.items():
            out.append_block(i, j, self._blocks[s])
        for (i, j), s in other._slots.items():
            out.append_block(i, j, factor * other._blocks[s])
        return out

    def scale(self, f: float) -> None:
        for s in range(len(self._blocks)):
            self._blocks[s] = self._blocks[s] * f

    def permute(self, row_perm: np.ndarray, col_perm: np.ndarray) -> "BlockSparseMatrix":
        """Block permutation (Permute_UpperTriangular_To analog, general)."""
        inv_r = np.empty_like(row_perm)
        inv_r[row_perm] = np.arange(len(row_perm))
        inv_c = np.empty_like(col_perm)
        inv_c[col_perm] = np.arange(len(col_perm))
        out = BlockSparseMatrix(self.nbr, self.nbc, self.br, self.bc)
        for (i, j), s in self._slots.items():
            out.append_block(int(inv_r[i]), int(inv_c[j]), self._blocks[s])
        return out

    # ---------------------------------------------------------------- export
    def slice_to(self, r0: int, r1: int, c0: int, c1: int) -> "BlockSparseMatrix":
        """Extract the block sub-matrix [r0:r1) x [c0:c1) (SliceTo,
        BlockMatrix.h:2170 — the reference uses it to carve A/U/C out of
        lambda for the Schur solver)."""
        out = BlockSparseMatrix(r1 - r0, c1 - c0, self.br, self.bc)
        for (i, j), s in self._slots.items():
            if r0 <= i < r1 and c0 <= j < c1:
                out.append_block(i - r0, j - c0, self._blocks[s])
        return out

    def to_bsr(self):
        """BSR export (BlockMatrixVBR.h analog) as scipy.sparse.bsr_matrix."""
        from scipy import sparse as sp

        rows, cols = self.indices()
        order = np.lexsort((cols, rows))
        vals = self.values()[order]
        rows, cols = rows[order], cols[order]
        indptr = np.zeros(self.nbr + 1, np.int64)
        np.add.at(indptr, rows + 1, 1)
        indptr = np.cumsum(indptr)
        return sp.bsr_matrix((vals, cols, indptr), shape=self.shape)

    @classmethod
    def from_sparse(cls, A, br: int, bc: int) -> "BlockSparseMatrix":
        """From_Sparse (BlockMatrix.h:1810): cut a scipy matrix into blocks."""
        A = A.tocoo()
        n, m = A.shape
        out = cls((n + br - 1) // br, (m + bc - 1) // bc, br, bc)
        acc: Dict[Tuple[int, int], np.ndarray] = {}
        for r, c, v in zip(A.row, A.col, A.data):
            key = (r // br, c // bc)
            blk = acc.setdefault(key, np.zeros((br, bc)))
            blk[r % br, c % bc] += v
        for (i, j), blk in acc.items():
            out.append_block(i, j, blk)
        return out

    def save_matrix_market(self, path: str) -> None:
        """Save_MatrixMarket (BlockMatrix.h)."""
        from scipy import io as sio

        sio.mmwrite(path, self.to_bsr().tocoo())

    def rasterize(self, path: str) -> None:
        """Sparsity plot (CUberBlockMatrix::Rasterize, BlockMatrix.h:292)."""
        from slampp_tpu.viz.plot import rasterize_block_matrix

        rasterize_block_matrix(self.to_dense(), path)

    def device_arrays(self):
        """(values (nnzb, br, bc), rows, cols) as jnp arrays for jitted use."""
        rows, cols = self.indices()
        return jnp.asarray(self.values()), jnp.asarray(rows, jnp.int32), jnp.asarray(cols, jnp.int32)


# ------------------------------------------------ device product primitives


@jax.jit
def _pair_products_T(vals, sa, sb):
    """(npairs, bc, bc) with pair p = vals[sa[p]]^T @ vals[sb[p]]."""
    return jnp.einsum("eij,eik->ejk", vals[sa], vals[sb])


@jax.jit
def _pair_products(vals_a, vals_b, sa, sb):
    """(npairs, br, bc) with pair p = vals_a[sa[p]] @ vals_b[sb[p]]."""
    return jnp.einsum("eij,ejk->eik", vals_a[sa], vals_b[sb])


@functools.partial(jax.jit, static_argnums=())
def _grouped_sum(prods, plan):
    from slampp_tpu.ops.segments import grouped_segsum_first

    return grouped_segsum_first(prods, plan)


def _reduce_by_dest(keys: np.ndarray, prods):
    """Sum pair products sharing a destination key (device reduction via
    the grouped-segments plan; host does only the sort/unique symbolics)."""
    from slampp_tpu.ops.segments import plan_grouped_segments

    order = np.argsort(keys, kind="stable")
    uniq, starts = np.unique(keys[order], return_index=True)
    ends = np.r_[starts[1:], len(keys)]
    plan = plan_grouped_segments(
        starts, ends, m=len(keys), remap=np.r_[order, len(keys)]
    )
    return uniq, _grouped_sum(prods, plan)
