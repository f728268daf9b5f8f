"""ELL block-row sparse operator for Galerkin-coarsened levels.

Coarse multigrid levels for arbitrary imported meshes are true Galerkin
operators A_c = P^T A P (fem/multigrid.py builds them by colored probing
of the matrix-free fine operator).  They are stored in a fixed-width
block-ELL layout tuned to what TPU lowers fast (docs/PERF_NOTES.md):

- ``cols [N, D]``: neighbor *node* ids per node row, sentinel ``N`` padding
- ``blocks [N*D, 9]``: 3x3 coupling blocks, flattened to 2D — 4D argument
  arrays fed through jit into while_loop bodies miscompiled on the axon
  TPU backend (tools/tpu_check_struct10.py), so leaves stay <= 2D and the
  matvec reshapes internally.

The matvec is a node-row gather (``u2[cols]`` — the [1,3]-slice layout
that runs at bandwidth) + a batched 3x3 block contraction; no scatter.

Reference context: the reference assembles one global CSC matrix and
factorizes it (FiniteElementAnalysis.jl:181, 547); here sparse matrices
exist only on coarse levels, Galerkin-projected, and are applied
matrix-explicitly in HBM.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import functools

import jax
import jax.numpy as jnp

# NOTE: all physics einsums pin precision="highest" — the TPU default
# allows bf16 passes, which silently corrupts fp32 CG/energies at SIMP
# contrast (docs/PERF_NOTES.md; reproduced round 2 on the sweep lanes:
# TPU oracle err 8e-3 vs CPU fp32 6e-5 until pinned).
_einsum = functools.partial(jnp.einsum, precision="highest")

import numpy as np


@dataclasses.dataclass(frozen=True)
class ELLBlockOperator:
    """Constrained block-ELL operator A'(u) = m*A(m*u) + (1-m)*u."""

    cols: jnp.ndarray        # [N, D] int32, sentinel N = zero row
    blocks: jnp.ndarray      # [N*D, 9] (3x3 blocks, row-major)
    free_mask: jnp.ndarray   # [3N]
    n_nodes: int = dataclasses.field(metadata={"static": True})
    width: int = dataclasses.field(metadata={"static": True})

    @property
    def n_dofs(self) -> int:
        return 3 * self.n_nodes

    def matvec_raw(self, u: jnp.ndarray) -> jnp.ndarray:
        # width-chunked: a full [N, D, 3] gather pads the minor dim 3 to
        # 128 on TPU (42x transient expansion; D reaches ~100 on level-1
        # Galerkin operators), so apply 8 block-columns at a time
        N, D = self.n_nodes, self.width
        u2 = jnp.concatenate([u.reshape(N, 3),
                              jnp.zeros((1, 3), u.dtype)], axis=0)
        B = self.blocks.reshape(N, D, 3, 3)
        out = None
        for s in range(0, D, 8):
            rows = u2[self.cols[:, s:s + 8]]        # [N, <=8, 3]
            term = _einsum("ndab,ndb->na", B[:, s:s + 8], rows)
            out = term if out is None else out + term
        return out.reshape(-1)

    def matvec(self, u: jnp.ndarray) -> jnp.ndarray:
        m = self.free_mask
        return m * self.matvec_raw(m * u) + (1.0 - m) * u

    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        return self.matvec(u)

    # -- preconditioning ------------------------------------------------------

    def node_blocks_raw(self) -> jnp.ndarray:
        """Diagonal 3x3 blocks [N, 3, 3] (cols[:, j] == row index);
        width-chunked for the same TPU padding reason as matvec_raw."""
        N, D = self.n_nodes, self.width
        B = self.blocks.reshape(N, D, 3, 3)
        rowids = jnp.arange(N, dtype=self.cols.dtype)[:, None]
        out = None
        for s in range(0, D, 8):
            is_diag = self.cols[:, s:s + 8] == rowids
            term = jnp.sum(jnp.where(is_diag[:, :, None, None],
                                     B[:, s:s + 8], 0.0), axis=1)
            out = term if out is None else out + term
        return out

    def diagonal_raw(self) -> jnp.ndarray:
        return jax.vmap(jnp.diag)(self.node_blocks_raw()).reshape(-1)

    def diagonal(self) -> jnp.ndarray:
        m = self.free_mask
        return m * m * self.diagonal_raw() + (1.0 - m)

    # -- host conversions -----------------------------------------------------

    @staticmethod
    def from_block_rows(cols_np: np.ndarray, blocks_np: np.ndarray,
                        free_mask: np.ndarray, dtype) -> "ELLBlockOperator":
        """cols [N, D] (sentinel N), blocks [N, D, 3, 3] NumPy → operator."""
        N, D = cols_np.shape
        return ELLBlockOperator(
            cols=jnp.asarray(cols_np.astype(np.int32)),
            blocks=jnp.asarray(blocks_np.reshape(N * D, 9), dtype),
            free_mask=jnp.asarray(np.asarray(free_mask).reshape(-1), dtype),
            n_nodes=int(N), width=int(D))

    @staticmethod
    def from_scipy_bsr(A_bsr, free_mask: np.ndarray,
                       dtype) -> "ELLBlockOperator":
        """scipy BSR (blocksize 3x3) → ELL, dropping explicit zero blocks."""
        A_bsr = A_bsr.tobsr(blocksize=(3, 3))
        A_bsr.sort_indices()
        N = A_bsr.shape[0] // 3
        indptr, indices, data = A_bsr.indptr, A_bsr.indices, A_bsr.data
        counts = indptr[1:] - indptr[:-1]
        D = max(int(counts.max()) if N else 1, 1)
        cols = np.full((N, D), N, dtype=np.int64)
        blocks = np.zeros((N, D, 3, 3), dtype=np.float64)
        slot = np.concatenate([np.arange(c) for c in counts]) \
            if counts.sum() else np.zeros(0, np.int64)
        rows = np.repeat(np.arange(N), counts)
        cols[rows, slot] = indices
        blocks[rows, slot] = data
        return ELLBlockOperator.from_block_rows(cols, blocks, free_mask,
                                                dtype)

    def to_scipy_bsr(self):
        """ELL → scipy BSR (fp64) of the RAW (unconstrained) operator."""
        import scipy.sparse as sp

        N, D = self.n_nodes, self.width
        cols = np.asarray(self.cols)
        blocks = np.asarray(self.blocks, np.float64).reshape(N, D, 3, 3)
        valid = cols < N
        rows = np.repeat(np.arange(N), D).reshape(N, D)[valid]
        cc = cols[valid]
        data = blocks[valid]                        # [nnzb, 3, 3]
        ii = (3 * rows[:, None, None] + np.arange(3)[None, :, None])
        jj = (3 * cc[:, None, None] + np.arange(3)[None, None, :])
        K = sp.coo_matrix(
            (data.reshape(-1),
             (np.broadcast_to(ii, data.shape).reshape(-1),
              np.broadcast_to(jj, data.shape).reshape(-1))),
            shape=(3 * N, 3 * N)).tocsr()
        return K

    def to_dense_constrained(self) -> np.ndarray:
        """Dense fp64 M K M + (I - M) (for the coarsest-level inverse)."""
        K = self.to_scipy_bsr().toarray()
        m = np.asarray(self.free_mask, np.float64)
        return m[:, None] * K * m[None, :] + np.diag(1.0 - m)


jax.tree_util.register_pytree_node(
    ELLBlockOperator,
    lambda o: ((o.cols, o.blocks, o.free_mask), (o.n_nodes, o.width)),
    lambda aux, leaves: ELLBlockOperator(*leaves, aux[0], aux[1]))
