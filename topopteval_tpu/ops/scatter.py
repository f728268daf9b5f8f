"""Gather/scatter plans for element↔global DOF data movement.

TPU-native replacement for the reference's Ferrite CSC assembler scatter
(reference: src/FiniteElementAnalysis/FiniteElementAnalysis.jl:246): element
contributions are summed into global DOF vectors with
``jax.ops.segment_sum`` over a *presorted* contribution layout precomputed
once per mesh on the host — sorted segment ids let XLA lower to a
contiguous, atomics-free reduction (SURVEY.md §7 hard part 2).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ScatterPlan:
    """Precomputed sorted-scatter plan: flat element-DOF slots → global DOFs.

    ``perm`` reorders the flattened per-element contribution vector so its
    target DOF ids (``segments``) are nondecreasing.
    """

    perm: jnp.ndarray        # [C*ek] int32 sort permutation
    segments: jnp.ndarray    # [C*ek] int32 sorted target dof ids
    edofs: jnp.ndarray       # [C, ek] int32 element dof matrix (gather index)
    n_dofs: int = dataclasses.field(metadata={"static": True})

    @staticmethod
    def build(edofs_np: np.ndarray, n_dofs: int) -> "ScatterPlan":
        flat = edofs_np.reshape(-1).astype(np.int64)
        perm = np.argsort(flat, kind="stable")
        return ScatterPlan(
            perm=jnp.asarray(perm.astype(np.int32)),
            segments=jnp.asarray(flat[perm].astype(np.int32)),
            edofs=jnp.asarray(edofs_np.astype(np.int32)),
            n_dofs=int(n_dofs),
        )

    # -- device ops ---------------------------------------------------------

    def gather(self, u: jnp.ndarray) -> jnp.ndarray:
        """Global vector [ndof] → element batch [C, ek]."""
        return u[self.edofs]

    def scatter_add(self, contrib: jnp.ndarray) -> jnp.ndarray:
        """Element batch [C, ek] → global vector [ndof] via sorted segsum."""
        vals = contrib.reshape(-1)[self.perm]
        return jax.ops.segment_sum(
            vals, self.segments, num_segments=self.n_dofs,
            indices_are_sorted=True)


def _sp_flatten(p: ScatterPlan):
    return (p.perm, p.segments, p.edofs), (p.n_dofs,)


def _sp_unflatten(aux, leaves):
    perm, segments, edofs = leaves
    return ScatterPlan(perm, segments, edofs, aux[0])


jax.tree_util.register_pytree_node(ScatterPlan, _sp_flatten, _sp_unflatten)


@dataclasses.dataclass(frozen=True)
class RowScatterPlan:
    """Node-row gather/scatter plan in TPU-friendly layouts.

    TPU profiling (tools/tpu_bisect5/6) showed XLA lowers flat dof gathers
    ``u[edofs]`` and ``segment_sum`` scatters to near-scalar code on TPU,
    while *row* gathers ``u2d[conn]`` (slice size [1,3]) run at bandwidth.
    This plan keeps all DOF traffic row-shaped and scatter-free:

    - gather: ``u.reshape(N,3)[conn]`` → [C, k, 3]
    - scatter: precomputed node→contribution incidence table padded to the
      max node degree; the scatter-add becomes a row *gather* + sum over
      the (static) degree axis.  Exact summation — no cumsum cancellation.
    """

    incidence: jnp.ndarray   # [N, D] int32 indices into flat [C*k] (+1 pad)
    conn: jnp.ndarray        # [C, k] int32
    n_nodes: int = dataclasses.field(metadata={"static": True})

    @staticmethod
    def build(conn_np: np.ndarray, n_nodes: int) -> "RowScatterPlan":
        flat = conn_np.reshape(-1).astype(np.int64)
        M = flat.size
        perm = np.argsort(flat, kind="stable")
        sorted_nodes = flat[perm]
        starts = np.searchsorted(sorted_nodes, np.arange(n_nodes), "left")
        ends = np.searchsorted(sorted_nodes, np.arange(n_nodes), "right")
        degree = ends - starts
        D = max(int(degree.max()) if len(degree) else 1, 1)
        # sentinel M points at an appended zero row
        inc = np.full((n_nodes, D), M, dtype=np.int64)
        col = np.concatenate([np.arange(d) for d in degree]) \
            if degree.sum() else np.zeros(0, np.int64)
        rows = np.repeat(np.arange(n_nodes), degree)
        inc[rows, col] = perm
        return RowScatterPlan(
            incidence=jnp.asarray(inc.astype(np.int32)),
            conn=jnp.asarray(conn_np.astype(np.int32)),
            n_nodes=int(n_nodes))

    @property
    def max_degree(self) -> int:
        return self.incidence.shape[1]

    def gather(self, u: jnp.ndarray) -> jnp.ndarray:
        """[ndof] or [N,3] → element rows [C, k, 3]."""
        return u.reshape(-1, 3)[self.conn]

    def scatter_add(self, contrib: jnp.ndarray) -> jnp.ndarray:
        """Element rows [C, k, 3] → node rows [N, 3], gather-only."""
        vals = contrib.reshape(-1, 3)
        vals = jnp.concatenate(
            [vals, jnp.zeros((1, 3), contrib.dtype)], axis=0)
        return jnp.sum(vals[self.incidence], axis=1)


jax.tree_util.register_pytree_node(
    RowScatterPlan,
    lambda p: ((p.incidence, p.conn), (p.n_nodes,)),
    lambda aux, leaves: RowScatterPlan(*leaves, aux[0]))
