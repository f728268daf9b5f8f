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
