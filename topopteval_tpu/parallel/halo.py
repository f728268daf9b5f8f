"""Halo-exchange sharded operator: node-partitioned DOFs, boundary-only
collectives.

Round-1's :class:`.sharding.ShardedStiffnessOperator` replicated the DOF
vector and psummed a FULL-length accumulator every matvec — O(ndof)
all-reduce per CG iteration.  This module is the scalable design SURVEY
§2.2 prescribes:

- nodes are partitioned into contiguous slabs along the longest mesh axis
  (one slab per device on the ``elem`` mesh axis); DOF vectors are jax
  arrays SHARDED over that slab layout, so CG carries sharded vectors and
  XLA inserts only scalar psums for the dot products;
- each element belongs to one shard; nodes touched by elements of 2+
  shards are BOUNDARY nodes, stored at the front of their owner's slab;
- one matvec = all_gather(boundary values) → local gather/apply/scatter
  (the same fused Pallas / einsum element kernels as single-device) →
  psum(boundary contributions) → owner adds its slice.  Communication
  per matvec is 2 collectives of size O(boundary) = O(N^(2/3)), not
  O(ndof).

The reference has no distributed layer at all (SURVEY §2.2); the
communication backend here is XLA collectives over ICI inside
``shard_map`` — never host-mediated.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import functools

import jax
import jax.numpy as jnp

# NOTE: these einsums deliberately use DEFAULT matmul precision.
# precision="highest" turns tiny-dim einsums into MXU dot_generals whose
# operand layouts pad the minor dims 3/4 up to (8,128) tiles — a 42x HBM
# blowup that OOMed the 1M-tet hierarchy build (docs/PERF_NOTES.md).  The
# bf16-pass accuracy hazard only matters on CG-path operators; those live
# in parallel/sweep.py and fem/ell.py, which keep precision="highest".
_einsum = jnp.einsum

import numpy as np
from jax.sharding import Mesh as JaxMesh
from jax.sharding import NamedSharding, PartitionSpec as P

from ..mesh import DIM, Mesh
from ..ops.elements import apply_element_stiffness, physical_gradients

ELEM_AXIS = "elem"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class HaloPlan:
    """Host-built partition metadata (NumPy; not a pytree).

    Instances end up as STATIC jit metadata (via HaloShardedOperator's
    aux data), so equality/hash must be array-safe: the dataclass
    default would do elementwise ``==`` on the numpy fields and raise
    the ambiguous-truth-value error on any second distinct-but-equal
    instance reaching the same jitted function.
    """

    n_shards: int
    ns_max: int                 # slab size (nodes) incl. padding
    nbs_max: int                # per-shard boundary count incl. padding
    perm: np.ndarray            # [n_nodes] old node id -> flat slab id
    slab_of: np.ndarray         # [n_nodes] owning shard
    n_boundary: int             # true boundary node count (unpadded)

    @property
    def n_local_dofs(self) -> int:
        return self.n_shards * self.ns_max * DIM

    def __eq__(self, other):
        if not isinstance(other, HaloPlan):
            return NotImplemented
        return (self.n_shards == other.n_shards
                and self.ns_max == other.ns_max
                and self.nbs_max == other.nbs_max
                and self.n_boundary == other.n_boundary
                and np.array_equal(self.perm, other.perm)
                and np.array_equal(self.slab_of, other.slab_of))

    def __hash__(self):
        return hash((self.n_shards, self.ns_max, self.nbs_max,
                     self.n_boundary, self.perm.shape[0]))


def _partition_nodes(mesh: Mesh, n_shards: int) -> Tuple[np.ndarray,
                                                         np.ndarray]:
    """Contiguous slabs along the longest bbox axis; returns
    (owner [n_nodes], order-by-owner-stable permutation basis)."""
    lo, hi = mesh.bounding_box()
    axis = int(np.argmax(hi - lo))
    order = np.argsort(mesh.coords[:, axis], kind="stable")
    owner = np.empty(mesh.n_nodes, dtype=np.int64)
    chunks = np.array_split(order, n_shards)
    for s, chunk in enumerate(chunks):
        owner[chunk] = s
    return owner


@dataclasses.dataclass(frozen=True)
class HaloShardedOperator:
    """Matrix-free K over node-partitioned DOF vectors.

    All leaves live in the permuted/padded layout; use
    :meth:`to_local` / :meth:`from_local` to convert global vectors.
    ``matvec`` has the standard operator contract, so :func:`..fem.solvers.cg`
    drives it unchanged with sharded vectors.
    """

    coords_e: jnp.ndarray     # [S, Ce, k, 3] sharded over elem
    lam: jnp.ndarray          # [S, Ce] sharded
    mu: jnp.ndarray           # [S, Ce] sharded
    gather_idx: jnp.ndarray   # [S, Ce, k] into concat(slab, bnd_table)
    scatter_inc: jnp.ndarray  # [S, NS, D] incidence into [Ce*k] (+sentinel)
    free_mask: jnp.ndarray    # [S*ns_max*3] sharded over slabs
    mesh: JaxMesh = dataclasses.field(metadata={"static": True})
    element_type: str = dataclasses.field(metadata={"static": True})
    order: int = dataclasses.field(metadata={"static": True})
    ns_max: int = dataclasses.field(metadata={"static": True})
    nbs_max: int = dataclasses.field(metadata={"static": True})
    n_shards: int = dataclasses.field(metadata={"static": True})
    use_pallas: bool = dataclasses.field(default=False,
                                         metadata={"static": True})
    plan: HaloPlan = dataclasses.field(default=None,
                                       metadata={"static": True})

    @property
    def n_dofs(self) -> int:
        return self.n_shards * self.ns_max * DIM

    # -- layout conversion ----------------------------------------------------

    def vector_sharding(self):
        return NamedSharding(self.mesh, P(ELEM_AXIS))

    def to_local(self, u_global: np.ndarray) -> jnp.ndarray:
        """[n_dofs_global] → permuted padded sharded [S*ns_max*3]."""
        plan = self.plan
        out = np.zeros(plan.n_local_dofs)
        dofs = (plan.perm[:, None] * DIM + np.arange(DIM)).reshape(-1)
        out[dofs] = np.asarray(u_global).reshape(-1)
        arr = jnp.asarray(out, self.free_mask.dtype)
        return jax.device_put(arr, self.vector_sharding())

    def from_local(self, u_local: jnp.ndarray) -> np.ndarray:
        plan = self.plan
        flat = np.asarray(u_local)
        dofs = (plan.perm[:, None] * DIM + np.arange(DIM)).reshape(-1)
        return flat[dofs]

    # -- core sharded compute --------------------------------------------------

    def _element_apply(self, coords_e, u_e, lam, mu):
        if self.use_pallas and self.element_type == "tet4":
            from ..ops.pallas_kernels import tet4_apply_pallas
            return tet4_apply_pallas(coords_e, u_e, lam, mu)
        if self.use_pallas and self.element_type == "hex8":
            from ..ops.pallas_kernels import hex8_apply_pallas
            return hex8_apply_pallas(coords_e, u_e, lam, mu)
        if self.use_pallas and self.element_type == "tet10":
            from ..ops.pallas_kernels import tet10_apply_pallas
            return tet10_apply_pallas(coords_e, u_e, lam, mu)
        return apply_element_stiffness(coords_e, u_e, lam, mu,
                                       self.element_type, self.order)

    def _local_matvec(self, coords_e, lam, mu, gidx, inc, u_slab):
        """Runs inside shard_map; all args are this shard's blocks with
        the leading shard dim squeezed."""
        nbs3 = self.nbs_max
        u2 = u_slab.reshape(-1, DIM)                      # [ns_max, 3]
        # halo exchange 1: boundary values live at slab[0:nbs_max]
        bnd_all = jax.lax.all_gather(u2[:nbs3], ELEM_AXIS)  # [S, nbs, 3]
        src = jnp.concatenate([u2, bnd_all.reshape(-1, DIM)], axis=0)
        u_e = src[gidx]                                   # [Ce, k, 3]
        f_e = self._element_apply(coords_e, u_e, lam, mu)
        # scatter-free incidence gather into [NS, 3]
        vals = jnp.concatenate(
            [f_e.reshape(-1, DIM),
             jnp.zeros((1, DIM), f_e.dtype)], axis=0)
        acc = jnp.sum(vals[inc], axis=1)                  # [NS, 3]
        f_own = acc[: self.ns_max]
        # halo exchange 2: reduce boundary contributions only
        bnd_sum = jax.lax.psum(acc[self.ns_max:], ELEM_AXIS)  # [S*nbs, 3]
        mine = jax.lax.dynamic_slice_in_dim(
            bnd_sum, jax.lax.axis_index(ELEM_AXIS) * nbs3, nbs3, axis=0)
        f_own = f_own.at[:nbs3].add(mine)
        return f_own.reshape(-1)

    def matvec_raw(self, u: jnp.ndarray) -> jnp.ndarray:
        fn = jax.shard_map(
            lambda ce, l, m, gi, inc, u_: self._local_matvec(
                ce[0], l[0], m[0], gi[0], inc[0], u_),
            mesh=self.mesh,
            in_specs=(P(ELEM_AXIS), P(ELEM_AXIS), P(ELEM_AXIS),
                      P(ELEM_AXIS), P(ELEM_AXIS), P(ELEM_AXIS)),
            out_specs=P(ELEM_AXIS),
            check_vma=False)
        return fn(self.coords_e, self.lam, self.mu, self.gather_idx,
                  self.scatter_inc, u)

    def matvec(self, u: jnp.ndarray) -> jnp.ndarray:
        m = self.free_mask
        return m * self.matvec_raw(m * u) + (1.0 - m) * u

    def __call__(self, u):
        return self.matvec(u)

    # -- preconditioning --------------------------------------------------------

    def _local_blocks(self, coords_e, lam, mu, inc):
        g, wdet = physical_gradients(coords_e, self.element_type,
                                     self.order)
        outer = _einsum("cq,cqka,cqkb->ckab",
                           wdet * lam[:, None], g, g) \
            + _einsum("cq,cqkb,cqka->ckab", wdet * mu[:, None], g, g)
        norm2 = _einsum("cq,cqka,cqka->ck", wdet * mu[:, None], g, g)
        eye = jnp.eye(DIM, dtype=g.dtype)
        blocks = outer + norm2[..., None, None] * eye     # [Ce, k, 3, 3]
        vals = jnp.concatenate(
            [blocks.reshape(-1, DIM * DIM),
             jnp.zeros((1, DIM * DIM), blocks.dtype)], axis=0)
        acc = jnp.sum(vals[inc], axis=1)                  # [NS, 9]
        own = acc[: self.ns_max]
        bnd_sum = jax.lax.psum(acc[self.ns_max:], ELEM_AXIS)
        mine = jax.lax.dynamic_slice_in_dim(
            bnd_sum, jax.lax.axis_index(ELEM_AXIS) * self.nbs_max,
            self.nbs_max, axis=0)
        own = own.at[: self.nbs_max].add(mine)
        return own.reshape(-1)                            # [ns_max*9]

    def node_blocks_raw(self) -> jnp.ndarray:
        """[S*ns_max, 3, 3] node blocks, sharded like the DOF slabs."""
        fn = jax.shard_map(
            lambda ce, l, m, inc: self._local_blocks(ce[0], l[0], m[0],
                                                     inc[0]),
            mesh=self.mesh,
            in_specs=(P(ELEM_AXIS), P(ELEM_AXIS), P(ELEM_AXIS),
                      P(ELEM_AXIS)),
            out_specs=P(ELEM_AXIS),
            check_vma=False)
        out = fn(self.coords_e, self.lam, self.mu, self.scatter_inc)
        return out.reshape(-1, DIM, DIM)

    def block_jacobi(self) -> jnp.ndarray:
        """Sharded inverted 3x3 node blocks (fixed dofs → identity)."""
        from ..fem.solvers import block_jacobi_preconditioner
        return block_jacobi_preconditioner(self.node_blocks_raw(),
                                           self.free_mask)

    def diagonal_raw(self) -> jnp.ndarray:
        blocks = self.node_blocks_raw()
        return jax.vmap(jnp.diag)(blocks).reshape(-1)

    def diagonal(self) -> jnp.ndarray:
        m = self.free_mask
        return m * m * self.diagonal_raw() + (1.0 - m)

    # -- construction -----------------------------------------------------------

    @staticmethod
    def build(mesh: Mesh, lam, mu, device_mesh: JaxMesh,
              free_mask: Optional[np.ndarray] = None,
              dtype=jnp.float32, order: int = 2,
              use_pallas: Optional[bool] = None) -> "HaloShardedOperator":
        S = device_mesh.shape[ELEM_AXIS]
        C = mesh.n_cells
        k = mesh.nodes_per_cell
        conn = mesh.conn.astype(np.int64)
        lam_e = np.broadcast_to(np.asarray(lam, np.float64), (C,))
        mu_e = np.broadcast_to(np.asarray(mu, np.float64), (C,))
        if free_mask is None:
            free_mask = np.ones(mesh.n_dofs)
        free_mask = np.asarray(free_mask, np.float64).reshape(-1)

        owner = _partition_nodes(mesh, S)
        elem_shard = owner[conn[:, 0]]
        # boundary: nodes touched by any element living on a shard other
        # than the node's owner (covers both cross-shard sharing and the
        # all-my-elements-live-elsewhere case)
        touch_min = np.full(mesh.n_nodes, S, np.int64)
        touch_max = np.full(mesh.n_nodes, -1, np.int64)
        es = np.repeat(elem_shard, k)
        np.minimum.at(touch_min, conn.reshape(-1), es)
        np.maximum.at(touch_max, conn.reshape(-1), es)
        touched = touch_max >= 0
        is_bnd = touched & ((touch_min < owner) | (touch_max > owner))

        # slab layout per shard: [owned boundary..., interior..., pad]
        perm = np.empty(mesh.n_nodes, dtype=np.int64)
        nbs = np.zeros(S, dtype=np.int64)
        nown = np.zeros(S, dtype=np.int64)
        slab_pos = np.empty(mesh.n_nodes, dtype=np.int64)
        for s in range(S):
            mine = np.flatnonzero(owner == s)
            b = mine[is_bnd[mine]]
            i = mine[~is_bnd[mine]]
            nbs[s] = b.size
            nown[s] = mine.size
            slab_pos[b] = np.arange(b.size)
            slab_pos[i] = b.size + np.arange(i.size)
        nbs_max = max(int(nbs.max()), 1)
        ns_max = int(nown.max()) if nown.max() else 1
        ns_max = max(ns_max, nbs_max)
        perm = owner * ns_max + slab_pos

        ce_counts = np.bincount(elem_shard, minlength=S)
        ce_max = max(int(ce_counts.max()), 1)

        # gather index space: [slab (ns_max)] ++ [bnd table (S*nbs_max)]
        # boundary-table id of a boundary node:
        bnd_id = owner * nbs_max + slab_pos              # valid where is_bnd
        coords_sh = np.zeros((S, ce_max, k, DIM))
        lam_sh = np.zeros((S, ce_max))
        mu_sh = np.zeros((S, ce_max))
        gidx = np.full((S, ce_max, k), 0, dtype=np.int64)
        inc_list = []
        D_max = 1
        scatter_targets = []
        NS = ns_max + S * nbs_max
        for s in range(S):
            els = np.flatnonzero(elem_shard == s)
            nodes = conn[els]                            # [ce_s, k]
            coords_sh[s, : els.size] = mesh.coords[nodes]
            lam_sh[s, : els.size] = lam_e[els]
            mu_sh[s, : els.size] = mu_e[els]
            own_n = owner[nodes] == s
            g = np.where(own_n, slab_pos[nodes],
                         ns_max + bnd_id[nodes])
            gidx[s, : els.size] = g
            # scatter targets: own interior → slab pos; ANY boundary →
            # boundary space (ns_max + bnd_id); own non-boundary → slab
            tgt = np.where(is_bnd[nodes], ns_max + bnd_id[nodes],
                           slab_pos[nodes])
            # pad elements scatter to a sentinel row (dropped)
            full = np.full((ce_max, k), NS, dtype=np.int64)
            full[: els.size] = tgt
            scatter_targets.append(full)

        # build equal-width incidence tables [NS, D] per shard
        for s in range(S):
            flat = scatter_targets[s].reshape(-1)
            srt = np.argsort(flat, kind="stable")        # sentinels last
            sorted_t = flat[srt]
            starts = np.searchsorted(sorted_t, np.arange(NS), "left")
            ends = np.searchsorted(sorted_t, np.arange(NS), "right")
            deg = ends - starts
            D_max = max(D_max, int(deg.max()) if deg.size else 1)
            inc_list.append((srt, deg))
        M = ce_max * k
        inc = np.full((S, NS, D_max), M, dtype=np.int64)
        for s in range(S):
            srt, deg = inc_list[s]
            if not deg.sum():
                continue
            col = np.concatenate([np.arange(d) for d in deg])
            rows = np.repeat(np.arange(NS), deg)
            inc[s, rows, col] = srt[: deg.sum()]

        # permuted free mask / padding (pad slab slots are fixed)
        mask_l = np.zeros(S * ns_max * DIM)
        dofs = (perm[:, None] * DIM + np.arange(DIM)).reshape(-1)
        mask_l[dofs] = free_mask
        plan = HaloPlan(n_shards=S, ns_max=ns_max, nbs_max=nbs_max,
                        perm=perm, slab_of=owner,
                        n_boundary=int(is_bnd.sum()))

        if use_pallas is None:
            use_pallas = (jax.default_backend() == "tpu"
                          and mesh.element_type in ("tet4", "hex8",
                                                    "tet10")
                          and dtype in (jnp.float32, jnp.bfloat16))

        elem_sh = NamedSharding(device_mesh, P(ELEM_AXIS))
        put = jax.device_put
        return HaloShardedOperator(
            coords_e=put(jnp.asarray(coords_sh, dtype), elem_sh),
            lam=put(jnp.asarray(lam_sh, dtype), elem_sh),
            mu=put(jnp.asarray(mu_sh, dtype), elem_sh),
            gather_idx=put(jnp.asarray(gidx.astype(np.int32)), elem_sh),
            scatter_inc=put(jnp.asarray(inc.astype(np.int32)), elem_sh),
            free_mask=put(jnp.asarray(mask_l, dtype),
                          NamedSharding(device_mesh, P(ELEM_AXIS))),
            mesh=device_mesh, element_type=mesh.element_type, order=order,
            ns_max=ns_max, nbs_max=nbs_max, n_shards=S,
            use_pallas=bool(use_pallas), plan=plan)


def _halo_flatten(op: HaloShardedOperator):
    return ((op.coords_e, op.lam, op.mu, op.gather_idx, op.scatter_inc,
             op.free_mask),
            (op.mesh, op.element_type, op.order, op.ns_max, op.nbs_max,
             op.n_shards, op.use_pallas, op.plan))


def _halo_unflatten(aux, leaves):
    return HaloShardedOperator(*leaves, *aux)


jax.tree_util.register_pytree_node(HaloShardedOperator, _halo_flatten,
                                   _halo_unflatten)
