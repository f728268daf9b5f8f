"""Multi-chip sharding: element-sharded matrix-free operator over a device
mesh.

The reference is single-process/single-device (SURVEY.md §2.2: no
parallelism layer, no communication backend anywhere).  The TPU-native
scaling story built here:

- the "model" is the finite-element mesh; **tensor parallelism** = sharding
  the element batch across devices, with a ``psum`` over the element axis
  reducing shard-boundary node contributions (the halo reduction);
- **data parallelism** = vmapped design sweeps (density fields × load
  cases) sharded over a separate mesh axis (see sweep.py);
- collectives are XLA ``psum`` over ICI inside ``shard_map`` — never
  host-mediated.

The sharded operator is a pytree with the same ``.matvec`` contract as the
single-device :class:`..fem.operator.StiffnessOperator`, so the identical
``cg``/``minres`` loops drive it unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh as JaxMesh
from jax.sharding import NamedSharding, PartitionSpec as P

from ..mesh import DIM, Mesh
from ..ops.elements import apply_element_stiffness, physical_gradients

ELEM_AXIS = "elem"
DATA_AXIS = "data"


def build_device_mesh(n_devices: Optional[int] = None,
                      data_parallel: int = 1,
                      devices: Optional[Sequence] = None) -> JaxMesh:
    """1D or 2D (data, elem) device mesh over the available chips."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    if n % data_parallel:
        raise ValueError(f"{n} devices not divisible by dp={data_parallel}")
    arr = np.array(devices[:n]).reshape(data_parallel, n // data_parallel)
    return JaxMesh(arr, (DATA_AXIS, ELEM_AXIS))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class ShardedStiffnessOperator:
    """Element-sharded matrix-free K over a device mesh.

    Leaves: ``coords``/``free_mask`` replicated; ``conn``/``lam``/``mu``
    sharded along the element axis.  ``matvec`` gathers from the replicated
    displacement vector, applies the local element batch, scatters into a
    full-length local accumulator and ``psum``s across the element axis —
    the halo-exchange pattern for nodes shared between shards
    (SURVEY.md §2.2 TP row).
    """

    coords: jnp.ndarray       # [Np, 3] replicated
    conn: jnp.ndarray         # [Cp, k] sharded over elem
    lam: jnp.ndarray          # [Cp] sharded
    mu: jnp.ndarray           # [Cp] sharded
    free_mask: jnp.ndarray    # [ndof_p] replicated
    mesh: JaxMesh = dataclasses.field(metadata={"static": True})
    element_type: str = dataclasses.field(metadata={"static": True})
    order: int = dataclasses.field(metadata={"static": True})

    @property
    def n_dofs(self) -> int:
        return DIM * self.coords.shape[0]

    # -- construction -------------------------------------------------------

    @staticmethod
    def build(mesh: Mesh, lam, mu, device_mesh: JaxMesh,
              free_mask: Optional[np.ndarray] = None,
              dtype=jnp.float32, order: int = 2
              ) -> "ShardedStiffnessOperator":
        ep = device_mesh.shape[ELEM_AXIS]
        C = mesh.n_cells
        Cp = _round_up(C, ep)
        lam_a = np.zeros(Cp)
        lam_a[:C] = np.broadcast_to(np.asarray(lam, np.float64), (C,))
        mu_a = np.zeros(Cp)
        mu_a[:C] = np.broadcast_to(np.asarray(mu, np.float64), (C,))
        conn = np.zeros((Cp, mesh.nodes_per_cell), dtype=np.int32)
        conn[:C] = mesh.conn
        if free_mask is None:
            free_mask = np.ones(mesh.n_dofs)

        elem_sh = NamedSharding(device_mesh, P(ELEM_AXIS))
        repl = NamedSharding(device_mesh, P())
        put = jax.device_put
        return ShardedStiffnessOperator(
            coords=put(jnp.asarray(mesh.coords, dtype), repl),
            conn=put(jnp.asarray(conn), elem_sh),
            lam=put(jnp.asarray(lam_a, dtype), elem_sh),
            mu=put(jnp.asarray(mu_a, dtype), elem_sh),
            free_mask=put(jnp.asarray(free_mask, dtype), repl),
            mesh=device_mesh, element_type=mesh.element_type, order=order)

    # -- application --------------------------------------------------------

    def _local_apply(self, coords, conn, lam, mu, u):
        """Per-shard element apply + local scatter (runs inside shard_map
        with the shard's element slice)."""
        k = conn.shape[1]
        edofs = (conn[:, :, None] * DIM
                 + jnp.arange(DIM, dtype=conn.dtype)).reshape(-1, k * DIM)
        u_e = u[edofs].reshape(-1, k, DIM)
        f_e = apply_element_stiffness(coords[conn], u_e, lam, mu,
                                      self.element_type, self.order)
        f_loc = jnp.zeros_like(u).at[edofs.reshape(-1)].add(
            f_e.reshape(-1))
        return jax.lax.psum(f_loc, ELEM_AXIS)

    def matvec_raw(self, u: jnp.ndarray) -> jnp.ndarray:
        fn = jax.shard_map(
            lambda c, cn, l, m, u_: self._local_apply(c, cn, l, m, u_),
            mesh=self.mesh,
            in_specs=(P(), P(ELEM_AXIS), P(ELEM_AXIS), P(ELEM_AXIS), P()),
            out_specs=P(),
            check_vma=False)
        return fn(self.coords, self.conn, self.lam, self.mu, u)

    def matvec(self, u: jnp.ndarray) -> jnp.ndarray:
        m = self.free_mask
        return m * self.matvec_raw(m * u) + (1.0 - m) * u

    # -- preconditioning ----------------------------------------------------

    def diagonal_raw(self) -> jnp.ndarray:
        def local(coords, conn, lam, mu, mask):
            g, wdet = physical_gradients(coords[conn], self.element_type,
                                         self.order)
            g2 = g * g
            norm2 = jnp.sum(g2, axis=-1, keepdims=True)
            d = (jnp.einsum("cq,cqka->cka", wdet * (lam + mu)[:, None], g2)
                 + jnp.einsum("cq,cqka->cka", wdet * mu[:, None],
                              jnp.broadcast_to(norm2, g2.shape)))
            k = conn.shape[1]
            edofs = (conn[:, :, None] * DIM
                     + jnp.arange(DIM, dtype=conn.dtype)).reshape(-1)
            dl = jnp.zeros_like(mask).at[edofs].add(d.reshape(-1))
            return jax.lax.psum(dl, ELEM_AXIS)

        fn = jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(P(), P(ELEM_AXIS), P(ELEM_AXIS), P(ELEM_AXIS), P()),
            out_specs=P(), check_vma=False)
        return fn(self.coords, self.conn, self.lam, self.mu, self.free_mask)

    def diagonal(self) -> jnp.ndarray:
        m = self.free_mask
        return m * m * self.diagonal_raw() + (1.0 - m)


def _sso_flatten(op: ShardedStiffnessOperator):
    return ((op.coords, op.conn, op.lam, op.mu, op.free_mask),
            (op.mesh, op.element_type, op.order))


def _sso_unflatten(aux, leaves):
    coords, conn, lam, mu, free_mask = leaves
    mesh, element_type, order = aux
    return ShardedStiffnessOperator(coords, conn, lam, mu, free_mask, mesh,
                                    element_type, order)


jax.tree_util.register_pytree_node(ShardedStiffnessOperator, _sso_flatten,
                                   _sso_unflatten)
