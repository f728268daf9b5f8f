"""Sharded multigrid: halo-exchange fine level + replicated coarse levels.

The fast solver's missing multi-chip half (round-2 VERDICT #3).  The
V-cycle preconditioner is composed as:

- **fine level**: the node-partitioned :class:`.halo.HaloShardedOperator`
  (boundary-only collectives, O(N^(2/3)) bytes per matvec) smoothed by
  the same Chebyshev / damped block-Jacobi recurrence as the
  single-device :class:`..fem.bell.BellMG`, with the block inverses and
  lambda_max taken VERBATIM from the host-built BELL hierarchy so the
  sharded and single-device preconditioners are the same linear operator
  (same CG trajectory, same iteration count);
- **restriction**: each shard scatters its slab's weighted residual into
  a level-1-sized partial and one ``psum`` replicates the coarse
  residual — a single O(n_coarse) collective per V-cycle leg;
- **coarse levels**: the BELL hierarchy's levels 1.. plus the dense
  coarsest pseudo-inverse run REPLICATED on every device (redundant
  compute, zero communication — coarse work is a few percent of the
  fine level's);
- **prolongation**: purely local per shard (each fine slab row gathers
  its <=8 voxel parents from the replicated coarse correction).

The reference has no distributed layer (SURVEY §2.2); communication here
is XLA collectives over ICI inside ``shard_map``, never host-mediated.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh as JaxMesh
from jax.sharding import NamedSharding, PartitionSpec as P

from ..fem.bell import BellMG, BellSystem
from ..mesh import DIM, Mesh
from .halo import ELEM_AXIS, HaloShardedOperator


@dataclasses.dataclass(frozen=True)
class HaloMG:
    """V-cycle preconditioner over sharded slab-layout fine vectors.

    ``apply`` takes/returns flat ``[S*ns_max*3]`` node-major vectors in
    the halo operator's slab layout (sharded over the ``elem`` axis) —
    a drop-in ``M`` for :func:`..fem.solvers.cg` driving the halo
    operator.
    """

    op: HaloShardedOperator        # fine masked operator (sharded)
    binv: jnp.ndarray              # [S*ns_max, 3, 3] sharded rows
    parents: jnp.ndarray           # [S, ns_max, dmax] int32 sharded
    pweights: jnp.ndarray          # [S, ns_max, dmax] sharded
    coarse: BellMG                 # replicated; may have 0 levels
    m_c: jnp.ndarray               # [3*n1p] level-1 free mask, replicated
    n1p: int = dataclasses.field(metadata={"static": True})
    lam_max: Optional[float] = dataclasses.field(
        default=None, metadata={"static": True})
    nu: int = dataclasses.field(default=2, metadata={"static": True})
    omega: float = dataclasses.field(default=0.7,
                                     metadata={"static": True})
    smoother: str = dataclasses.field(default="chebyshev",
                                      metadata={"static": True})

    # -- fine-level pieces ---------------------------------------------------

    def _binv_apply(self, v: jnp.ndarray) -> jnp.ndarray:
        v2 = v.reshape(-1, DIM)
        return jnp.einsum("nab,nb->na", self.binv, v2).reshape(-1)

    def _smooth(self, r, z, sweeps: int):
        if self.smoother == "chebyshev" and self.lam_max is not None:
            return self._smooth_chebyshev(r, z, sweeps)
        for _ in range(sweeps):
            res = r if z is None else r - self.op.matvec(z)
            dz = self._binv_apply(res)
            z = self.omega * dz if z is None else z + self.omega * dz
        return z

    def _smooth_chebyshev(self, r, z, sweeps: int):
        # identical recurrence/band to fem/bell.BellMG._smooth_chebyshev
        b = 1.1 * self.lam_max
        a = self.lam_max / 4.0
        theta = 0.5 * (b + a)
        delta = 0.5 * (b - a)
        s1 = theta / delta
        if z is None:
            d = self._binv_apply(r) * (1.0 / theta)
            z = d
        else:
            rr = r - self.op.matvec(z)
            d = self._binv_apply(rr) * (1.0 / theta)
            z = z + d
        rho_old = 1.0 / s1
        for _ in range(sweeps - 1):
            rho = 1.0 / (2.0 * s1 - rho_old)
            rr = r - self.op.matvec(z)
            d = (rho * rho_old) * d + (2.0 * rho / delta) \
                * self._binv_apply(rr)
            z = z + d
            rho_old = rho
        return z

    # -- transfers (one psum per restrict; prolong is comm-free) -------------

    def _local_restrict(self, parents, weights, r_slab):
        r2 = r_slab.reshape(-1, DIM)                     # [ns_max, 3]
        contrib = weights[..., None] * r2[:, None, :]    # [ns, dmax, 3]
        part = jnp.zeros((self.n1p, DIM), r2.dtype).at[parents].add(
            contrib)
        part = jax.lax.psum(part, ELEM_AXIS)
        return part.T.reshape(-1)                        # [3*n1p] cm flat

    def restrict(self, r: jnp.ndarray) -> jnp.ndarray:
        fn = jax.shard_map(
            lambda p, w, r_: self._local_restrict(p[0], w[0], r_),
            mesh=self.op.mesh,
            in_specs=(P(ELEM_AXIS), P(ELEM_AXIS), P(ELEM_AXIS)),
            out_specs=P(), check_vma=False)
        return fn(self.parents, self.pweights, r)

    def _local_prolong(self, parents, weights, zc):
        z2 = zc.reshape(DIM, self.n1p).T                 # [n1p, 3]
        uf = jnp.sum(weights[..., None] * z2[parents], axis=1)
        return uf.reshape(-1)                            # [ns_max*3]

    def prolong(self, zc: jnp.ndarray) -> jnp.ndarray:
        fn = jax.shard_map(
            lambda p, w, z: self._local_prolong(p[0], w[0], z),
            mesh=self.op.mesh,
            in_specs=(P(ELEM_AXIS), P(ELEM_AXIS), P()),
            out_specs=P(ELEM_AXIS), check_vma=False)
        return fn(self.parents, self.pweights, zc)

    # -- V-cycle -------------------------------------------------------------

    def _coarse_apply(self, rc: jnp.ndarray) -> jnp.ndarray:
        # replicated compute: exact continuation of BellMG._vcycle(1, .)
        if len(self.coarse.levels):
            return self.coarse._vcycle(
                0, rc.reshape(DIM, -1)).reshape(-1)
        return self.coarse.coarse_inv @ rc

    def apply(self, r: jnp.ndarray) -> jnp.ndarray:
        z = self._smooth(r, None, self.nu)
        res = r - self.op.matvec(z)
        m_f = self.op.free_mask
        rc = self.restrict(res * m_f)
        zc = self._coarse_apply(rc * self.m_c)
        z = z + self.prolong(zc) * m_f
        z = self._smooth(r, z, self.nu)
        return z


jax.tree_util.register_pytree_node(
    HaloMG,
    lambda m: ((m.op, m.binv, m.parents, m.pweights, m.coarse, m.m_c),
               (m.n1p, m.lam_max, m.nu, m.omega, m.smoother)),
    lambda aux, leaves: HaloMG(*leaves, *aux))


def build_halo_multigrid(
        mesh: Mesh, lam, mu, device_mesh: JaxMesh,
        free_mask: Optional[np.ndarray] = None,
        dtype=jnp.float64, order: int = 2,
        hierarchy: Optional[Tuple[BellSystem, BellMG, dict]] = None,
        use_pallas: bool = False,
) -> Tuple[HaloShardedOperator, HaloMG, BellSystem]:
    """(halo_op, halo_mg, bell_system) for a sharded MG-PCG solve.

    ``hierarchy`` reuses an existing host-built BELL hierarchy (e.g. the
    api-level disk cache); it must carry ``info["fine_transfer"]`` (any
    hierarchy built or cached at _HIER_VERSION >= 5 does).  The returned
    ``bell_system`` provides the exact fp64 host matvec for
    mixed-precision refinement of fp32 sharded solves.
    """
    from ..fem.bell import build_bell_multigrid

    C = mesh.n_cells
    lam_e = np.broadcast_to(np.asarray(lam, np.float64), (C,))
    mu_e = np.broadcast_to(np.asarray(mu, np.float64), (C,))
    if free_mask is None:
        free_mask = np.ones(mesh.n_dofs)

    if hierarchy is None:
        hierarchy = build_bell_multigrid(
            mesh, lam, mu, free_mask=free_mask, dtype=dtype, order=order,
            use_pallas=use_pallas)
    system, bmg, info = hierarchy
    ft = info.get("fine_transfer")
    if ft is None:
        raise ValueError(
            "hierarchy carries no fine_transfer triplets (built before "
            "_HIER_VERSION 5?) — rebuild the BELL hierarchy")

    hop = HaloShardedOperator.build(
        mesh, lam_e, mu_e, device_mesh, free_mask=free_mask, dtype=dtype,
        order=order, use_pallas=use_pallas)
    S, ns = hop.n_shards, hop.ns_max
    N = mesh.n_nodes

    # RCM fine position -> halo slab flat id
    slab_of_rcm = hop.plan.perm[system.perm]             # [N]

    # fine block inverses: the HOST-built values of the single-device
    # level 0, re-laid-out to slabs (padded slots get identity — their
    # mask is 0 and the masked operator acts as I there)
    binv_rcm = np.asarray(bmg.levels[0].binv9, np.float64)[:, :N] \
        .T.reshape(N, DIM, DIM)
    binv = np.tile(np.eye(DIM), (S * ns, 1, 1))
    binv[slab_of_rcm] = binv_rcm

    # slab-layout transfer ELL ([S*ns, dmax] parents/weights)
    rows_sf = slab_of_rcm[np.asarray(ft["rows"], np.int64)]
    srt = np.argsort(rows_sf, kind="stable")
    rs = rows_sf[srt]
    cs = np.asarray(ft["cols"], np.int64)[srt]
    ws = np.asarray(ft["w"], np.float64)[srt]
    counts = np.bincount(rs, minlength=S * ns)
    dmax = max(int(counts.max()), 1)
    starts = np.zeros(S * ns, np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    pos = np.arange(len(rs)) - starts[rs]
    parents = np.zeros((S * ns, dmax), np.int32)
    weights = np.zeros((S * ns, dmax), np.float64)
    parents[rs, pos] = cs
    weights[rs, pos] = ws

    # coarse chain: BELL levels 1.. + dense coarsest inverse, replicated
    coarse = BellMG(tuple(bmg.levels[1:]), bmg.coarse_inv, nu=bmg.nu,
                    omega=bmg.omega, smoother=bmg.smoother)
    if len(bmg.levels) > 1:
        n1p = bmg.levels[1].op.n_rows_p
        m_c = jnp.asarray(bmg.levels[1].op.free_mask, dtype)
    else:
        n1p = int(bmg.coarse_inv.shape[0]) // DIM
        m_c = jnp.ones(DIM * n1p, dtype)   # coarse_inv already masked

    elem_sh = NamedSharding(device_mesh, P(ELEM_AXIS))
    repl = NamedSharding(device_mesh, P())
    put = jax.device_put
    hmg = HaloMG(
        op=hop,
        binv=put(jnp.asarray(binv, dtype), elem_sh),
        parents=put(jnp.asarray(parents.reshape(S, ns, dmax)), elem_sh),
        pweights=put(jnp.asarray(weights.reshape(S, ns, dmax), dtype),
                     elem_sh),
        coarse=jax.device_put(coarse, repl),
        m_c=put(m_c, repl),
        n1p=n1p, lam_max=bmg.levels[0].lam_max, nu=bmg.nu,
        omega=bmg.omega, smoother=bmg.smoother)
    return hop, hmg, system
