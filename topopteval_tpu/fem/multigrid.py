"""Geometric multigrid preconditioner for structured box meshes.

The reference's entire answer to large problems is switching from the
direct factorization to Jacobi-preconditioned Krylov methods
(reference: FiniteElementAnalysis.jl:570-598; RobustSolver.jl:196-216) —
O(n^(1/3)) iteration growth.  The TPU-native scaling answer built here is
a matrix-free geometric V-cycle on the nested structured grids the
benchmark/model meshes come from (models/beams.py): trilinear transfer
operators expressed as row gathers / incidence-gather scatters (the TPU
layouts from ops/scatter.py), damped block-Jacobi smoothing, and an exact
dense solve on the coarsest level — giving mesh-independent CG iteration
counts.

Used as the preconditioner ``M`` of :func:`..fem.solvers.cg` (symmetric
V-cycle with symmetric smoother + exact coarse solve → SPD).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh import Mesh
from ..models.beams import generate_grid_hex, generate_grid_tet
from .operator import StiffnessOperator
from .solvers import block_jacobi_preconditioner


# ---------------------------------------------------------------------------
# Transfer operators between nested structured node lattices
# ---------------------------------------------------------------------------


def _axis_parents(i: int) -> Tuple[Tuple[int, float], ...]:
    if i % 2 == 0:
        return ((i // 2, 1.0),)
    return ((i // 2, 0.5), (i // 2 + 1, 0.5))


def build_transfer_tables(nx_f: int, ny_f: int, nz_f: int):
    """Trilinear prolongation tables between node lattices of a
    (nx_f, ny_f, nz_f)-cell box and its 2x-coarsened counterpart.

    Returns (parents [N_f, 8], weights [N_f, 8], incidence [N_c, Dc],
    contrib_weights flattened order matching parents) as NumPy arrays.
    """
    assert nx_f % 2 == ny_f % 2 == nz_f % 2 == 0, "cells must be even"
    nxc, nyc, nzc = nx_f // 2, ny_f // 2, nz_f // 2
    N_f = (nx_f + 1) * (ny_f + 1) * (nz_f + 1)
    N_c = (nxc + 1) * (nyc + 1) * (nzc + 1)

    iz, iy, ix = np.meshgrid(np.arange(nz_f + 1), np.arange(ny_f + 1),
                             np.arange(nx_f + 1), indexing="ij")
    ix, iy, iz = ix.reshape(-1), iy.reshape(-1), iz.reshape(-1)

    def axis(i):
        # two parent candidates per axis: even nodes collapse to one
        p0, p1 = i // 2, i // 2 + (i % 2)
        w0 = np.where(i % 2 == 1, 0.5, 1.0)
        w1 = np.where(i % 2 == 1, 0.5, 0.0)
        return (p0, w0), (p1, w1)

    ax, ay, az = axis(ix), axis(iy), axis(iz)
    # unused slots point at the sentinel coarse id N_c (weight 0); padding
    # with node 0 would concentrate millions of zero contributions on one
    # coarse node and blow up the restriction incidence width
    parents = np.empty((N_f, 8), dtype=np.int32)
    weights = np.empty((N_f, 8), dtype=np.float64)
    s_ = 0
    for pz, wz in az:
        for py, wy in ay:
            for px, wx in ax:
                w = wx * wy * wz
                cid = px + py * (nxc + 1) + pz * (nxc + 1) * (nyc + 1)
                parents[:, s_] = np.where(w > 0, cid, N_c)
                weights[:, s_] = w
                s_ += 1

    # restriction = P^T: incidence of (fine, slot) contributions per coarse
    flat_targets = parents.reshape(-1).astype(np.int64)      # [N_f*8]
    real = np.flatnonzero(flat_targets < N_c)                # drop sentinels
    order = real[np.argsort(flat_targets[real], kind="stable")]
    sorted_t = flat_targets[order]
    starts = np.searchsorted(sorted_t, np.arange(N_c), "left")
    ends = np.searchsorted(sorted_t, np.arange(N_c), "right")
    degree = ends - starts
    Dc = int(degree.max())
    inc = np.full((N_c, Dc), N_f * 8, dtype=np.int64)        # zero-row pad
    col = np.concatenate([np.arange(d) for d in degree])
    rows = np.repeat(np.arange(N_c), degree)
    inc[rows, col] = order
    return parents, weights, inc.astype(np.int32)


@dataclasses.dataclass(frozen=True)
class Transfer:
    """Prolongation (coarse→fine) / restriction (fine→coarse) pair."""

    parents: jnp.ndarray    # [N_f, 8] int32
    weights: jnp.ndarray    # [N_f, 8]
    incidence: jnp.ndarray  # [N_c, Dc] int32 into [N_f*8] flat (+ sentinel)

    def prolong(self, u_c: jnp.ndarray) -> jnp.ndarray:
        """[N_c, 3] → [N_f, 3]: row gathers + weighted sum.  Sentinel
        parent ids index an appended zero row."""
        u_pad = jnp.concatenate(
            [u_c, jnp.zeros((1, 3), u_c.dtype)], axis=0)
        rows = u_pad[self.parents]                           # [N_f, 8, 3]
        return jnp.sum(rows * self.weights[:, :, None], axis=1)

    def restrict(self, r_f: jnp.ndarray) -> jnp.ndarray:
        """[N_f, 3] → [N_c, 3]: P^T via incidence gather."""
        contrib = (self.weights[:, :, None]
                   * r_f[:, None, :]).reshape(-1, 3)         # [N_f*8, 3]
        contrib = jnp.concatenate(
            [contrib, jnp.zeros((1, 3), r_f.dtype)], axis=0)
        return jnp.sum(contrib[self.incidence], axis=1)


jax.tree_util.register_pytree_node(
    Transfer,
    lambda t: ((t.parents, t.weights, t.incidence), None),
    lambda aux, leaves: Transfer(*leaves))


# ---------------------------------------------------------------------------
# Host-side (NumPy) hierarchy builders
#
# The MG build runs once per mesh; on the axon TPU every eager device op
# costs a ~30-50 ms tunnel dispatch and every new program shape a remote
# compile (docs/PERF_NOTES.md), so building the smoother blocks and the
# dense coarse matrix on the host removes minutes of wall-clock from
# build_structured_multigrid without touching the solve path.
# ---------------------------------------------------------------------------


def _host_node_blocks_structured(op) -> np.ndarray:
    """fp64 NumPy twin of StructuredStiffnessOperator.node_blocks_raw."""
    from ..models.beams import _TET_SPLIT
    from .structured import _CORNER_OFFSETS

    nx, ny, nz = op.dims
    g = np.asarray(op.g, np.float64)          # [6,4,3]
    vol = np.asarray(op.vol, np.float64)      # [6]
    escale = None if op.escale is None else np.asarray(op.escale, np.float64)
    eye = np.eye(3)
    blocks = np.zeros((nz + 1, ny + 1, nx + 1, 3, 3))
    for t in range(6):
        tet = np.asarray(_TET_SPLIT[t])
        for k in range(4):
            gk = g[t, k]
            blk = vol[t] * ((op.lam + op.mu) * np.outer(gk, gk)
                            + op.mu * np.dot(gk, gk) * eye)
            oz, oy, ox = _CORNER_OFFSETS[tet[k]]
            region = blocks[oz:oz + nz, oy:oy + ny, ox:ox + nx]
            if escale is None:
                region += blk
            else:
                region += escale[..., None, None] * blk
    return blocks.reshape(-1, 3, 3)


def _host_block_jacobi(blocks: np.ndarray, free_mask: np.ndarray):
    """fp64 NumPy twin of solvers.block_jacobi_preconditioner."""
    m = np.asarray(free_mask, np.float64).reshape(-1, 3)
    eye = np.eye(3)
    bm = (blocks * (m[:, :, None] * m[:, None, :])
          + (1.0 - m)[:, :, None] * eye)
    det = np.linalg.det(bm)
    sing = det == 0
    if sing.any():
        bm = np.where(sing[:, None, None], eye, bm)
    inv = np.linalg.inv(bm)
    if sing.any():
        inv = np.where(sing[:, None, None], eye, inv)
    return inv


def _host_tet4_ke_batch(coords: np.ndarray, conn: np.ndarray,
                        lam: float, mu: float) -> np.ndarray:
    """fp64 Tet4 element stiffness batch [C, 12, 12] (constant-B exact
    1-point rule; same math as ops/pallas_kernels._tet4_ke_kernel)."""
    X = np.asarray(coords, np.float64)[conn]       # [C,4,3]
    E = X[:, 1:] - X[:, :1]
    vol = np.linalg.det(E) / 6.0
    invE = np.linalg.inv(E)
    C = conn.shape[0]
    g = np.empty((C, 4, 3))
    g[:, 1:, :] = np.transpose(invE, (0, 2, 1))
    g[:, 0, :] = -g[:, 1:, :].sum(axis=1)
    dots = np.einsum("cia,cja->cij", g, g)
    ke = (lam * np.einsum("cia,cjb->ciajb", g, g)
          + mu * np.einsum("cib,cja->ciajb", g, g)
          + mu * dots[:, :, None, :, None] * np.eye(3)[None, None, :,
                                                       None, :])
    return vol[:, None, None] * ke.reshape(C, 12, 12)


def _host_dense_constrained_matrix(mesh: Mesh, lam: float, mu: float,
                                   free_mask: np.ndarray) -> np.ndarray:
    """Dense fp64 K' = M K M + (I - M) of a small tet4 mesh on host."""
    ke = _host_tet4_ke_batch(mesh.coords, mesh.conn, lam, mu)
    edofs = (3 * mesh.conn[:, :, None] + np.arange(3)).reshape(-1, 12)
    n = mesh.n_dofs
    K = np.zeros((n, n))
    np.add.at(K, (edofs[:, :, None], edofs[:, None, :]), ke)
    m = np.asarray(free_mask, np.float64)
    return m[:, None] * K * m[None, :] + np.diag(1.0 - m)


# ---------------------------------------------------------------------------
# Multigrid hierarchy
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MGLevel:
    op: StiffnessOperator        # constrained operator at this level
    binv: jnp.ndarray            # [N, 3, 3] block-Jacobi inverse blocks
    transfer: Optional[Transfer]  # to the next coarser level (None=coarsest)


jax.tree_util.register_pytree_node(
    MGLevel, lambda l: ((l.op, l.binv, l.transfer), None),
    lambda aux, leaves: MGLevel(*leaves))


@dataclasses.dataclass(frozen=True)
class MultigridPreconditioner:
    """Symmetric V-cycle: pre/post damped block-Jacobi smoothing + exact
    dense coarse solve.  Drop-in ``M`` for :func:`..fem.solvers.cg`
    (``apply_preconditioner`` dispatches on the ``apply`` method).

    ``omega`` must satisfy omega * lambda_max(B^-1 A) < 2 for the smoother
    to contract; for tet meshes with non-cubic cells lambda_max exceeds 2,
    so the safe-and-fast default is 0.7 (0.9 diverges already at 1.25:1
    cell anisotropy — sharp stall of the outer CG)."""

    levels: Tuple[MGLevel, ...]
    coarse_inv: jnp.ndarray      # [n_dofs_c, n_dofs_c] dense inverse
    omega: float = dataclasses.field(default=0.7,
                                     metadata={"static": True})
    nu: int = dataclasses.field(default=2, metadata={"static": True})

    def _smooth(self, L: MGLevel, r2d, z2d, sweeps: int):
        for s in range(sweeps):
            if z2d is None:
                res = r2d
            else:
                Az = L.op.matvec(z2d.reshape(-1)).reshape(-1, 3)
                res = r2d - Az
            dz = jnp.einsum("nab,nb->na", L.binv, res)
            z2d = self.omega * dz if z2d is None else z2d + self.omega * dz
        return z2d

    def _vcycle(self, lvl: int, r2d):
        if lvl == len(self.levels):
            return (self.coarse_inv @ r2d.reshape(-1)).reshape(-1, 3)
        L = self.levels[lvl]
        z = self._smooth(L, r2d, None, self.nu)
        Az = L.op.matvec(z.reshape(-1)).reshape(-1, 3)
        res = r2d - Az
        m_f = L.op.free_mask.reshape(-1, 3)
        rc = L.transfer.restrict(res * m_f)
        if lvl + 1 < len(self.levels):
            m_c = self.levels[lvl + 1].op.free_mask.reshape(-1, 3)
        else:
            m_c = 1.0
        zc = self._vcycle(lvl + 1, rc * m_c)
        z = z + L.transfer.prolong(zc) * m_f
        z = self._smooth(L, r2d, z, self.nu)
        return z

    def apply(self, r: jnp.ndarray) -> jnp.ndarray:
        return self._vcycle(0, r.reshape(-1, 3)).reshape(r.shape)


jax.tree_util.register_pytree_node(
    MultigridPreconditioner,
    lambda m: ((m.levels, m.coarse_inv), (m.omega, m.nu)),
    lambda aux, leaves: MultigridPreconditioner(tuple(leaves[0]), leaves[1],
                                                aux[0], aux[1]))


def build_structured_multigrid(
        nx: int, ny: int, nz: int,
        lo: Sequence[float], hi: Sequence[float],
        lam: float, mu: float,
        fixed_plane_axis: int = 0,
        fixed_plane_value: Optional[float] = None,
        element: str = "tet4",
        n_levels: Optional[int] = None,
        max_coarse_dofs: int = 4000,
        dtype=jnp.float32,
        omega: float = 0.7, nu: int = 2,
        use_pallas: Optional[bool] = None,
        operator: str = "structured",
) -> Tuple[Mesh, StiffnessOperator, MultigridPreconditioner]:
    """Hierarchy over a structured box: returns (fine mesh, fine operator,
    V-cycle preconditioner).  Cell counts must be divisible by 2^(levels-1).

    ``operator="structured"`` (the default for tet4) uses the gather-free
    stencil operator (fem/structured.py) on every level — ~16x faster per
    V-cycle than the connectivity-based operator.  NOTE the operator's
    pytree deliberately exposes only 1D/3D-grid array leaves: 4D array
    arguments (and tiny scalar-array leaves) fed through jit into
    while_loop bodies miscompiled on the axon TPU backend
    (tools/tpu_check_struct9/10/11.py bisections).
    """
    from .bc import DirichletBC, free_mask_from_bcs, nodes_at_plane

    gen = generate_grid_tet if element == "tet4" else generate_grid_hex
    if fixed_plane_value is None:
        fixed_plane_value = float(lo[fixed_plane_axis])

    # decide level count
    dims = [nx, ny, nz]
    max_levels = 1
    while all(d % (2 ** max_levels) == 0 for d in dims) \
            and min(d // 2 ** max_levels for d in dims) >= 1:
        max_levels += 1
    if n_levels is None:
        n_levels = max_levels
    n_levels = min(n_levels, max_levels)
    f = 2 ** (n_levels - 1)
    ndofs_c = 3 * (nx // f + 1) * (ny // f + 1) * (nz // f + 1)
    if ndofs_c > max_coarse_dofs:
        raise ValueError(
            f"coarsest level has {ndofs_c} dofs > max_coarse_dofs="
            f"{max_coarse_dofs}; cell counts must allow deeper 2:1 "
            "coarsening (use dimensions divisible by higher powers of 2)")

    structured_path = operator == "structured" and element == "tet4"
    levels = []
    fine_mesh = None
    fine_op = None
    for li in range(n_levels):
        f = 2 ** li
        cnx, cny, cnz = nx // f, ny // f, nz // f
        mesh = gen(cnx, cny, cnz, lo, hi)
        fixed = nodes_at_plane(mesh, fixed_plane_axis, fixed_plane_value,
                               tol=1e-9)
        mask = free_mask_from_bcs(mesh.n_dofs,
                                  [DirichletBC.fixed(fixed)])
        if structured_path:
            from .structured import StructuredStiffnessOperator
            op = StructuredStiffnessOperator.build(
                cnx, cny, cnz, lo, hi, lam, mu, free_mask=mask,
                dtype=dtype)
            # host build: zero device dispatches/compiles (see host-side
            # builders above); parity with the device path is tested
            binv = jnp.asarray(_host_block_jacobi(
                _host_node_blocks_structured(op), mask), dtype)
        else:
            dmesh = mesh.device(dtype=dtype)
            op = StiffnessOperator.build(dmesh, lam, mu,
                                         free_mask=jnp.asarray(mask, dtype),
                                         mode="otf", order=1,
                                         use_pallas=use_pallas)
            binv = block_jacobi_preconditioner(op.node_blocks_raw(),
                                               op.free_mask)
        transfer = None
        if li + 1 < n_levels:
            parents, weights, inc = build_transfer_tables(cnx, cny, cnz)
            transfer = Transfer(jnp.asarray(parents),
                                jnp.asarray(weights, dtype),
                                jnp.asarray(inc))
        levels.append(MGLevel(op, binv, transfer))
        if li == 0:
            fine_mesh, fine_op = mesh, op

    # exact dense inverse of the coarsest constrained operator
    coarsest = levels[-1].op
    n_c = coarsest.n_dofs
    if structured_path:
        # assemble the coarse matrix on host (mesh/mask from the last loop
        # iteration ARE the coarsest level's)
        K_c = _host_dense_constrained_matrix(mesh, lam, mu, mask)
    else:
        # build the dense coarse matrix in column batches (a single vmap
        # over all n_c columns would materialize n_c x C_c element gathers
        # at once)
        eye_np = np.eye(n_c, dtype=np.float64)
        cols = []
        bs = 256
        mv = jax.jit(jax.vmap(coarsest.matvec, in_axes=1, out_axes=1))
        for j0 in range(0, n_c, bs):
            block = jnp.asarray(eye_np[:, j0:j0 + bs], dtype)
            if block.shape[1] < bs:   # pad to keep one compiled shape
                block = jnp.pad(block, ((0, 0), (0, bs - block.shape[1])))
            cols.append(np.asarray(mv(block)))
        K_c = jnp.asarray(np.concatenate(cols, axis=1)[:, :n_c])
    # invert on host in fp64 (avoids device LAPACK custom calls; one-time);
    # zero the fixed rows/cols so restricted residual components at coarse
    # Dirichlet dofs cannot leak into the prolonged correction
    inv_np = np.linalg.inv(np.asarray(K_c, dtype=np.float64))
    m_c = np.asarray(coarsest.free_mask, dtype=np.float64)
    coarse_inv = jnp.asarray(m_c[:, None] * inv_np * m_c[None, :], dtype)

    # the recursion treats levels[-1] as having a transfer to the dense
    # solve; represent by trimming: vcycle descends len(levels) levels where
    # the last transfer maps to the dense-inverse space.  We therefore drop
    # the coarsest MGLevel and keep its operator only via coarse_inv.
    mg = MultigridPreconditioner(tuple(levels[:-1]), coarse_inv,
                                 omega=omega, nu=nu)
    return fine_mesh, fine_op, mg
