"""Matrix-free global stiffness operator with Dirichlet masking.

TPU-native replacement for the reference's assembled sparse CSC matrix +
CHOLMOD backslash (reference: src/FiniteElementAnalysis/
FiniteElementAnalysis.jl:181, 547): the global K never materializes.
``A(u) = scatter(Ke_local(gather(u)))`` runs entirely in HBM, with
Dirichlet constraints applied as a free-DOF mask:

    A'(u) = m * A(m * u) + (1 - m) * u

which is algebraically identical to Ferrite's symmetric ``apply!``
condensation for zero prescribed values — the only case the reference uses
(reference: FiniteElementAnalysis.jl:314-333, 540-542).

Two application modes:

- ``otf`` (default): recompute element geometry each matvec via the
  strain→stress route (~80 B/elem HBM traffic for tet4 — bandwidth-lean,
  the large-mesh mode).
- ``stored``: precompute the Ke batch once and matvec it (faster for many
  solves on a small mesh; also what the SIMP density sweep scales).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

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

from ..mesh import DIM, DeviceMesh, Mesh, element_dofs
from ..ops.elements import (apply_element_stiffness, element_stiffness,
                            element_volumes, physical_gradients)
from ..ops.scatter import RowScatterPlan, ScatterPlan


@dataclasses.dataclass(frozen=True)
class StiffnessOperator:
    """Pytree: the matrix-free K with optional BC mask.

    ``plan`` is either a :class:`RowScatterPlan` (default — node-row
    gathers + incidence-gather scatter, the layouts TPU lowers at
    bandwidth; see ops/scatter.py) or a :class:`ScatterPlan`
    (flat-dof sorted segment_sum)."""

    dmesh: DeviceMesh
    plan: object                # RowScatterPlan | ScatterPlan
    lam: jnp.ndarray            # [C] per-element lambda (SIMP-ready)
    mu: jnp.ndarray             # [C] per-element mu
    free_mask: jnp.ndarray      # [ndof] 1.0 free / 0.0 fixed
    ke: Optional[jnp.ndarray]   # [C, ek, ek] stored-mode stiffness batch
    order: int = dataclasses.field(metadata={"static": True})
    use_pallas: bool = dataclasses.field(default=False,
                                         metadata={"static": True})

    # -- construction -------------------------------------------------------

    @staticmethod
    def build(dmesh: DeviceMesh, lam, mu,
              free_mask: Optional[jnp.ndarray] = None,
              mode: str = "otf", order: int = 2,
              plan=None, layout: str = "row",
              use_pallas: Optional[bool] = None) -> "StiffnessOperator":
        C = dmesh.conn.shape[0]
        dtype = dmesh.coords.dtype
        lam = jnp.broadcast_to(jnp.asarray(lam, dtype), (C,))
        mu = jnp.broadcast_to(jnp.asarray(mu, dtype), (C,))
        if plan is None:
            if layout == "row":
                plan = RowScatterPlan.build(np.asarray(dmesh.conn),
                                            dmesh.coords.shape[0])
            else:
                plan = ScatterPlan.build(np.asarray(dmesh.edofs),
                                         DIM * dmesh.coords.shape[0])
        if free_mask is None:
            n_dofs_p = (DIM * plan.n_nodes
                        if isinstance(plan, RowScatterPlan)
                        else plan.n_dofs)
            free_mask = jnp.ones((n_dofs_p,), dtype)
        ke = None
        if mode == "stored":
            coords_e = dmesh.coords[dmesh.conn]
            ke = element_stiffness(coords_e, lam, mu, dmesh.element_type,
                                   order)
        if use_pallas is None:
            # fused Pallas apply: 15x faster than the einsum lowering on
            # TPU (tools/tpu_bisect7); interpret mode would slow CPU runs.
            # fp64 kernels do not compile on TPU — gate on the compute
            # dtype so an x64 solve falls back to the einsum path instead
            # of crashing at compile time.
            import jax as _jax
            use_pallas = (_jax.default_backend() == "tpu"
                          and dmesh.element_type in ("tet4", "hex8", "tet10")
                          and mode == "otf"
                          and dtype in (jnp.float32, jnp.bfloat16))
        return StiffnessOperator(dmesh, plan, lam, mu, free_mask, ke,
                                 order, bool(use_pallas))

    @property
    def n_dofs(self) -> int:
        if isinstance(self.plan, RowScatterPlan):
            return DIM * self.plan.n_nodes
        return self.plan.n_dofs

    # -- unified row-shaped data movement ------------------------------------

    def _gather_rows(self, u: jnp.ndarray) -> jnp.ndarray:
        """[ndof] → [C, k, 3]."""
        if isinstance(self.plan, RowScatterPlan):
            return self.plan.gather(u)
        k = self.dmesh.conn.shape[1]
        return self.plan.gather(u).reshape(-1, k, DIM)

    def _scatter_rows(self, f_e: jnp.ndarray) -> jnp.ndarray:
        """[C, k, ...] → flat [ndof * (...//3)] global accumulation."""
        if isinstance(self.plan, RowScatterPlan):
            return self.plan.scatter_add(f_e).reshape(-1)
        C, k = self.dmesh.conn.shape
        return self.plan.scatter_add(f_e.reshape(C, -1))

    def with_free_mask(self, free_mask: jnp.ndarray) -> "StiffnessOperator":
        return dataclasses.replace(
            self, free_mask=jnp.asarray(free_mask, self.dmesh.coords.dtype))

    def with_material(self, lam, mu) -> "StiffnessOperator":
        C = self.dmesh.conn.shape[0]
        dtype = self.dmesh.coords.dtype
        lam = jnp.broadcast_to(jnp.asarray(lam, dtype), (C,))
        mu = jnp.broadcast_to(jnp.asarray(mu, dtype), (C,))
        ke = None
        if self.ke is not None:
            coords_e = self.dmesh.coords[self.dmesh.conn]
            ke = element_stiffness(coords_e, lam, mu,
                                   self.dmesh.element_type, self.order)
        return dataclasses.replace(self, lam=lam, mu=mu, ke=ke)

    # -- application --------------------------------------------------------

    def matvec_raw(self, u: jnp.ndarray) -> jnp.ndarray:
        """K @ u without BC masking."""
        dm = self.dmesh
        k = dm.conn.shape[1]
        u_e = self._gather_rows(u)                      # [C, k, 3]
        if self.ke is not None:
            f_e = _einsum("cij,cj->ci", self.ke,
                             u_e.reshape(-1, k * DIM)).reshape(-1, k, DIM)
        elif self.use_pallas and dm.element_type == "tet4":
            from ..ops.pallas_kernels import tet4_apply_pallas
            coords_e = dm.coords[dm.conn]
            # the 1-point rule the kernel uses is exact for tet4 at any
            # requested quadrature order (constant strain); measured: the
            # coords gather here fuses into the kernel input transpose
            # (caching a pre-packed copy changed nothing at 1.2M tets)
            f_e = tet4_apply_pallas(coords_e, u_e, self.lam, self.mu)
        elif self.use_pallas and dm.element_type == "hex8":
            from ..ops.pallas_kernels import hex8_apply_pallas
            coords_e = dm.coords[dm.conn]
            f_e = hex8_apply_pallas(coords_e, u_e, self.lam, self.mu)
        elif self.use_pallas and dm.element_type == "tet10":
            from ..ops.pallas_kernels import tet10_apply_pallas
            coords_e = dm.coords[dm.conn]
            f_e = tet10_apply_pallas(coords_e, u_e, self.lam, self.mu)
        else:
            coords_e = dm.coords[dm.conn]
            f_e = apply_element_stiffness(
                coords_e, u_e, self.lam, self.mu,
                dm.element_type, self.order)
        return self._scatter_rows(f_e)

    def matvec(self, u: jnp.ndarray) -> jnp.ndarray:
        """Constrained operator A'(u) = m*A(m*u) + (1-m)*u."""
        m = self.free_mask
        return m * self.matvec_raw(m * u) + (1.0 - m) * u

    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        return self.matvec(u)

    # -- preconditioning ----------------------------------------------------

    #: elements per chunk in the diagonal/block builders: per-element
    #: [c, q, k, 3(,3)] intermediates pad their minor dims to (8, 128)
    #: tiles on TPU (~40x), so a full-batch build of a 1M-element mesh
    #: wants ~20 GB HBM — chunking bounds the transient to ~0.5 GB.
    _REDUCE_CHUNK = 32768

    def _chunked_node_reduce(self, per_elem_fn, width: int) -> jnp.ndarray:
        """Accumulate per-node [n_nodes, width] sums of per-element
        contributions, processed _REDUCE_CHUNK elements at a time."""
        dm = self.dmesh
        C = dm.conn.shape[0]
        N = dm.coords.shape[0]
        acc = jnp.zeros((N, width), dm.coords.dtype)
        for c0 in range(0, C, self._REDUCE_CHUNK):
            conn_c = dm.conn[c0: c0 + self._REDUCE_CHUNK]
            cc, k = conn_c.shape
            vals = per_elem_fn(dm.coords[conn_c],
                               self.lam[c0: c0 + self._REDUCE_CHUNK],
                               self.mu[c0: c0 + self._REDUCE_CHUNK])
            acc = acc + jax.ops.segment_sum(
                vals.reshape(cc * k, width), conn_c.reshape(-1),
                num_segments=N)
        return acc

    def diagonal_raw(self) -> jnp.ndarray:
        """diag(K) without materializing Ke:
        Ke[(i,a),(i,a)] = sum_q wdet ((lam+mu) g_ia^2 + mu |g_i|^2)."""
        dm = self.dmesh

        def per_elem(coords_e, lam, mu):
            g, wdet = physical_gradients(coords_e, dm.element_type,
                                         self.order)
            g2 = g * g
            norm2 = jnp.sum(g2, axis=-1, keepdims=True)  # [c,q,k,1]
            return (_einsum("cq,cqka->cka",
                            wdet * (lam + mu)[:, None], g2)
                    + _einsum("cq,cqka->cka", wdet * mu[:, None],
                              jnp.broadcast_to(norm2, g2.shape)))

        return self._chunked_node_reduce(per_elem, DIM).reshape(-1)

    def diagonal(self) -> jnp.ndarray:
        """diag of the constrained operator (fixed dofs get 1.0)."""
        m = self.free_mask
        return m * m * self.diagonal_raw() + (1.0 - m)

    def node_blocks_raw(self) -> jnp.ndarray:
        """3x3 node-diagonal blocks [n_nodes, 3, 3] for block-Jacobi:
        block(i)_ab = sum_q wdet (lam g_a g_b + mu g_b g_a + mu d_ab |g|^2).
        Much stronger than plain Jacobi on SIMP-contrast meshes
        (SURVEY.md §7 hard part 3)."""
        dm = self.dmesh

        def per_elem(coords_e, lam, mu):
            g, wdet = physical_gradients(coords_e, dm.element_type,
                                         self.order)
            outer = _einsum("cq,cqka,cqkb->ckab",
                            wdet * lam[:, None], g, g) \
                + _einsum("cq,cqkb,cqka->ckab", wdet * mu[:, None], g, g)
            norm2 = _einsum("cq,cqka,cqka->ck", wdet * mu[:, None], g, g)
            eye = jnp.eye(DIM, dtype=g.dtype)
            blocks = outer + norm2[..., None, None] * eye
            return blocks.reshape(*blocks.shape[:2], DIM * DIM)

        acc = self._chunked_node_reduce(per_elem, DIM * DIM)
        return acc.reshape(-1, DIM, DIM)

    # -- reductions ---------------------------------------------------------

    def energy(self, u: jnp.ndarray) -> jnp.ndarray:
        """Deformation energy 0.5 * u^T K u (reference:
        FiniteElementAnalysis.jl:550) with f64 accumulation."""
        from .solvers import precise_dtype
        Ku = self.matvec(u)
        pd = precise_dtype()
        return 0.5 * jnp.vdot(u.astype(pd), Ku.astype(pd))

    def volume(self, weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Density-weighted mesh volume (reference: Utils.jl:24-92)."""
        dm = self.dmesh
        vols = element_volumes(dm.coords[dm.conn], dm.element_type,
                               self.order)
        w = dm.density if weights is None else weights
        return jnp.sum(vols * w * dm.cell_mask)


def _op_flatten(op: StiffnessOperator):
    return ((op.dmesh, op.plan, op.lam, op.mu, op.free_mask, op.ke),
            (op.order, op.use_pallas))


def _op_unflatten(aux, leaves):
    dmesh, plan, lam, mu, free_mask, ke = leaves
    return StiffnessOperator(dmesh, plan, lam, mu, free_mask, ke, aux[0],
                             aux[1])


jax.tree_util.register_pytree_node(StiffnessOperator, _op_flatten,
                                   _op_unflatten)


# ---------------------------------------------------------------------------
# Host-side assembled oracle (reference semantics: CSC assembly + `K \\ f`)
# ---------------------------------------------------------------------------


def assemble_scipy(mesh: Mesh, lam, mu, order: int = 2,
                   free_mask: Optional[np.ndarray] = None):
    """Assemble the global sparse K as scipy CSR in float64.

    Test oracle replacing the reference's Ferrite assembler + CHOLMOD
    (SURVEY.md §2.3) — used for golden-value energy comparisons and the
    small-problem :direct solver path.  If ``free_mask`` is given, applies
    the same symmetric zero-Dirichlet condensation as ``apply!``
    (rows/cols zeroed, unit diagonal).
    """
    import scipy.sparse as sp

    dmesh = mesh.device(dtype=jnp.float64)
    coords_e = dmesh.coords[dmesh.conn]
    C = mesh.n_cells
    lam = jnp.broadcast_to(jnp.asarray(lam, jnp.float64), (C,))
    mu = jnp.broadcast_to(jnp.asarray(mu, jnp.float64), (C,))
    ke = np.asarray(element_stiffness(coords_e, lam, mu, mesh.element_type,
                                      order))
    edofs = element_dofs(mesh.conn)                    # [C, ek]
    ek = edofs.shape[1]
    rows = np.repeat(edofs, ek, axis=1).reshape(-1)
    cols = np.tile(edofs, (1, ek)).reshape(-1)
    K = sp.coo_matrix((ke.reshape(-1), (rows, cols)),
                      shape=(mesh.n_dofs, mesh.n_dofs)).tocsr()
    if free_mask is not None:
        m = sp.diags(np.asarray(free_mask, dtype=np.float64))
        ident_fixed = sp.diags(1.0 - np.asarray(free_mask, dtype=np.float64))
        K = (m @ K @ m + ident_fixed).tocsr()
    return K
