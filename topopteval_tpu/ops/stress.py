"""Batched stress recovery + invariants (von Mises, principal stresses).

TPU-native replacement for the reference's per-cell stress loop
(reference: src/FiniteElementAnalysis/FiniteElementAnalysis.jl:440-509,
730-801) and the export-side invariants (src/ResultsExport/
ResultsExport.jl:69-88): one batched pass computes quadrature-point
stresses, cell averages, von Mises, and closed-form principal stresses for
every element at once.
"""

from __future__ import annotations

import functools

from typing import Tuple

import jax.numpy as jnp

# NOTE: these einsums deliberately use DEFAULT matmul precision.
# precision="highest" turns tiny-dim einsums into MXU dot_generals whose
# operand layouts pad the minor dims 3/4 up to (8,128) tiles — a 42x HBM
# blowup that OOMed the 1M-tet hierarchy build (docs/PERF_NOTES.md).  The
# bf16-pass accuracy hazard only matters on CG-path operators; those live
# in parallel/sweep.py and fem/ell.py, which keep precision="highest".
_einsum = jnp.einsum


from ..mesh import DIM, DeviceMesh
from .elements import physical_gradients


def recover_stresses(dmesh: DeviceMesh, u: jnp.ndarray, lam, mu,
                     order: int = 2) -> jnp.ndarray:
    """Quadrature-point stress tensors [C, nqp, 3, 3].

    ``u`` is the global displacement vector [ndof]; ``lam``/``mu`` scalars
    or per-element arrays (SIMP: reference FiniteElementAnalysis.jl:746-748).
    """
    conn = dmesh.conn
    C, k = conn.shape
    coords_e = dmesh.coords[conn]
    g, _ = physical_gradients(coords_e, dmesh.element_type, order)
    u_e = u.reshape(-1, DIM)[conn]                    # [C, k, 3]
    grad_u = _einsum("cqkb,cka->cqab", g, u_e)
    eps = 0.5 * (grad_u + jnp.swapaxes(grad_u, -1, -2))
    tr = eps[..., 0, 0] + eps[..., 1, 1] + eps[..., 2, 2]
    lam = jnp.broadcast_to(jnp.asarray(lam, u.dtype), (C,))
    mu = jnp.broadcast_to(jnp.asarray(mu, u.dtype), (C,))
    eye = jnp.eye(DIM, dtype=u.dtype)
    return (lam[:, None, None, None] * tr[..., None, None] * eye
            + 2.0 * mu[:, None, None, None] * eps)


def cell_average(sigma_qp: jnp.ndarray) -> jnp.ndarray:
    """Average stress over quadrature points [C, 3, 3] (reference:
    FiniteElementAnalysis.jl:487-488)."""
    return jnp.mean(sigma_qp, axis=1)


def von_mises(sigma: jnp.ndarray) -> jnp.ndarray:
    """sqrt(3/2 * dev(s):dev(s)) on [..., 3, 3] tensors (reference:
    FiniteElementAnalysis.jl:492)."""
    tr = (sigma[..., 0, 0] + sigma[..., 1, 1] + sigma[..., 2, 2]) / 3.0
    dev = sigma - tr[..., None, None] * jnp.eye(3, dtype=sigma.dtype)
    return jnp.sqrt(1.5 * jnp.sum(dev * dev, axis=(-2, -1)))


def principal_stresses(sigma: jnp.ndarray) -> jnp.ndarray:
    """Sorted eigenvalues (ascending) of symmetric [..., 3, 3] tensors via
    the trigonometric closed form — no iterative eigensolver on device
    (reference computes eigvals per cell, ResultsExport.jl:79-81)."""
    s = sigma
    tr = (s[..., 0, 0] + s[..., 1, 1] + s[..., 2, 2])
    q = tr / 3.0
    d = s - q[..., None, None] * jnp.eye(3, dtype=s.dtype)
    p2 = jnp.sum(d * d, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    # r = det(d) / (2 p^3), clamped to [-1, 1]
    det_d = (d[..., 0, 0] * (d[..., 1, 1] * d[..., 2, 2]
                             - d[..., 1, 2] * d[..., 2, 1])
             - d[..., 0, 1] * (d[..., 1, 0] * d[..., 2, 2]
                               - d[..., 1, 2] * d[..., 2, 0])
             + d[..., 0, 2] * (d[..., 1, 0] * d[..., 2, 1]
                               - d[..., 1, 1] * d[..., 2, 0]))
    safe_p = jnp.where(p == 0, 1.0, p)
    r = jnp.clip(det_d / (2.0 * safe_p ** 3), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    two_pi_3 = 2.0 * jnp.pi / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)                    # max
    e3 = q + 2.0 * p * jnp.cos(phi + two_pi_3)         # min
    e2 = tr - e1 - e3
    return jnp.stack([e3, e2, e1], axis=-1)


def max_von_mises(vm: jnp.ndarray, cell_mask: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(max value, argmax cell id) over real cells only (reference tracks
    the global max + its cell, FiniteElementAnalysis.jl:495-498)."""
    masked = jnp.where(cell_mask > 0, vm, -jnp.inf)
    idx = jnp.argmax(masked)
    return masked[idx], idx


def stress_summary(dmesh: DeviceMesh, u: jnp.ndarray, lam, mu,
                   order: int = 2):
    """One-pass recovery: (sigma_qp, avg, vm, max_vm, argmax_cell)."""
    sigma_qp = recover_stresses(dmesh, u, lam, mu, order)
    avg = cell_average(sigma_qp)
    vm = von_mises(avg)
    mx, cell = max_von_mises(vm, dmesh.cell_mask)
    return sigma_qp, avg, vm, mx, cell
