"""Reference-element tables and batched element kernels (pure jnp).

TPU-native replacement for the reference's per-cell Ferrite CellValues
quadrature loop (reference: src/FiniteElementAnalysis/
FiniteElementAnalysis.jl:204-250): instead of iterating cells and 12x12
scalar accumulation, every element-level quantity is computed for the whole
element batch at once with einsums XLA maps onto the MXU.

Conventions
-----------
- Reference tetrahedron: vertices (0,0,0),(1,0,0),(0,1,0),(0,0,1);
  volume 1/6 (Ferrite RefTetrahedron).
- Reference hexahedron: [-1,1]^3, trilinear, VTK/Ferrite node order.
- Quadrature matches the reference's order-2 rules: 4 points/tet,
  2x2x2 Gauss/hex (reference: FiniteElementAnalysis.jl:160-168).
- Isotropic elasticity enters as per-element (lambda, mu) arrays so the
  SIMP path is just different scalars per element
  (reference: FiniteElementAnalysis.jl:654-707).

The isotropic stiffness identity used throughout (derivation in
tests/test_elements.py against a dense B^T D B oracle):

  Ke[(i,a),(j,b)] = sum_q w*detJ * ( lam * dNi_a dNj_b
                                   + mu  * dNi_b dNj_a
                                   + mu  * delta_ab * (grad Ni . grad Nj) )
"""

from __future__ import annotations

import functools
from typing import Tuple

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

DIM = 3

# ---------------------------------------------------------------------------
# Shape functions on reference elements
# ---------------------------------------------------------------------------


def tet4_shape(xi):
    x, y, z = xi
    return np.array([1 - x - y - z, x, y, z])


def tet4_grad(xi=None):
    return np.array([[-1.0, -1.0, -1.0],
                     [1.0, 0.0, 0.0],
                     [0.0, 1.0, 0.0],
                     [0.0, 0.0, 1.0]])


def tet10_shape(xi):
    x, y, z = xi
    l1, l2, l3, l4 = 1 - x - y - z, x, y, z
    return np.array([
        l1 * (2 * l1 - 1), l2 * (2 * l2 - 1),
        l3 * (2 * l3 - 1), l4 * (2 * l4 - 1),
        4 * l1 * l2, 4 * l2 * l3, 4 * l3 * l1,
        4 * l1 * l4, 4 * l2 * l4, 4 * l3 * l4,
    ])


def tet10_grad(xi):
    x, y, z = xi
    l1 = 1 - x - y - z
    dl1 = np.array([-1.0, -1.0, -1.0])
    dl2 = np.array([1.0, 0.0, 0.0])
    dl3 = np.array([0.0, 1.0, 0.0])
    dl4 = np.array([0.0, 0.0, 1.0])
    l2, l3, l4 = x, y, z
    return np.stack([
        (4 * l1 - 1) * dl1, (4 * l2 - 1) * dl2,
        (4 * l3 - 1) * dl3, (4 * l4 - 1) * dl4,
        4 * (l1 * dl2 + l2 * dl1), 4 * (l2 * dl3 + l3 * dl2),
        4 * (l3 * dl1 + l1 * dl3), 4 * (l1 * dl4 + l4 * dl1),
        4 * (l2 * dl4 + l4 * dl2), 4 * (l3 * dl4 + l4 * dl3),
    ])


_HEX_SIGNS = np.array([
    [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
    [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
], dtype=np.float64)


def hex8_shape(xi):
    s = _HEX_SIGNS
    return (1 + s[:, 0] * xi[0]) * (1 + s[:, 1] * xi[1]) \
        * (1 + s[:, 2] * xi[2]) / 8.0


def hex8_grad(xi):
    s = _HEX_SIGNS
    gx = s[:, 0] * (1 + s[:, 1] * xi[1]) * (1 + s[:, 2] * xi[2]) / 8.0
    gy = (1 + s[:, 0] * xi[0]) * s[:, 1] * (1 + s[:, 2] * xi[2]) / 8.0
    gz = (1 + s[:, 0] * xi[0]) * (1 + s[:, 1] * xi[1]) * s[:, 2] / 8.0
    return np.stack([gx, gy, gz], axis=1)


#: natural coordinates of the 20 serendipity hex nodes in
#: VTK_QUADRATIC_HEXAHEDRON order: 8 corners (VTK hex order), then the 12
#: mid-edge nodes of EDGE_TABLES['hex8'] — exactly one zero entry marks a
#: mid-edge node's edge direction.
_HEX20_NAT = np.array(
    [list(s) for s in _HEX_SIGNS]
    + [[0, -1, -1], [1, 0, -1], [0, 1, -1], [-1, 0, -1],
       [0, -1, 1], [1, 0, 1], [0, 1, 1], [-1, 0, 1],
       [-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
    dtype=np.float64)


def hex20_shape(xi):
    """20-node serendipity hexahedron (the reference's quadratic-hex
    path: ``Lagrange{RefHexahedron, interpolation_order=2}``,
    FiniteElementAnalysis.jl:160-163; this framework uses the 20-node
    serendipity basis of VTK/gmsh quadratic hex meshes)."""
    x, y, z = xi
    out = np.empty(20)
    for i, (a, b, c) in enumerate(_HEX20_NAT):
        if a == 0:
            out[i] = (1 - x * x) * (1 + b * y) * (1 + c * z) / 4.0
        elif b == 0:
            out[i] = (1 + a * x) * (1 - y * y) * (1 + c * z) / 4.0
        elif c == 0:
            out[i] = (1 + a * x) * (1 + b * y) * (1 - z * z) / 4.0
        else:
            out[i] = ((1 + a * x) * (1 + b * y) * (1 + c * z)
                      * (a * x + b * y + c * z - 2.0) / 8.0)
    return out


def hex20_grad(xi):
    x, y, z = xi
    out = np.empty((20, 3))
    for i, (a, b, c) in enumerate(_HEX20_NAT):
        if a == 0:
            out[i] = [-2 * x * (1 + b * y) * (1 + c * z) / 4.0,
                      (1 - x * x) * b * (1 + c * z) / 4.0,
                      (1 - x * x) * (1 + b * y) * c / 4.0]
        elif b == 0:
            out[i] = [a * (1 - y * y) * (1 + c * z) / 4.0,
                      (1 + a * x) * (-2 * y) * (1 + c * z) / 4.0,
                      (1 + a * x) * (1 - y * y) * c / 4.0]
        elif c == 0:
            out[i] = [a * (1 + b * y) * (1 - z * z) / 4.0,
                      (1 + a * x) * b * (1 - z * z) / 4.0,
                      (1 + a * x) * (1 + b * y) * (-2 * z) / 4.0]
        else:
            q = a * x + b * y + c * z - 2.0
            out[i] = [
                a * (1 + b * y) * (1 + c * z) * (q + (1 + a * x)) / 8.0,
                b * (1 + a * x) * (1 + c * z) * (q + (1 + b * y)) / 8.0,
                c * (1 + a * x) * (1 + b * y) * (q + (1 + c * z)) / 8.0,
            ]
    return out


# ---------------------------------------------------------------------------
# Quadrature rules (order-2 defaults = reference parity)
# ---------------------------------------------------------------------------

_TET_A = (5.0 - np.sqrt(5.0)) / 20.0
_TET_B = (5.0 + 3.0 * np.sqrt(5.0)) / 20.0
_G = 1.0 / np.sqrt(3.0)

#: (points [nqp,3], weights [nqp]) per (element family, order)
QUADRATURE = {
    ("tet", 1): (np.array([[0.25, 0.25, 0.25]]), np.array([1.0 / 6.0])),
    ("tet", 2): (
        np.array([
            [_TET_A, _TET_A, _TET_A],  # barycentric (b,a,a,a)
            [_TET_B, _TET_A, _TET_A],
            [_TET_A, _TET_B, _TET_A],
            [_TET_A, _TET_A, _TET_B],
        ]),
        np.full(4, 1.0 / 24.0),
    ),
    ("hex", 1): (np.zeros((1, 3)), np.array([8.0])),
    ("hex", 2): (
        np.array([[sx * _G, sy * _G, sz * _G]
                  for sz in (-1, 1) for sy in (-1, 1) for sx in (-1, 1)]),
        np.ones(8),
    ),
}

# 3x3x3 Gauss (degree-5 exact): the hex20 default — full integration,
# no spurious zero-energy modes (see api.Problem.__post_init__)
_G3P = np.array([-np.sqrt(3.0 / 5.0), 0.0, np.sqrt(3.0 / 5.0)])
_G3W = np.array([5.0 / 9.0, 8.0 / 9.0, 5.0 / 9.0])
QUADRATURE[("hex", 3)] = (
    np.array([[x, y, z] for z in _G3P for y in _G3P for x in _G3P]),
    np.array([wx * wy * wz for wz in _G3W for wy in _G3W
              for wx in _G3W]),
)
# order-3 tets fall back to the 4-point rule (sufficient for tet10
# stiffness on straight-edged tets, which is the only tet path here)
QUADRATURE[("tet", 3)] = QUADRATURE[("tet", 2)]

_FAMILY = {"tet4": "tet", "tet10": "tet", "hex8": "hex",
           "hex20": "hex"}
_SHAPE_FNS = {"tet4": (tet4_shape, tet4_grad),
              "tet10": (tet10_shape, tet10_grad),
              "hex8": (hex8_shape, hex8_grad),
              "hex20": (hex20_shape, hex20_grad)}


@functools.lru_cache(maxsize=None)
def element_tables(element_type: str, order: int = 2
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Precompute (N [nqp,k], dN_ref [nqp,k,3], weights [nqp]) tables."""
    pts, wts = QUADRATURE[(_FAMILY[element_type], order)]
    shape_fn, grad_fn = _SHAPE_FNS[element_type]
    N = np.stack([shape_fn(p) for p in pts])
    if element_type == "tet4":
        dN = np.broadcast_to(tet4_grad(), (len(pts), 4, 3)).copy()
    else:
        dN = np.stack([grad_fn(p) for p in pts])
    return N, dN, wts


# ---------------------------------------------------------------------------
# Batched geometry: physical gradients + integration weights
# ---------------------------------------------------------------------------


def _inv3x3(J):
    """Batched 3x3 inverse + determinant via adjugate (vectorizes on VPU)."""
    a, b, c = J[..., 0, 0], J[..., 0, 1], J[..., 0, 2]
    d, e, f = J[..., 1, 0], J[..., 1, 1], J[..., 1, 2]
    g, h, i = J[..., 2, 0], J[..., 2, 1], J[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    det = a * A + d * B + g * C
    # Safe divide: padded ghost cells (all nodes == node 0) have det == 0;
    # they must yield finite gradients and zero wdet, staying provably inert.
    safe = jnp.where(det == 0, jnp.ones_like(det), det)
    inv = jnp.stack([
        jnp.stack([A, B, C], axis=-1),
        jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], axis=-1),
        jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], axis=-1),
    ], axis=-2) / safe[..., None, None]
    return inv, det


def physical_gradients(coords_e: jnp.ndarray, element_type: str,
                       order: int = 2):
    """Element batch geometry.

    Parameters
    ----------
    coords_e : [C, k, 3] gathered element node coordinates

    Returns
    -------
    g : [C, nqp, k, 3] physical shape-function gradients
    wdet : [C, nqp] quadrature weight * |J| (the reference's getdetJdV,
        FiniteElementAnalysis.jl:222)
    """
    _, dN, w = element_tables(element_type, order)
    dN = jnp.asarray(dN, dtype=coords_e.dtype)
    w = jnp.asarray(w, dtype=coords_e.dtype)
    # J[c,q,a,b] = d x_a / d xi_b = sum_k coords[c,k,a] dN[q,k,b]
    J = _einsum("cka,qkb->cqab", coords_e, dN)
    invJ, detJ = _inv3x3(J)
    # dN/dx_a = sum_b dN_ref[q,k,b] * invJ[c,q,b,a]   (invJ = d xi/dx)
    g = _einsum("qkb,cqba->cqka", dN, invJ)
    return g, w[None, :] * detJ


# ---------------------------------------------------------------------------
# Element stiffness batch
# ---------------------------------------------------------------------------


def element_stiffness(coords_e: jnp.ndarray, lam, mu, element_type: str,
                      order: int = 2,
                      use_pallas: bool = None) -> jnp.ndarray:
    """Batched Ke [C, 3k, 3k] for isotropic elasticity.

    ``lam``/``mu`` are scalars or per-element arrays [C] — the SIMP assembly
    is this same kernel with per-element Lamé values
    (reference: FiniteElementAnalysis.jl:669-703).

    On TPU at fp32/bf16 the fused Pallas Ke kernels are used (tet4 exact
    at any order via constant strain; hex8/tet10 implement the order-2
    reference rule); the einsum path remains for CPU/fp64 and the Pallas
    kernels are tested against it (tests/test_pallas.py).
    """
    C, k, _ = coords_e.shape
    lam = jnp.broadcast_to(jnp.asarray(lam, coords_e.dtype), (C,))
    mu = jnp.broadcast_to(jnp.asarray(mu, coords_e.dtype), (C,))
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and coords_e.dtype in (jnp.float32, jnp.bfloat16)
                      and (element_type == "tet4"
                           or (element_type in ("hex8", "tet10")
                               and order == 2)))
    if use_pallas:
        from . import pallas_kernels as pk
        if element_type == "tet4":
            return pk.tet4_element_stiffness_pallas(coords_e, lam, mu)
        if element_type == "hex8":
            return pk.hex8_element_stiffness_pallas(coords_e, lam, mu)
        if element_type == "tet10":
            return pk.tet10_element_stiffness_pallas(coords_e, lam, mu)
    g, wdet = physical_gradients(coords_e, element_type, order)

    wl = wdet * lam[:, None]
    wm = wdet * mu[:, None]
    # lam * dNi_a dNj_b
    K1 = _einsum("cq,cqia,cqjb->ciajb", wl, g, g)
    # mu * dNi_b dNj_a
    K2 = _einsum("cq,cqib,cqja->ciajb", wm, g, g)
    # mu * delta_ab grad.grad
    dots = _einsum("cq,cqid,cqjd->cij", wm, g, g)
    eye = jnp.eye(DIM, dtype=coords_e.dtype)[None, None, :, None, :]
    K3 = dots[:, :, None, :, None] * eye
    Ke = K1 + K2 + K3
    return Ke.reshape(C, k * DIM, k * DIM)


def element_stiffness_unit(coords_e: jnp.ndarray, nu: float,
                           element_type: str, order: int = 2) -> jnp.ndarray:
    """Ke for E=1; multiply by SIMP scale E(rho)/1 per element afterwards."""
    from ..materials import lame_parameters
    lam, mu = lame_parameters(1.0, nu)
    return element_stiffness(coords_e, lam, mu, element_type, order)


def apply_element_stiffness(coords_e: jnp.ndarray, u_e: jnp.ndarray,
                            lam, mu, element_type: str, order: int = 2
                            ) -> jnp.ndarray:
    """Matrix-free f_e = Ke @ u_e without materializing Ke.

    Strain route: grad_u → sigma → divergence-weighted gradients.  Moves
    ~7x fewer HBM bytes than a stored-Ke matvec for tet4, which is what
    makes the large-mesh CG HBM-friendly (SURVEY.md §7 hard part 2).

    Parameters
    ----------
    coords_e : [C, k, 3]
    u_e : [C, k, 3] gathered element displacements

    Returns
    -------
    f_e : [C, k, 3]
    """
    C = coords_e.shape[0]
    g, wdet = physical_gradients(coords_e, element_type, order)
    lam = jnp.broadcast_to(jnp.asarray(lam, coords_e.dtype), (C,))
    mu = jnp.broadcast_to(jnp.asarray(mu, coords_e.dtype), (C,))
    # grad_u[c,q,a,b] = d u_a/d x_b
    grad_u = _einsum("cqkb,cka->cqab", g, u_e)
    eps = 0.5 * (grad_u + jnp.swapaxes(grad_u, -1, -2))
    tr = eps[..., 0, 0] + eps[..., 1, 1] + eps[..., 2, 2]
    eye = jnp.eye(DIM, dtype=coords_e.dtype)
    sigma = (lam[:, None, None, None] * tr[..., None, None] * eye
             + 2.0 * mu[:, None, None, None] * eps)
    # f_e[c,k,a] = sum_q wdet sigma[c,q,a,b] g[c,q,k,b]
    return _einsum("cq,cqab,cqkb->cka", wdet, sigma, g)


def element_volumes(coords_e: jnp.ndarray, element_type: str,
                    order: int = 2) -> jnp.ndarray:
    """Per-element volumes [C] = sum_q w*detJ (reference: Utils.jl:79-84)."""
    _, wdet = physical_gradients(coords_e, element_type, order)
    return jnp.sum(wdet, axis=1)


def strain_displacement_matrix(g: jnp.ndarray) -> jnp.ndarray:
    """Voigt B [.., 6, 3k] from physical gradients g [..., k, 3].

    Voigt order [xx, yy, zz, xy, yz, xz] with engineering shear.  Used by
    the oracle tests and the Pallas B^T D B kernel path.
    """
    *batch, k, _ = g.shape
    B = jnp.zeros((*batch, 6, k * DIM), dtype=g.dtype)
    gx, gy, gz = g[..., 0], g[..., 1], g[..., 2]
    idx = jnp.arange(k)
    B = B.at[..., 0, idx * 3 + 0].set(gx)
    B = B.at[..., 1, idx * 3 + 1].set(gy)
    B = B.at[..., 2, idx * 3 + 2].set(gz)
    B = B.at[..., 3, idx * 3 + 0].set(gy)
    B = B.at[..., 3, idx * 3 + 1].set(gx)
    B = B.at[..., 4, idx * 3 + 1].set(gz)
    B = B.at[..., 4, idx * 3 + 2].set(gy)
    B = B.at[..., 5, idx * 3 + 0].set(gz)
    B = B.at[..., 5, idx * 3 + 2].set(gx)
    return B
