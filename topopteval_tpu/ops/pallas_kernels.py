"""Pallas TPU kernels for the hot element ops.

The einsum path in ops/elements.py materializes per-quadrature-point
gradients [C, q, k, 3] and three Ke-sized partial products in HBM; these
kernels fuse the whole element computation so only inputs (coords,
materials) and outputs (Ke or element forces) touch HBM.

Data layout: the element index lives on the *lane* (last, 128-wide) axis —
inputs are transposed to [comp, C] so every intermediate is a [BLOCK_C]
vector on the VPU.  Tet4 exploits constant strain: the exact 1-point rule
replaces the reference's 4-point loop (identical Ke for affine tets;
reference rule at FiniteElementAnalysis.jl:160-168).

All kernels have `interpret=True` parity tests against the einsum path
(tests/test_pallas.py) and run uninterpreted on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEF_BLOCK = 512


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# Tet4 element stiffness: coords [C,4,3] (+ lam,mu [C]) -> Ke [C,12,12]
# ---------------------------------------------------------------------------


def _tet4_geometry(x):
    """x: list of 12 [B] vectors (node-major: x0,y0,z0,x1,...).

    Returns (g, vol): g[i][a] = dN_i/dx_a as [B] vectors, vol [B].
    """
    # edge matrix E = [p1-p0, p2-p0, p3-p0] (rows); J = E^T in our
    # convention but only det and inverse products matter.
    e = [[x[3 * (i + 1) + a] - x[a] for a in range(3)] for i in range(3)]
    # det via triple product
    c0 = e[1][1] * e[2][2] - e[1][2] * e[2][1]
    c1 = e[1][2] * e[2][0] - e[1][0] * e[2][2]
    c2 = e[1][0] * e[2][1] - e[1][1] * e[2][0]
    det = e[0][0] * c0 + e[0][1] * c1 + e[0][2] * c2
    safe = jnp.where(det == 0, jnp.ones_like(det), det)
    inv_det = 1.0 / safe
    # rows of E^{-1} (adjugate / det): grad N_{i+1} = (E^{-1})[i, :]
    adj = [
        [c0, e[0][2] * e[2][1] - e[0][1] * e[2][2],
         e[0][1] * e[1][2] - e[0][2] * e[1][1]],
        [c1, e[0][0] * e[2][2] - e[0][2] * e[2][0],
         e[0][2] * e[1][0] - e[0][0] * e[1][2]],
        [c2, e[0][1] * e[2][0] - e[0][0] * e[2][1],
         e[0][0] * e[1][1] - e[0][1] * e[1][0]],
    ]
    # J = E^T (columns are edge vectors), so dN_{i+1}/dx_a = (E^{-1})[a][i]
    g = [[adj[a][i] * inv_det for a in range(3)] for i in range(3)]
    g0 = [-(g[0][a] + g[1][a] + g[2][a]) for a in range(3)]
    vol = det / 6.0
    return [g0] + g, vol


def _tet4_ke_kernel(coords_ref, lam_ref, mu_ref, out_ref):
    x = [coords_ref[i, :] for i in range(12)]
    lam = lam_ref[0, :]
    mu = mu_ref[0, :]
    g, vol = _tet4_geometry(x)
    lam_v = lam * vol
    mu_v = mu * vol
    # Ke[(i,a),(j,b)] = V (lam g_ia g_jb + mu g_ib g_ja + mu dab g_i.g_j)
    dots = [[g[i][0] * g[j][0] + g[i][1] * g[j][1] + g[i][2] * g[j][2]
             for j in range(4)] for i in range(4)]
    for i in range(4):
        for a in range(3):
            for j in range(4):
                for b in range(3):
                    val = (lam_v * (g[i][a] * g[j][b])
                           + mu_v * (g[i][b] * g[j][a]))
                    if a == b:
                        val = val + mu_v * dots[i][j]
                    out_ref[(3 * i + a) * 12 + (3 * j + b), :] = val


@functools.partial(jax.jit, static_argnames=("block", "interpret",
                                             "transpose_out"))
def tet4_element_stiffness_pallas(coords_e: jnp.ndarray, lam: jnp.ndarray,
                                  mu: jnp.ndarray, block: int = 1024,
                                  interpret: bool = False,
                                  transpose_out: bool = True) -> jnp.ndarray:
    """Fused Tet4 Ke batch: [C,4,3], [C], [C] -> [C,12,12].

    ``transpose_out=False`` returns the kernel-native [144, C] layout
    (element on lanes) — the layout a stored-Ke matvec kernel consumes —
    skipping a 576 B/elem transpose."""
    C = coords_e.shape[0]
    Cp = _cdiv(C, block) * block
    ct = jnp.swapaxes(coords_e.reshape(C, 12), 0, 1)        # [12, C]
    ct = jnp.pad(ct, ((0, 0), (0, Cp - C)))
    lam2 = jnp.pad(lam.reshape(1, C), ((0, 0), (0, Cp - C)))
    mu2 = jnp.pad(mu.reshape(1, C), ((0, 0), (0, Cp - C)))

    out = pl.pallas_call(
        _tet4_ke_kernel,
        grid=(Cp // block,),
        in_specs=[
            pl.BlockSpec((12, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((144, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((144, Cp), coords_e.dtype),
        interpret=interpret,
    )(ct, lam2, mu2)
    if not transpose_out:
        return out[:, :C]
    return jnp.swapaxes(out[:, :C], 0, 1).reshape(C, 12, 12)


# ---------------------------------------------------------------------------
# Tet4 matrix-free element apply: f_e = Ke @ u_e without Ke
# coords [C,4,3], u_e [C,4,3] -> f_e [C,4,3]
# ---------------------------------------------------------------------------


def _tet4_apply_kernel(coords_ref, u_ref, lam_ref, mu_ref, out_ref):
    x = [coords_ref[i, :] for i in range(12)]
    u = [u_ref[i, :] for i in range(12)]
    lam = lam_ref[0, :]
    mu = mu_ref[0, :]
    g, vol = _tet4_geometry(x)
    # grad_u[a][b] = sum_k u[k,a] g[k][b]
    gu = [[sum(u[3 * k + a] * g[k][b] for k in range(4)) for b in range(3)]
          for a in range(3)]
    eps = [[0.5 * (gu[a][b] + gu[b][a]) for b in range(3)] for a in range(3)]
    tr = gu[0][0] + gu[1][1] + gu[2][2]
    lam_tr = lam * tr
    sig = [[2.0 * mu * eps[a][b] + (lam_tr if a == b else 0.0)
            for b in range(3)] for a in range(3)]
    # f[k,a] = V * sum_b sig[a][b] g[k][b]
    for k in range(4):
        for a in range(3):
            out_ref[3 * k + a, :] = vol * (
                sig[a][0] * g[k][0] + sig[a][1] * g[k][1]
                + sig[a][2] * g[k][2])


def _tet4_apply_call(ct, ut, lam2, mu2, block, interpret):
    """Kernel-native call: all operands already in the [rows, Cp] lanes
    layout.  Returns [12, Cp]."""
    Cp = ct.shape[1]
    return pl.pallas_call(
        _tet4_apply_kernel,
        grid=(Cp // block,),
        in_specs=[
            pl.BlockSpec((12, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((12, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((12, Cp), ct.dtype),
        interpret=interpret,
    )(ct, ut, lam2, mu2)


def pack_lanes(a: jnp.ndarray, block: int) -> jnp.ndarray:
    """[C, ...] → kernel lanes layout [prod(...), Cp] (block-padded).
    (Measured note: pre-packing per-matvec invariants this way gains
    nothing over packing inline — XLA fuses the gather+transpose into the
    kernel input production; the fine-matvec cost is the u-gather and the
    incidence scatter, docs/PERF_NOTES.md.)"""
    C = a.shape[0]
    Cp = _cdiv(C, block) * block
    return jnp.pad(jnp.swapaxes(a.reshape(C, -1), 0, 1),
                   ((0, 0), (0, Cp - C)))


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def tet4_apply_pallas(coords_e: jnp.ndarray, u_e: jnp.ndarray,
                      lam: jnp.ndarray, mu: jnp.ndarray,
                      block: int = DEF_BLOCK,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused f_e = Ke(coords, lam, mu) @ u_e for Tet4 batches."""
    C = coords_e.shape[0]
    Cp = _cdiv(C, block) * block
    out = _tet4_apply_call(
        pack_lanes(coords_e, block), pack_lanes(u_e, block),
        jnp.pad(lam.reshape(1, C), ((0, 0), (0, Cp - C))),
        jnp.pad(mu.reshape(1, C), ((0, 0), (0, Cp - C))),
        block, interpret)
    return jnp.swapaxes(out[:, :C], 0, 1).reshape(C, 4, 3)


# ---------------------------------------------------------------------------
# Hex8 matrix-free element apply (2x2x2 Gauss, trilinear isoparametric)
# ---------------------------------------------------------------------------

_HEX_SIGNS_PY = [(-1, -1, -1), (1, -1, -1), (1, 1, -1), (-1, 1, -1),
                 (-1, -1, 1), (1, -1, 1), (1, 1, 1), (-1, 1, 1)]
_G = 1.0 / np.sqrt(3.0)
_HEX_QPS = [(sx * _G, sy * _G, sz * _G)
            for sz in (-1, 1) for sy in (-1, 1) for sx in (-1, 1)]


def _hex8_dn(xi):
    """dN [8][3] python floats at one reference point."""
    out = []
    for sx, sy, sz in _HEX_SIGNS_PY:
        out.append((
            sx * (1 + sy * xi[1]) * (1 + sz * xi[2]) / 8.0,
            (1 + sx * xi[0]) * sy * (1 + sz * xi[2]) / 8.0,
            (1 + sx * xi[0]) * (1 + sy * xi[1]) * sz / 8.0,
        ))
    return out


_HEX_DN = [_hex8_dn(q) for q in _HEX_QPS]   # [8 qp][8 node][3] constants


def _inv3_scalars(J):
    """J as [[...]] of [B] vectors -> (inv, det)."""
    a, b, c = J[0]
    d, e, f = J[1]
    g, h, i = J[2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    det = a * A + d * B + g * C
    safe = jnp.where(det == 0, jnp.ones_like(det), det)
    idet = 1.0 / safe
    inv = [[A * idet, B * idet, C * idet],
           [(f * g - d * i) * idet, (a * i - c * g) * idet,
            (c * d - a * f) * idet],
           [(d * h - e * g) * idet, (b * g - a * h) * idet,
            (a * e - b * d) * idet]]
    return inv, det


def _hex8_apply_kernel(coords_ref, u_ref, lam_ref, mu_ref, out_ref):
    x = [[coords_ref[3 * k + a, :] for a in range(3)] for k in range(8)]
    u = [[u_ref[3 * k + a, :] for a in range(3)] for k in range(8)]
    lam = lam_ref[0, :]
    mu = mu_ref[0, :]
    f = [[None] * 3 for _ in range(8)]
    for qp in range(8):
        dn = _HEX_DN[qp]
        # J[a][b] = sum_k x[k][a] dn[k][b]
        J = [[sum(x[k][a] * dn[k][b] for k in range(8)) for b in range(3)]
             for a in range(3)]
        invJ, det = _inv3_scalars(J)
        # g[k][a] = sum_b dn[k][b] invJ[b][a]
        g = [[sum(dn[k][b] * invJ[b][a] for b in range(3))
              for a in range(3)] for k in range(8)]
        gu = [[sum(u[k][a] * g[k][b] for k in range(8)) for b in range(3)]
              for a in range(3)]
        tr = gu[0][0] + gu[1][1] + gu[2][2]
        lam_tr = lam * tr
        sig = [[mu * (gu[a][b] + gu[b][a]) + (lam_tr if a == b else 0.0)
                for b in range(3)] for a in range(3)]
        for k in range(8):
            for a in range(3):
                val = det * (sig[a][0] * g[k][0] + sig[a][1] * g[k][1]
                             + sig[a][2] * g[k][2])
                f[k][a] = val if f[k][a] is None else f[k][a] + val
    for k in range(8):
        for a in range(3):
            out_ref[3 * k + a, :] = f[k][a]


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def hex8_apply_pallas(coords_e: jnp.ndarray, u_e: jnp.ndarray,
                      lam: jnp.ndarray, mu: jnp.ndarray,
                      block: int = 256,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused f_e = Ke(coords, lam, mu) @ u_e for Hex8 batches
    (2x2x2 Gauss, reference rule FiniteElementAnalysis.jl:163)."""
    C = coords_e.shape[0]
    Cp = _cdiv(C, block) * block

    def t(a):
        return jnp.pad(jnp.swapaxes(a.reshape(C, -1), 0, 1),
                       ((0, 0), (0, Cp - C)))

    out = pl.pallas_call(
        _hex8_apply_kernel,
        grid=(Cp // block,),
        in_specs=[
            pl.BlockSpec((24, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((24, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((24, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((24, Cp), coords_e.dtype),
        interpret=interpret,
    )(t(coords_e), t(u_e),
      jnp.pad(lam.reshape(1, C), ((0, 0), (0, Cp - C))),
      jnp.pad(mu.reshape(1, C), ((0, 0), (0, Cp - C))))
    return jnp.swapaxes(out[:, :C], 0, 1).reshape(C, 8, 3)


# ---------------------------------------------------------------------------
# Generic isoparametric kernels (tet10, hex8 Ke) generated from reference
# gradient tables — same lanes-layout scheme as the hand-written tet4/hex8
# kernels above: element index on the 128-wide lane axis, every
# intermediate a [BLOCK] vector on the VPU, geometry recomputed in-kernel
# so only coords/materials/IO touch HBM.
# (reference rule: order-2 quadrature, FiniteElementAnalysis.jl:160-168)
# ---------------------------------------------------------------------------


def _iso_tables(element_type: str, order: int = 2):
    """Python-float (dn [nqp][k][3], w [nqp]) tables for kernel codegen."""
    from .elements import element_tables
    _, dN, w = element_tables(element_type, order)
    dn = [[[float(dN[q, kk, b]) for b in range(3)]
           for kk in range(dN.shape[1])] for q in range(dN.shape[0])]
    return dn, [float(x) for x in w]


def _make_iso_apply_kernel(dn_list, w_list, k):
    nqp = len(w_list)

    def kernel(coords_ref, u_ref, lam_ref, mu_ref, out_ref):
        x = [[coords_ref[3 * kk + a, :] for a in range(3)]
             for kk in range(k)]
        u = [[u_ref[3 * kk + a, :] for a in range(3)] for kk in range(k)]
        lam = lam_ref[0, :]
        mu = mu_ref[0, :]
        f = [[None] * 3 for _ in range(k)]
        for qp in range(nqp):
            dn = dn_list[qp]
            J = [[sum(x[kk][a] * dn[kk][b] for kk in range(k))
                  for b in range(3)] for a in range(3)]
            invJ, det = _inv3_scalars(J)
            g = [[sum(dn[kk][b] * invJ[b][a] for b in range(3))
                  for a in range(3)] for kk in range(k)]
            gu = [[sum(u[kk][a] * g[kk][b] for kk in range(k))
                   for b in range(3)] for a in range(3)]
            tr = gu[0][0] + gu[1][1] + gu[2][2]
            lam_tr = lam * tr
            sig = [[mu * (gu[a][b] + gu[b][a])
                    + (lam_tr if a == b else 0.0)
                    for b in range(3)] for a in range(3)]
            wdet = det * w_list[qp]
            for kk in range(k):
                for a in range(3):
                    val = wdet * (sig[a][0] * g[kk][0]
                                  + sig[a][1] * g[kk][1]
                                  + sig[a][2] * g[kk][2])
                    f[kk][a] = val if f[kk][a] is None else f[kk][a] + val
        for kk in range(k):
            for a in range(3):
                out_ref[3 * kk + a, :] = f[kk][a]

    return kernel


def _make_iso_ke_kernel(dn_list, w_list, k):
    nqp = len(w_list)
    ek = 3 * k

    def kernel(coords_ref, lam_ref, mu_ref, out_ref):
        x = [[coords_ref[3 * kk + a, :] for a in range(3)]
             for kk in range(k)]
        lam = lam_ref[0, :]
        mu = mu_ref[0, :]
        acc = [[None] * ek for _ in range(ek)]
        for qp in range(nqp):
            dn = dn_list[qp]
            J = [[sum(x[kk][a] * dn[kk][b] for kk in range(k))
                  for b in range(3)] for a in range(3)]
            invJ, det = _inv3_scalars(J)
            g = [[sum(dn[kk][b] * invJ[b][a] for b in range(3))
                  for a in range(3)] for kk in range(k)]
            wdet = det * w_list[qp]
            lam_w = lam * wdet
            mu_w = mu * wdet
            dots = [[g[i][0] * g[j][0] + g[i][1] * g[j][1]
                     + g[i][2] * g[j][2] for j in range(k)]
                    for i in range(k)]
            mdots = [[mu_w * dots[i][j] for j in range(k)]
                     for i in range(k)]
            for i in range(k):
                for a in range(3):
                    row = 3 * i + a
                    for j in range(k):
                        for b in range(3):
                            val = (lam_w * (g[i][a] * g[j][b])
                                   + mu_w * (g[i][b] * g[j][a]))
                            if a == b:
                                val = val + mdots[i][j]
                            col = 3 * j + b
                            acc[row][col] = (val if acc[row][col] is None
                                             else acc[row][col] + val)
        for row in range(ek):
            for col in range(ek):
                out_ref[row * ek + col, :] = acc[row][col]

    return kernel


def _make_iso_ke_kernel_stream(dn_list, w_list, k):
    """Ke kernel variant that accumulates each entry straight into the
    VMEM out block instead of holding 9k² live register accumulators.

    The baseline :func:`_make_iso_ke_kernel` keeps (3k)² = 576 (hex8) /
    900 (tet10) live values across the whole quadrature loop — far past
    the vector-register budget, so Mosaic spills and the kernels ran at
    ~12x below the tet4 line (round-4 VERDICT #7).  Here each entry's
    lifetime is one FMA + one VMEM read-modify-write; only the per-qp
    geometry (g: 3k values) stays live."""
    nqp = len(w_list)
    ek = 3 * k

    def kernel(coords_ref, lam_ref, mu_ref, out_ref):
        x = [[coords_ref[3 * kk + a, :] for a in range(3)]
             for kk in range(k)]
        lam = lam_ref[0, :]
        mu = mu_ref[0, :]
        for qp in range(nqp):
            dn = dn_list[qp]
            J = [[sum(x[kk][a] * dn[kk][b] for kk in range(k))
                  for b in range(3)] for a in range(3)]
            invJ, det = _inv3_scalars(J)
            g = [[sum(dn[kk][b] * invJ[b][a] for b in range(3))
                  for a in range(3)] for kk in range(k)]
            wdet = det * w_list[qp]
            lam_w = lam * wdet
            mu_w = mu * wdet
            for i in range(k):
                for j in range(k):
                    dot = mu_w * (g[i][0] * g[j][0] + g[i][1] * g[j][1]
                                  + g[i][2] * g[j][2])
                    for a in range(3):
                        row = 3 * i + a
                        for b in range(3):
                            val = (lam_w * (g[i][a] * g[j][b])
                                   + mu_w * (g[i][b] * g[j][a]))
                            if a == b:
                                val = val + dot
                            col = 3 * j + b
                            if qp == 0:
                                out_ref[row * ek + col, :] = val
                            else:
                                out_ref[row * ek + col, :] = (
                                    out_ref[row * ek + col, :] + val)

    return kernel


def _iso_apply(element_type: str, coords_e, u_e, lam, mu, block,
               interpret):
    dn, w = _iso_tables(element_type)
    k = len(dn[0])
    kernel = _make_iso_apply_kernel(dn, w, k)
    C = coords_e.shape[0]
    Cp = _cdiv(C, block) * block

    def t(a):
        return jnp.pad(jnp.swapaxes(a.reshape(C, -1), 0, 1),
                       ((0, 0), (0, Cp - C)))

    out = pl.pallas_call(
        kernel,
        grid=(Cp // block,),
        in_specs=[
            pl.BlockSpec((3 * k, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * k, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3 * k, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3 * k, Cp), coords_e.dtype),
        interpret=interpret,
    )(t(coords_e), t(u_e),
      jnp.pad(lam.reshape(1, C), ((0, 0), (0, Cp - C))),
      jnp.pad(mu.reshape(1, C), ((0, 0), (0, Cp - C))))
    return jnp.swapaxes(out[:, :C], 0, 1).reshape(C, k, 3)


def _iso_ke(element_type: str, coords_e, lam, mu, block, interpret,
            transpose_out, stream=True):
    dn, w = _iso_tables(element_type)
    k = len(dn[0])
    ek = 3 * k
    make = _make_iso_ke_kernel_stream if stream else _make_iso_ke_kernel
    kernel = make(dn, w, k)
    C = coords_e.shape[0]
    Cp = _cdiv(C, block) * block
    ct = jnp.pad(jnp.swapaxes(coords_e.reshape(C, ek), 0, 1),
                 ((0, 0), (0, Cp - C)))
    out = pl.pallas_call(
        kernel,
        grid=(Cp // block,),
        in_specs=[
            pl.BlockSpec((ek, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ek * ek, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ek * ek, Cp), coords_e.dtype),
        interpret=interpret,
    )(ct,
      jnp.pad(lam.reshape(1, C), ((0, 0), (0, Cp - C))),
      jnp.pad(mu.reshape(1, C), ((0, 0), (0, Cp - C))))
    if not transpose_out:
        return out[:, :C]
    return jnp.swapaxes(out[:, :C], 0, 1).reshape(C, ek, ek)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def tet10_apply_pallas(coords_e: jnp.ndarray, u_e: jnp.ndarray,
                       lam: jnp.ndarray, mu: jnp.ndarray,
                       block: int = 256,
                       interpret: bool = False) -> jnp.ndarray:
    """Fused f_e = Ke @ u_e for Tet10 batches (isoparametric, 4-point
    order-2 rule — the reference's quadratic path,
    FiniteElementAnalysis.jl:160-168)."""
    return _iso_apply("tet10", coords_e, u_e, lam, mu, block, interpret)


@functools.partial(jax.jit, static_argnames=("block", "interpret",
                                             "transpose_out", "stream"))
def hex8_element_stiffness_pallas(coords_e: jnp.ndarray, lam: jnp.ndarray,
                                  mu: jnp.ndarray, block: int = 256,
                                  interpret: bool = False,
                                  transpose_out: bool = True,
                                  stream: bool = True) -> jnp.ndarray:
    """Fused Hex8 Ke batch [C,8,3] -> [C,24,24] (2x2x2 Gauss)."""
    return _iso_ke("hex8", coords_e, lam, mu, block, interpret,
                   transpose_out, stream)


@functools.partial(jax.jit, static_argnames=("block", "interpret",
                                             "transpose_out", "stream"))
def tet10_element_stiffness_pallas(coords_e: jnp.ndarray,
                                   lam: jnp.ndarray, mu: jnp.ndarray,
                                   block: int = 128,
                                   interpret: bool = False,
                                   transpose_out: bool = True,
                                   stream: bool = True) -> jnp.ndarray:
    """Fused Tet10 Ke batch [C,10,3] -> [C,30,30] (4-point rule)."""
    return _iso_ke("tet10", coords_e, lam, mu, block, interpret,
                   transpose_out, stream)
