"""Stencil (gather-free) matrix-free operator for structured box meshes.

On the uniform grids of models/beams.py every hexahedron is congruent, so
each of its 6 tetrahedra has *constant* physical shape-function gradients.
The SpMV then needs no connectivity at all: corner displacements of every
hex are shifted slices of the 3D node lattice, the per-tet-type physics is
elementwise over [nz, ny, nx] grids, and the transpose scatter is 8
shifted slice-adds — the stencil formulation XLA lowers at HBM bandwidth
(no gather/scatter ops, which lower near-scalar on TPU; docs/PERF_NOTES.md).

Same ``matvec`` contract as StiffnessOperator → drives cg()/multigrid
unchanged.  Supports uniform material and per-hex SIMP scaling.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.beams import _TET_SPLIT
from ..materials import lame_parameters

#: hex corner offsets in (iz, iy, ix), VTK order (matches models/beams.py)
_CORNER_OFFSETS = [(0, 0, 0), (0, 0, 1), (0, 1, 1), (0, 1, 0),
                   (1, 0, 0), (1, 0, 1), (1, 1, 1), (1, 1, 0)]


def _reference_tet_gradients(dx: float, dy: float, dz: float):
    """Constant gradients g [6, 4, 3] + volumes [6] for the 6 congruent
    tets of a dx*dy*dz hex (split _TET_SPLIT, models/beams.py)."""
    corners = np.array([(ox * dx, oy * dy, oz * dz)
                        for (oz, oy, ox) in _CORNER_OFFSETS])
    g = np.zeros((6, 4, 3))
    vol = np.zeros(6)
    for t, tet in enumerate(np.asarray(_TET_SPLIT)):
        X = corners[tet]                       # [4, 3]
        E = X[1:] - X[0]                       # edge matrix (rows)
        det = np.linalg.det(E)
        vol[t] = det / 6.0
        invE = np.linalg.inv(E)
        # dN_{i+1}/dx_a = (E^{-1})[a][i]
        g[t, 1:, :] = invE.T
        g[t, 0, :] = -invE.T.sum(axis=0)
    return g, vol


@dataclasses.dataclass(frozen=True)
class StructuredStiffnessOperator:
    """Gather-free stiffness operator on an (nx, ny, nz) box of 6-tet hexes.

    ``escale`` is an optional per-hex Young's-modulus scale grid
    [nz, ny, nx] (SIMP); material is otherwise uniform (lam, mu).

    The per-tet-type gradients/volumes and the material scalars are
    *static* (baked as compile-time constants, pytree aux data): the axon
    backend miscompiles while_loop bodies when tiny/scalar arrays arrive
    as program arguments (tools/tpu_check_struct11.py: identical CG
    produced rel-diff 0.99 between argument-passed and closed-over
    pytrees) — and they are genuine mesh-family constants anyway.
    """

    g: tuple                  # ((4 x (3 floats)),)*6 constant gradients
    vol: tuple                # 6 floats
    lam: float
    mu: float
    free_mask_flat: jnp.ndarray      # [ndof] (1D leaf; 4D argument arrays
                                     # also miscompiled on axon)
    escale: Optional[jnp.ndarray]    # [nz, ny, nx] or None
    dims: Tuple[int, int, int] = dataclasses.field(
        metadata={"static": True})   # (nx, ny, nz) cells

    @property
    def n_dofs(self) -> int:
        nx, ny, nz = self.dims
        return 3 * (nx + 1) * (ny + 1) * (nz + 1)

    @property
    def free_mask(self) -> jnp.ndarray:
        return self.free_mask_flat

    @property
    def free_mask3d(self) -> jnp.ndarray:
        nx, ny, nz = self.dims
        return self.free_mask_flat.reshape(nz + 1, ny + 1, nx + 1, 3)

    @staticmethod
    def build(nx: int, ny: int, nz: int,
              lo: Sequence[float], hi: Sequence[float],
              lam: float, mu: float,
              free_mask: Optional[np.ndarray] = None,
              escale: Optional[np.ndarray] = None,
              dtype=jnp.float32) -> "StructuredStiffnessOperator":
        dx = (hi[0] - lo[0]) / nx
        dy = (hi[1] - lo[1]) / ny
        dz = (hi[2] - lo[2]) / nz
        g, vol = _reference_tet_gradients(dx, dy, dz)
        if free_mask is None:
            free_mask = np.ones(3 * (nx + 1) * (ny + 1) * (nz + 1))
        m_flat = np.asarray(free_mask, np.float64).reshape(-1)
        g_t = tuple(tuple(tuple(float(x) for x in row) for row in gt)
                    for gt in g)
        return StructuredStiffnessOperator(
            g=g_t, vol=tuple(float(v) for v in vol),
            lam=float(lam), mu=float(mu),
            free_mask_flat=jnp.asarray(m_flat, dtype),
            escale=(None if escale is None
                    else jnp.asarray(escale, dtype).reshape(nz, ny, nx)),
            dims=(int(nx), int(ny), int(nz)))

    # -- application ---------------------------------------------------------

    def _hex_ke(self) -> np.ndarray:
        """Assembled 24x24 uniform-material hex stiffness (corner-major
        DOF order k*3+a) from the 6 congruent tets.  Built from static
        aux fields only → a compile-time constant under jit."""
        K = np.zeros((24, 24))
        eye = np.eye(3)
        for t in range(6):
            tet = [int(i) for i in np.asarray(_TET_SPLIT[t])]
            gt = np.asarray(self.g[t])             # [4, 3]
            for i in range(4):
                for j in range(4):
                    blk = (self.lam * np.outer(gt[i], gt[j])
                           + self.mu * np.outer(gt[j], gt[i])
                           + self.mu * float(gt[i] @ gt[j]) * eye)
                    K[tet[i] * 3:tet[i] * 3 + 3,
                      tet[j] * 3:tet[j] * 3 + 3] += self.vol[t] * blk
        return K

    def matvec_raw(self, u: jnp.ndarray) -> jnp.ndarray:
        """Apply the raw (unconstrained) operator.

        Formulations, selected by TOPOPT_STENCIL (default ``slices``):
        - ``slices``: per-tet-type elementwise grids (rounds 1-3) —
          the only XLA formulation that is CORRECT on the axon backend.
          Measured 2.3 ms/matvec at 1.23M tets (warm chain, round 4).
        - ``conv``: two tiny-channel 3D convolutions (gather-conv with
          the assembled hex Ke folded into the weights → per-cell SIMP
          scale → scatter-conv).  REJECTED on axon: C=3/24 channel dims
          are lane-padded to 128 (~40x HBM traffic, 545 ms/matvec) AND
          the e2e solve diverged (energy -1.6e7 vs +324) while the same
          program is exact to 1e-11 on CPU.  Kept as a documented
          experiment + CPU parity case only.
        - a cell-batched [C,24]x[24,24] MXU matmul formulation was
          likewise rejected (550 ms + miscompile) and removed.
        Both failures share one root: on this backend any MATERIALIZED
        array with a tiny minor dim is padded to 128 lanes, and the
        padded-op classes miscompile inside while_loop bodies.  Fast
        path must keep a large grid dim minor (the Pallas stencil
        kernel reads the flat DOF vector as [NZ*NY, NX*3])."""
        default = ("pallas" if jax.default_backend() != "cpu"
                   else "slices")
        mode = os.environ.get("TOPOPT_STENCIL", default).lower()
        if mode == "pallas" and self.n_dofs < int(os.environ.get(
                "TOPOPT_STENCIL_MIN_DOFS", "0")):
            mode = "slices"                  # debug bisect knob
        if mode == "pallas":
            from ..ops.pallas_stencil import stencil_matvec
            return stencil_matvec(
                u, self.escale, self._hex_ke(), self.dims,
                interpret=jax.default_backend() == "cpu")
        if mode == "conv":
            return self._matvec_raw_conv(u)
        return self._matvec_raw_slices(u)

    def _conv_weights(self):
        """Weights for the two-conv formulation (trace-time constants).

        w1 (gather): F[c, j*3+a] = sum_{k,b} Ke[j3a, k3b] u[c+off_k, b]
        over the VALID cell grid — boundary-exact by construction, the
        cell grid only covers real hexes.
        w2 (scatter): out[n, a] = sum_j F[n-off_j, j*3+a] via a SAME-
        padded correlation on the cell grid.
        """
        ke = self._hex_ke()
        w1 = np.zeros((2, 2, 2, 3, 24))
        w2 = np.zeros((2, 2, 2, 24, 3))
        for j, (ozj, oyj, oxj) in enumerate(_CORNER_OFFSETS):
            for a in range(3):
                w2[1 - ozj, 1 - oyj, 1 - oxj, j * 3 + a, a] = 1.0
                for k, (ozk, oyk, oxk) in enumerate(_CORNER_OFFSETS):
                    for b in range(3):
                        w1[ozk, oyk, oxk, b, j * 3 + a] = ke[j * 3 + a,
                                                             k * 3 + b]
        return w1, w2

    def _matvec_raw_conv(self, u: jnp.ndarray) -> jnp.ndarray:
        from jax import lax
        nx, ny, nz = self.dims
        w1, w2 = self._conv_weights()
        dt = u.dtype
        dn = ("NDHWC", "DHWIO", "NDHWC")
        # precision pinned: the TPU default runs fp32 convs in bf16
        # passes, which perturbs the operator far beyond CG tolerances
        prec = lax.Precision.HIGHEST
        u5 = u.reshape(1, nz + 1, ny + 1, nx + 1, 3)
        f = lax.conv_general_dilated(
            u5, jnp.asarray(w1, dt), (1, 1, 1), "VALID",
            dimension_numbers=dn, precision=prec)
        if self.escale is not None:
            f = f * self.escale[None, :, :, :, None].astype(dt)
        out = lax.conv_general_dilated(
            f, jnp.asarray(w2, dt), (1, 1, 1),
            ((1, 1), (1, 1), (1, 1)), dimension_numbers=dn,
            precision=prec)
        return out.reshape(-1)

    def _matvec_raw_slices(self, u: jnp.ndarray) -> jnp.ndarray:
        # component-major internals: every array in the loop body is a
        # plain [nz, ny, nx] grid (no minor-dim-3 tensors, no stacks in
        # the hot path) — both for layout efficiency and to avoid backend
        # miscompiles observed with the packed layout in loop contexts
        nx, ny, nz = self.dims
        u4 = u.reshape(nz + 1, ny + 1, nx + 1, 3)
        ucomp = [u4[..., a] for a in range(3)]
        uc = [[ucomp[a][oz:oz + nz, oy:oy + ny, ox:ox + nx]
               for a in range(3)] for (oz, oy, ox) in _CORNER_OFFSETS]
        acc = [[None] * 3 for _ in range(8)]   # [corner][comp]

        for t in range(6):
            tet = [int(i) for i in np.asarray(_TET_SPLIT[t])]
            gt = self.g[t]                    # 4 x (3 floats), static
            ue = [uc[c] for c in tet]         # 4 x [3 grids]
            # grad_u[a][b] = sum_k ue[k][a] * g[k][b]
            gu = [[sum(ue[k][a] * gt[k][b] for k in range(4))
                   for b in range(3)] for a in range(3)]
            tr = gu[0][0] + gu[1][1] + gu[2][2]
            w = self.vol[t] * (self.escale if self.escale is not None
                               else 1.0)
            lam_tr = self.lam * tr
            sig = [[self.mu * (gu[a][b] + gu[b][a])
                    + (lam_tr if a == b else 0.0)
                    for b in range(3)] for a in range(3)]
            for k in range(4):
                c = tet[k]
                for a in range(3):
                    val = w * (sig[a][0] * gt[k][0] + sig[a][1] * gt[k][1]
                               + sig[a][2] * gt[k][2])
                    acc[c][a] = (val if acc[c][a] is None
                                 else acc[c][a] + val)

        fcomp = []
        for a in range(3):
            fa = jnp.zeros((nz + 1, ny + 1, nx + 1), u.dtype)
            for c, (oz, oy, ox) in enumerate(_CORNER_OFFSETS):
                fa = fa + jnp.pad(acc[c][a], ((oz, 1 - oz), (oy, 1 - oy),
                                              (ox, 1 - ox)))
            fcomp.append(fa)
        return jnp.stack(fcomp, axis=-1).reshape(-1)

    def matvec(self, u: jnp.ndarray) -> jnp.ndarray:
        m = self.free_mask
        return m * self.matvec_raw(m * u) + (1.0 - m) * u

    # -- preconditioning ------------------------------------------------------

    def node_blocks_raw(self) -> jnp.ndarray:
        """3x3 node blocks via 8 shifted adds of constant per-corner
        blocks (uniform material) or escale-weighted grids (SIMP)."""
        nx, ny, nz = self.dims
        dtype = self.free_mask_flat.dtype
        blocks3 = jnp.zeros((nz + 1, ny + 1, nx + 1, 3, 3), dtype=dtype)
        eye = np.eye(3)
        pads = lambda oz, oy, ox: ((oz, 1 - oz), (oy, 1 - oy),
                                   (ox, 1 - ox), (0, 0), (0, 0))
        for t in range(6):
            tet = [int(i) for i in np.asarray(_TET_SPLIT[t])]
            gt = np.asarray(self.g[t])
            for k in range(4):
                gk = gt[k]
                outer = (self.lam + self.mu) * np.outer(gk, gk) \
                    + self.mu * np.dot(gk, gk) * eye
                blk = jnp.asarray(self.vol[t] * outer, dtype)  # [3,3]
                if self.escale is not None:
                    contrib = self.escale[..., None, None] * blk
                else:
                    contrib = jnp.broadcast_to(blk, (nz, ny, nx, 3, 3))
                oz, oy, ox = _CORNER_OFFSETS[tet[k]]
                blocks3 = blocks3 + jnp.pad(
                    jnp.broadcast_to(contrib, (nz, ny, nx, 3, 3)),
                    pads(oz, oy, ox))
        return blocks3.reshape(-1, 3, 3)

    def diagonal_raw(self) -> jnp.ndarray:
        blocks = self.node_blocks_raw()
        return jax.vmap(jnp.diag)(blocks).reshape(-1)

    def diagonal(self) -> jnp.ndarray:
        m = self.free_mask
        return m * m * self.diagonal_raw() + (1.0 - m)

    # -- reductions -----------------------------------------------------------

    def energy(self, u: jnp.ndarray) -> jnp.ndarray:
        """0.5 u^T K u (reference: FiniteElementAnalysis.jl:550), same
        contract as StiffnessOperator.energy."""
        from .solvers import precise_dtype
        Ku = self.matvec(u)
        pd = precise_dtype()
        return 0.5 * jnp.vdot(u.astype(pd), Ku.astype(pd))


jax.tree_util.register_pytree_node(
    StructuredStiffnessOperator,
    lambda o: ((o.free_mask_flat, o.escale),
               (o.g, o.vol, o.lam, o.mu, o.dims)),
    lambda aux, leaves: StructuredStiffnessOperator(
        aux[0], aux[1], aux[2], aux[3], leaves[0], leaves[1], aux[4]))
