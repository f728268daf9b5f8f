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

from ..mesh import Mesh
from ..models.beams import generate_grid_hex, generate_grid_tet
from .operator import StiffnessOperator
from .solvers import block_jacobi_preconditioner


# ---------------------------------------------------------------------------
# Coarsest-level pseudo-inverse eigencut (shared with fem/bell.py)
# ---------------------------------------------------------------------------


def coarse_pinv_weights(evals: np.ndarray, dtype) -> np.ndarray:
    """Inverse-eigenvalue weights for the coarsest-level pseudo-inverse.

    Two failure modes pull the cutoff in opposite directions:

    * Rank-deficient junk modes (voxel-embedded coarse bases over porous /
      partially-filled geometry) must be DISCARDED: inverting them turns
      the coarse correction into rounding-noise amplification and stalls
      the outer fp32 CG (observed on the bundled SIMP hex fixture).
    * Genuine global physics can land arbitrarily low: on the slender
      1.23M-tet bench beam the two global bending modes sit at RELATIVE
      coarsest eigenvalues 1e-8..1e-6 — below a fixed fp32 cutoff of
      1e-6 — and zeroing them leaves lambda_min(M A) ~ 1e-6 on the fine
      level, which destroys the attainable accuracy of the solve
      (measured: energy -702 vs fp64 oracle +324 at backward error 1e-6).

    The hierarchy is built host-side in fp64, so eigh resolves real modes
    down to ~1e-13 relative; structural junk clusters many decades below
    the lowest physics (measured beam gap: 1e-16 vs 1e-8).  The cut is
    therefore placed at the largest spectral GAP whose lower edge is in
    the numerical-zero zone (<= 1e-11 relative).  When no such clean gap
    exists (SIMP void-mode continua), fall back to the legacy fixed
    ceiling — exactly the behavior that fixed the porous stall.
    """
    evals = np.asarray(evals, np.float64)
    lam_max = max(float(evals.max()), 1e-300)
    rel = evals / lam_max
    ceiling = 1e-6 if jnp.dtype(dtype) == jnp.float32 else 1e-10
    noise = 1e-11
    cut = ceiling
    low = np.sort(rel[(rel > 0) & (rel < ceiling)])
    if low.size:
        if low[0] > noise:
            # numerically full rank below the ceiling: nothing is junk,
            # the exact inverse is the ideal coarse solve — keep all.
            cut = noise
        else:
            above = rel[rel >= ceiling]
            fence = float(above.min()) if above.size else 1.0
            seq = np.concatenate([np.maximum(low, 1e-300), [fence]])
            ratios = seq[1:] / seq[:-1]
            # candidate gaps must START in the junk zone
            ratios = np.where(seq[:-1] <= noise, ratios, 0.0)
            j = int(np.argmax(ratios))
            if ratios[j] >= 1e3:
                cut = float(np.sqrt(seq[j] * seq[j + 1]))
    cut_abs = lam_max * cut
    keep = evals > cut_abs
    return np.where(keep, 1.0 / np.where(keep, evals, 1.0), 0.0)


# ---------------------------------------------------------------------------
# Transfer operators between nested structured node lattices
# ---------------------------------------------------------------------------


def _axis_parents(i: int) -> Tuple[Tuple[int, float], ...]:
    if i % 2 == 0:
        return ((i // 2, 1.0),)
    return ((i // 2, 0.5), (i // 2 + 1, 0.5))


def _restriction_incidence(parents: np.ndarray, N_c: int) -> np.ndarray:
    """Incidence table [N_c, Dc] of (fine, slot) contributions per coarse
    node for the P^T gather; sentinel rows index an appended zero row."""
    N_f = parents.shape[0]
    flat_targets = parents.reshape(-1).astype(np.int64)      # [N_f*8]
    real = np.flatnonzero(flat_targets < N_c)                # drop sentinels
    order = real[np.argsort(flat_targets[real], kind="stable")]
    sorted_t = flat_targets[order]
    starts = np.searchsorted(sorted_t, np.arange(N_c), "left")
    ends = np.searchsorted(sorted_t, np.arange(N_c), "right")
    degree = ends - starts
    Dc = max(int(degree.max()) if degree.size else 1, 1)
    inc = np.full((N_c, Dc), N_f * parents.shape[1],
                  dtype=np.int64)                            # zero-row pad
    col = (np.concatenate([np.arange(d) for d in degree])
           if degree.sum() else np.zeros(0, np.int64))
    rows = np.repeat(np.arange(N_c), degree)
    inc[rows, col] = order
    return inc.astype(np.int32)


def propagate_fixed(parents: np.ndarray, weights: np.ndarray,
                    fixed_fine: np.ndarray, n_coarse: int) -> np.ndarray:
    """Coarse Dirichlet mask from a fine one: coarse (node, comp) is fixed
    iff any fine fixed node maps to it with positive weight.  Exact for
    domain-face plane constraints on nested lattices (plane nodes only
    ever parent to plane nodes)."""
    fixed_fine = np.asarray(fixed_fine, bool).reshape(parents.shape[0], 3)
    out = np.zeros((n_coarse + 1, 3), dtype=bool)   # +1 sentinel slot
    live = weights > 0
    for comp in range(3):
        rows = fixed_fine[:, comp]
        tgt = parents[rows][live[rows]]
        if tgt.size:
            cnt = np.bincount(tgt, minlength=n_coarse + 1)
            out[:, comp] |= cnt > 0
    return out[:n_coarse]


def build_transfer_tables(nx_f: int, ny_f: int, nz_f: int):
    """Trilinear prolongation tables between node lattices of a
    (nx_f, ny_f, nz_f)-cell box and its 2x-coarsened counterpart.

    Returns (parents [N_f, 8], weights [N_f, 8], incidence [N_c, Dc])
    as NumPy arrays.
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

    return parents, weights, _restriction_incidence(parents, N_c)


@dataclasses.dataclass(frozen=True)
class Transfer:
    """Prolongation (coarse→fine) / restriction (fine→coarse) pair.

    ``chunked`` selects between two ALGEBRAICALLY IDENTICAL lowerings and
    is pinned per hierarchy, because the axon TPU backend miscompiles
    some while_loop bodies and the safe HLO differs per program
    (docs/PERF_NOTES.md):

    - False (structured stencil hierarchy): the round-1 vectorized form —
      one [N_f, 8, 3] gather / one [N_c, Dc, 3] gather.  Proven by the
      structured bench's energy gate; the chunked form silently corrupted
      it (energy off 10% while backward-stable, the known signature).
    - True (voxel Galerkin hierarchy): slot-wise prolong + width-chunked
      restrict.  Required at 1M-tet scale — the vectorized gathers pad
      minor dim 3 → 128 (42x; the restrict alone wants ~9 GB) — and
      integrity-gate-validated in tools/bench_unstructured.py."""

    parents: jnp.ndarray    # [N_f, 8] int32
    weights: jnp.ndarray    # [N_f, 8]
    incidence: jnp.ndarray  # [N_c, Dc] int32 into [N_f*8] flat (+ sentinel)
    chunked: bool = dataclasses.field(default=False,
                                      metadata={"static": True})

    def prolong(self, u_c: jnp.ndarray) -> jnp.ndarray:
        """[N_c, 3] → [N_f, 3]: row gathers + weighted sum.  Sentinel
        parent ids index an appended zero row."""
        u_pad = jnp.concatenate(
            [u_c, jnp.zeros((1, 3), u_c.dtype)], axis=0)
        if not self.chunked:
            rows = u_pad[self.parents]                       # [N_f, 8, 3]
            return jnp.sum(rows * self.weights[:, :, None], axis=1)
        out = None
        for s in range(self.parents.shape[1]):
            term = u_pad[self.parents[:, s]] * self.weights[:, s][:, None]
            out = term if out is None else out + term
        return out

    def restrict(self, r_f: jnp.ndarray) -> jnp.ndarray:
        """[N_f, 3] → [N_c, 3]: P^T via incidence gather."""
        contrib = (self.weights[:, :, None]
                   * r_f[:, None, :]).reshape(-1, 3)         # [N_f*8, 3]
        contrib = jnp.concatenate(
            [contrib, jnp.zeros((1, 3), r_f.dtype)], axis=0)
        if not self.chunked:
            return jnp.sum(contrib[self.incidence], axis=1)
        Dc = self.incidence.shape[1]
        N_c = self.incidence.shape[0]
        CH = 8 if N_c > 60_000 else 32
        out = None
        for s in range(0, Dc, CH):
            term = jnp.sum(contrib[self.incidence[:, s:s + CH]], axis=1)
            out = term if out is None else out + term
        return out


def _transfer_flatten(t: Transfer):
    return ((t.parents, t.weights, t.incidence), (t.chunked,))


def _transfer_unflatten(aux, leaves):
    return Transfer(*leaves, aux[0])


jax.tree_util.register_pytree_node(Transfer, _transfer_flatten,
                                   _transfer_unflatten)


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
                        lam, mu) -> np.ndarray:
    """fp64 Tet4 element stiffness batch [C, 12, 12] (constant-B exact
    1-point rule; same math as ops/pallas_kernels._tet4_ke_kernel).
    ``lam``/``mu`` may be scalars or per-element [C] arrays (SIMP)."""
    X = np.asarray(coords, np.float64)[conn]       # [C,4,3]
    E = X[:, 1:] - X[:, :1]
    vol = np.linalg.det(E) / 6.0
    invE = np.linalg.inv(E)
    C = conn.shape[0]
    lam = np.broadcast_to(np.asarray(lam, np.float64), (C,))
    mu = np.broadcast_to(np.asarray(mu, np.float64), (C,))
    l5 = lam[:, None, None, None, None]
    m5 = mu[:, None, None, None, None]
    g = np.empty((C, 4, 3))
    g[:, 1:, :] = np.transpose(invE, (0, 2, 1))
    g[:, 0, :] = -g[:, 1:, :].sum(axis=1)
    dots = np.einsum("cia,cja->cij", g, g)
    ke = (l5 * np.einsum("cia,cjb->ciajb", g, g)
          + m5 * np.einsum("cib,cja->ciajb", g, g)
          + m5 * dots[:, :, None, :, None] * np.eye(3)[None, None, :,
                                                       None, :])
    return vol[:, None, None] * ke.reshape(C, 12, 12)


def _host_dense_constrained_matrix(mesh: Mesh, lam, mu,
                                   free_mask: np.ndarray) -> np.ndarray:
    """Dense fp64 K' = M K M + (I - M) of a small tet4 mesh on host.
    ``lam``/``mu`` may be per-element arrays (SIMP)."""
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
    lam_max: Optional[float] = None   # lambda_max(B^-1 A), Chebyshev bound


jax.tree_util.register_pytree_node(
    MGLevel, lambda l: ((l.op, l.binv, l.transfer), (l.lam_max,)),
    lambda aux, leaves: MGLevel(*leaves, aux[0]))


@dataclasses.dataclass(frozen=True)
class MultigridPreconditioner:
    """Symmetric V-cycle: pre/post block-smoothing + exact dense coarse
    solve.  Drop-in ``M`` for :func:`..fem.solvers.cg`
    (``apply_preconditioner`` dispatches on the ``apply`` method).

    Two smoothers (same matvec cost per sweep):

    - ``"jacobi"``: damped block-Jacobi.  ``omega`` must satisfy
      omega * lambda_max(B^-1 A) < 2 to contract; for tet meshes with
      non-cubic cells lambda_max exceeds 2, so the safe-and-fast default
      is 0.7 (0.9 diverges already at 1.25:1 cell anisotropy).
    - ``"chebyshev"``: block-Jacobi-preconditioned Chebyshev targeting
      [lam_max/4, 1.05*lam_max] per level (each MGLevel carries its
      measured lam_max).  Much stronger on irregular meshes, where
      lam_max ~ 3-4 forces the Jacobi omega far below 1; the fixed
      polynomial keeps the V-cycle symmetric → still a valid CG
      preconditioner.
    """

    levels: Tuple[MGLevel, ...]
    coarse_inv: jnp.ndarray      # [n_dofs_c, n_dofs_c] dense inverse
    omega: float = dataclasses.field(default=0.7,
                                     metadata={"static": True})
    nu: int = dataclasses.field(default=2, metadata={"static": True})
    smoother: str = dataclasses.field(default="jacobi",
                                      metadata={"static": True})

    def _smooth(self, L: MGLevel, r2d, z2d, sweeps: int):
        if self.smoother == "chebyshev" and L.lam_max is not None:
            return self._smooth_chebyshev(L, r2d, z2d, sweeps)
        for s in range(sweeps):
            if z2d is None:
                res = r2d
            else:
                Az = L.op.matvec(z2d.reshape(-1)).reshape(-1, 3)
                res = r2d - Az
            dz = _einsum("nab,nb->na", L.binv, res)
            z2d = self.omega * dz if z2d is None else z2d + self.omega * dz
        return z2d

    def _smooth_chebyshev(self, L: MGLevel, r2d, z2d, sweeps: int):
        """Three-term Chebyshev recurrence on B^-1 A over
        [lam_max/4, 1.1 lam_max].  The 1.1 headroom matters: Chebyshev
        polynomials grow fast OUTSIDE the band, so an underestimated
        lam_max (power iteration on an irregular spectrum) would turn the
        smoother into an amplifier."""
        b = 1.1 * L.lam_max
        a = L.lam_max / 4.0
        theta = 0.5 * (b + a)
        delta = 0.5 * (b - a)
        s1 = theta / delta

        def binv(v2d):
            return _einsum("nab,nb->na", L.binv, v2d)

        if z2d is None:
            rr = r2d
            d = binv(rr) * (1.0 / theta)
            z2d = d
        else:
            Az = L.op.matvec(z2d.reshape(-1)).reshape(-1, 3)
            rr = r2d - Az
            d = binv(rr) * (1.0 / theta)
            z2d = z2d + d
        rho_old = 1.0 / s1
        for _ in range(sweeps - 1):
            rho = 1.0 / (2.0 * s1 - rho_old)
            Az = L.op.matvec(z2d.reshape(-1)).reshape(-1, 3)
            rr = r2d - Az
            d = (rho * rho_old) * d + (2.0 * rho / delta) * binv(rr)
            z2d = z2d + d
            rho_old = rho
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
    lambda m: ((m.levels, m.coarse_inv), (m.omega, m.nu, m.smoother)),
    lambda aux, leaves: MultigridPreconditioner(tuple(leaves[0]), leaves[1],
                                                aux[0], aux[1], aux[2]))


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
        free_mask: Optional[np.ndarray] = None,
        escale: Optional[np.ndarray] = None,
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

    ``free_mask`` (fine-level, [ndof]) generalizes the fixed-plane BC:
    coarse-level masks derive by transfer-weight propagation (exact for
    domain-face planes).  ``escale`` is an optional per-hex [nz, ny, nx]
    Young's-modulus scale grid (SIMP); coarser levels use 2x2x2 averages.
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
    mask = None
    esc = (None if escale is None
           else np.asarray(escale, np.float64).reshape(nz, ny, nx))
    for li in range(n_levels):
        f = 2 ** li
        cnx, cny, cnz = nx // f, ny // f, nz // f
        mesh = gen(cnx, cny, cnz, lo, hi)
        if li == 0:
            if free_mask is not None:
                mask = np.asarray(free_mask, np.float64).reshape(-1)
            else:
                fixed = nodes_at_plane(mesh, fixed_plane_axis,
                                       fixed_plane_value, tol=1e-9)
                mask = free_mask_from_bcs(mesh.n_dofs,
                                          [DirichletBC.fixed(fixed)])
        if structured_path:
            from .structured import StructuredStiffnessOperator
            op = StructuredStiffnessOperator.build(
                cnx, cny, cnz, lo, hi, lam, mu, free_mask=mask,
                escale=esc, dtype=dtype)
            # host build: zero device dispatches/compiles (see host-side
            # builders above); parity with the device path is tested
            binv = jnp.asarray(_host_block_jacobi(
                _host_node_blocks_structured(op), mask), dtype)
        else:
            dmesh = mesh.device(dtype=dtype)
            lam_e, mu_e = lam, mu
            if esc is not None:
                # [nz,ny,nx] grid → x-major hex order (models/beams.py
                # _hex_conn), 6 tets per hex for tet meshes
                rep = 6 if element == "tet4" else 1
                e_t = np.repeat(esc.transpose(2, 1, 0).reshape(-1), rep)
                lam_e, mu_e = lam * e_t, mu * e_t
            op = StiffnessOperator.build(dmesh, lam_e, mu_e,
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
            # propagate the Dirichlet mask + average the material down
            n_coarse = (cnx // 2 + 1) * (cny // 2 + 1) * (cnz // 2 + 1)
            fixed_c = propagate_fixed(parents, weights,
                                      mask.reshape(-1, 3) == 0, n_coarse)
            mask = np.where(fixed_c, 0.0, 1.0).reshape(-1)
            if esc is not None:
                esc = esc.reshape(cnz // 2, 2, cny // 2, 2,
                                  cnx // 2, 2).mean(axis=(1, 3, 5))
        levels.append(MGLevel(op, binv, transfer))
        if li == 0:
            fine_mesh, fine_op = mesh, op

    # exact dense inverse of the coarsest constrained operator
    coarsest = levels[-1].op
    n_c = coarsest.n_dofs
    if structured_path:
        # assemble the coarse matrix on host (mesh/mask from the last loop
        # iteration ARE the coarsest level's)
        lam_c, mu_c = lam, mu
        if esc is not None:
            e_t = np.repeat(esc.transpose(2, 1, 0).reshape(-1), 6)
            lam_c, mu_c = lam * e_t, mu * e_t
        K_c = _host_dense_constrained_matrix(mesh, lam_c, mu_c, mask)
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


# ---------------------------------------------------------------------------
# Unstructured multigrid: voxel-embedded geometric coarsening
#
# The reference's core use case is an ARBITRARY imported mesh through one
# solve entry (reference: FiniteElementAnalysis.jl:547 works on any mesh).
# The TPU-native fast path for that case built here: the fine level is the
# general matrix-free operator (Pallas fused apply), and all coarse levels
# live on a structured voxel lattice embedded over the mesh bounding box —
# the fine→voxel transfer is a trilinear gather table (same Transfer
# machinery as the nested-lattice tables), and every coarse level rides the
# gather-free stencil operator (fem/structured.py), which lowers at HBM
# bandwidth on TPU.  Voxel material = deposited element volume fraction
# (density/SIMP-weighted), so the coarse operator approximates the fine
# elasticity including void regions.
# ---------------------------------------------------------------------------


def build_voxel_transfer(coords: np.ndarray, lo, hi,
                         dims: Tuple[int, int, int]):
    """Trilinear embedding of arbitrary nodes into a (vx, vy, vz)-cell
    voxel lattice over [lo, hi].

    Returns (parents [N, 8], weights [N, 8], incidence) NumPy arrays in
    the :class:`Transfer` format (sentinel id = n_coarse for zero-weight
    slots, keeping the restriction incidence narrow).
    """
    vx, vy, vz = (int(d) for d in dims)
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    coords = np.asarray(coords, np.float64)
    N = coords.shape[0]
    N_c = (vx + 1) * (vy + 1) * (vz + 1)
    d = np.array([vx, vy, vz], np.float64)
    span = np.where(hi - lo > 0, hi - lo, 1.0)
    t = (coords - lo) / span * d
    cell = np.clip(np.floor(t).astype(np.int64), 0,
                   np.array([vx, vy, vz]) - 1)
    frac = np.clip(t - cell, 0.0, 1.0)
    parents = np.empty((N, 8), dtype=np.int64)
    weights = np.empty((N, 8), dtype=np.float64)
    s = 0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                w = ((frac[:, 0] if dx else 1.0 - frac[:, 0])
                     * (frac[:, 1] if dy else 1.0 - frac[:, 1])
                     * (frac[:, 2] if dz else 1.0 - frac[:, 2]))
                cid = ((cell[:, 0] + dx) + (cell[:, 1] + dy) * (vx + 1)
                       + (cell[:, 2] + dz) * (vx + 1) * (vy + 1))
                parents[:, s] = np.where(w > 0, cid, N_c)
                weights[:, s] = w
                s += 1
    return (parents.astype(np.int32), weights,
            _restriction_incidence(parents, N_c))


def galerkin_voxel_operator(op, transfer: Transfer, mask_c: np.ndarray,
                            dims: Tuple[int, int, int],
                            reach: Tuple[int, int, int] = (2, 2, 2),
                            dtype=jnp.float32):
    """True Galerkin coarse operator A_c = P^T A' P on the voxel lattice,
    computed by COLORED PROBING of the matrix-free fine operator: coarse
    lattice nodes of the same (mod 2*reach+1 per axis) color have disjoint
    in-reach stencils, so prod(2r+1)*3 masked matvecs recover every 3x3
    coupling block exactly.  One jitted ``lax.scan`` program.

    Rediscretized voxel operators diverge on porous/optimized geometry
    (no relation to P^T A P); the Galerkin form makes the coarse-grid
    correction an A-orthogonal projection — never error-increasing —
    restoring textbook V-cycle behavior on arbitrary meshes.

    Returns (ELLBlockOperator, updated mask_c): coarse dofs with an empty
    Galerkin row (voxel corners supporting no fine node) become fixed.
    """
    from .ell import ELLBlockOperator

    vx, vy, vz = (int(d) for d in dims)
    nxn, nyn, nzn = vx + 1, vy + 1, vz + 1
    N_c = nxn * nyn * nzn
    rx, ry, rz = reach
    px, py, pz = 2 * rx + 1, 2 * ry + 1, 2 * rz + 1
    n_probes = px * py * pz * 3

    iz, iy, ix = np.meshgrid(np.arange(nzn), np.arange(nyn),
                             np.arange(nxn), indexing="ij")
    ix, iy, iz = ix.ravel(), iy.ravel(), iz.ravel()
    ix_d = jnp.asarray(ix % px, jnp.int32)
    iy_d = jnp.asarray(iy % py, jnp.int32)
    iz_d = jnp.asarray(iz % pz, jnp.int32)
    mask_c2 = jnp.asarray(mask_c, dtype).reshape(N_c, 3)
    eye3 = jnp.eye(3, dtype=dtype)

    # op/transfer must arrive as jit ARGUMENTS: closing over them would
    # bake their (potentially tens-of-MB) leaves into the program as
    # constants — the axon remote-compile endpoint rejects oversized
    # programs with HTTP 413 (docs/PERF_NOTES.md)
    @jax.jit
    def probe_all(op_, transfer_, mask_c2_):
        def body(carry, pidx):
            b = pidx % 3
            rest = pidx // 3
            cx = rest % px
            rest = rest // px
            cy = rest % py
            cz = rest // py
            ind = ((ix_d == cx) & (iy_d == cy) & (iz_d == cz)).astype(dtype)
            e = ind[:, None] * eye3[b][None, :] * mask_c2_
            v = transfer_.prolong(e)             # [N_f, 3], already zero
            w = op_.matvec(v.reshape(-1))        # at fine fixed dofs
            w2 = transfer_.restrict(w.reshape(-1, 3)) * mask_c2_
            # flatten: a stacked [P, N_c, 3] scan output would pad its
            # minor dim 3 to 128 on TPU (GBs at 1M-tet scale)
            return carry, w2.reshape(-1)
        _, W = jax.lax.scan(body, jnp.int32(0),
                            jnp.arange(n_probes, dtype=jnp.int32))
        return W

    W = np.asarray(probe_all(op, transfer, mask_c2),
                   np.float64).reshape(n_probes, N_c, 3)

    # host extraction: for row i and lattice offset o, the probed value at
    # i in the probe colored like j = i + o IS the (i, j) block column
    offsets = [(dx, dy, dz)
               for dz in range(-rz, rz + 1)
               for dy in range(-ry, ry + 1)
               for dx in range(-rx, rx + 1)]
    O = len(offsets)
    cols_full = np.full((N_c, O), N_c, dtype=np.int64)
    blocks_full = np.zeros((N_c, O, 3, 3))
    rows_idx = np.arange(N_c)
    for o_idx, (dx, dy, dz) in enumerate(offsets):
        jx, jy, jz = ix + dx, iy + dy, iz + dz
        valid = ((jx >= 0) & (jx < nxn) & (jy >= 0) & (jy < nyn)
                 & (jz >= 0) & (jz < nzn))
        j = jx + jy * nxn + jz * nxn * nyn
        cxx, cyy, czz = jx % px, jy % py, jz % pz
        base = ((czz * py + cyy) * px + cxx) * 3
        for b in range(3):
            vals = W[base + b, rows_idx, :]      # [N_c, 3]
            blocks_full[valid, o_idx, :, b] = vals[valid]
        cols_full[valid, o_idx] = j[valid]

    # pack rows: drop zero blocks, fix dofs whose Galerkin diagonal is 0
    nz = (np.abs(blocks_full).max(axis=(2, 3)) > 0) & (cols_full < N_c)
    o_diag = offsets.index((0, 0, 0))
    diag = blocks_full[:, o_diag][:, np.arange(3), np.arange(3)]  # [N_c,3]
    mask_new = np.asarray(mask_c, np.float64).reshape(N_c, 3).copy()
    mask_new[diag <= 0] = 0.0
    counts = nz.sum(axis=1)
    D = max(int(counts.max()) if N_c else 1, 1)
    order = np.argsort(~nz, axis=1, kind="stable")[:, :D]
    packed_nz = np.take_along_axis(nz, order, axis=1)
    cols_p = np.where(packed_nz,
                      np.take_along_axis(cols_full, order, axis=1), N_c)
    blocks_p = np.where(packed_nz[:, :, None, None],
                        np.take_along_axis(
                            blocks_full, order[:, :, None, None]
                            .repeat(3, 2).repeat(3, 3), axis=1), 0.0)
    ell = ELLBlockOperator.from_block_rows(cols_p, blocks_p,
                                           mask_new.reshape(-1), dtype)
    return ell, mask_new.reshape(-1)


def _rap_host(ell, parents: np.ndarray, weights: np.ndarray,
              n_coarse_nodes: int, mask_c: np.ndarray, dtype):
    """Host Galerkin triple product A_{l+1} = P^T A_l P between ELL levels
    (small matrices — scipy CSR math), returning (ELL operator, mask)."""
    import scipy.sparse as sp
    from .ell import ELLBlockOperator

    K = ell.to_scipy_bsr()                       # raw fp64
    N_f = parents.shape[0]
    live = (weights > 0) & (parents < n_coarse_nodes)
    rows = np.repeat(np.arange(N_f), parents.shape[1]).reshape(
        N_f, -1)[live]
    P_node = sp.coo_matrix((weights[live], (rows, parents[live])),
                           shape=(N_f, n_coarse_nodes)).tocsr()
    P_dof = sp.kron(P_node, sp.eye(3), format="csr")
    A2 = (P_dof.T @ K @ P_dof).tocsr()
    # prune numerical noise to keep the ELL width tight
    if A2.nnz:
        tol = 1e-14 * np.abs(A2.diagonal()).max()
        A2.data[np.abs(A2.data) < tol] = 0.0
        A2.eliminate_zeros()
    # fix dofs with empty/zero diagonal
    d = A2.diagonal()
    mask_new = np.asarray(mask_c, np.float64).reshape(-1).copy()
    mask_new[d <= 0] = 0.0
    return (ELLBlockOperator.from_scipy_bsr(A2, mask_new, dtype),
            mask_new)


class _HostFineOperator:
    """fp64 NumPy twin of the fine-level masked operator + its node
    blocks, for the MG BUILD only: on the axon backend the device
    versions cost minutes of remote compiles (chunked eager node-block
    reduction ~345 s, eager power iteration ~94 s at 1.2M tets), while
    the host computes both in well under a minute."""

    def __init__(self, mesh: Mesh, lam_e, mu_e, mask, order: int):
        from ..ops.elements import element_tables

        _, dN, w = element_tables(mesh.element_type, order)
        X = mesh.coords[mesh.conn]                      # [C,k,3]
        J = np.einsum("cka,qkb->cqab", X, dN, optimize=True)
        detJ = np.linalg.det(J)
        invJ = np.linalg.inv(
            np.where((detJ == 0)[..., None, None], np.eye(3), J))
        self.g = np.einsum("qkb,cqba->cqka", dN, invJ,
                           optimize=True)     # [C,q,k,3]
        self.wdet = w[None, :] * detJ                   # [C,q]
        self.conn = mesh.conn.astype(np.int64)
        self.n_nodes = mesh.n_nodes
        self.lam_e = np.asarray(lam_e, np.float64)
        self.mu_e = np.asarray(mu_e, np.float64)
        self.mask = np.asarray(mask, np.float64).reshape(-1)

    def node_blocks(self) -> np.ndarray:
        wl = self.wdet * self.lam_e[:, None]
        wm = self.wdet * self.mu_e[:, None]
        outer = (np.einsum("cq,cqka,cqkb->ckab", wl, self.g, self.g,
                           optimize=True)
                 + np.einsum("cq,cqkb,cqka->ckab", wm, self.g, self.g,
                             optimize=True))
        norm2 = np.einsum("cq,cqka,cqka->ck", wm, self.g, self.g,
                          optimize=True)
        blocks_ck = outer + norm2[..., None, None] * np.eye(3)
        flat = self.conn.reshape(-1)
        out = np.zeros((self.n_nodes, 3, 3))
        for a in range(3):
            for b in range(3):
                out[:, a, b] = np.bincount(
                    flat, weights=blocks_ck[:, :, a, b].reshape(-1),
                    minlength=self.n_nodes)
        return out

    def _ke32(self) -> np.ndarray:
        """Stored fp32 Ke batch [C, 3k, 3k] (chunked build) — turns the
        power-iteration matvec into one batched matmul (~1 s at 1.2M
        tets vs ~20 s for the strain-route einsum chain)."""
        if getattr(self, "_ke_cache", None) is not None:
            return self._ke_cache
        C, q, k, _ = self.g.shape
        ek = 3 * k
        ke = np.empty((C, ek, ek), np.float32)
        eye = np.eye(3)
        CH = 131072
        for c0 in range(0, C, CH):
            gs = self.g[c0:c0 + CH]
            wl = (self.wdet * self.lam_e[:, None])[c0:c0 + CH]
            wm = (self.wdet * self.mu_e[:, None])[c0:c0 + CH]
            K1 = np.einsum("cq,cqia,cqjb->ciajb", wl, gs, gs,
                           optimize=True)
            K2 = np.einsum("cq,cqib,cqja->ciajb", wm, gs, gs,
                           optimize=True)
            dots = np.einsum("cq,cqid,cqjd->cij", wm, gs, gs,
                             optimize=True)
            K3 = dots[:, :, None, :, None] * eye[None, None, :, None, :]
            ke[c0:c0 + CH] = (K1 + K2 + K3).reshape(-1, ek, ek)
        self._ke_cache = ke
        return ke

    def matvec(self, u: np.ndarray) -> np.ndarray:
        m = self.mask
        um = (m * u).reshape(self.n_nodes, 3)
        k = self.conn.shape[1]
        u_e = um[self.conn].reshape(-1, 3 * k, 1).astype(np.float32)
        f_e = (self._ke32() @ u_e)[:, :, 0].astype(np.float64)
        flat = self.conn.reshape(-1)
        f = np.zeros((self.n_nodes, 3))
        fe3 = f_e.reshape(-1, k, 3)
        for a in range(3):
            f[:, a] = np.bincount(flat, weights=fe3[:, :, a].reshape(-1),
                                  minlength=self.n_nodes)
        f = f.reshape(-1)
        return m * f + (1.0 - m) * u

    def _ke64(self) -> np.ndarray:
        """Exact fp64 Ke batch — the residual oracle for generic
        mixed-precision refinement (api._refined_generic): the fp32
        batch above carries a fixed storage-rounding BIAS ~eps32*||Ke||
        that would stall refinement exactly where it matters (see
        docs/PERF_NOTES.md on the BELL hi/lo split)."""
        if getattr(self, "_ke_cache64", None) is not None:
            return self._ke_cache64
        C, q, k, _ = self.g.shape
        ek = 3 * k
        ke = np.empty((C, ek, ek), np.float64)
        eye = np.eye(3)
        CH = 131072
        for c0 in range(0, C, CH):
            gs = self.g[c0:c0 + CH]
            wl = (self.wdet * self.lam_e[:, None])[c0:c0 + CH]
            wm = (self.wdet * self.mu_e[:, None])[c0:c0 + CH]
            K1 = np.einsum("cq,cqia,cqjb->ciajb", wl, gs, gs,
                           optimize=True)
            K2 = np.einsum("cq,cqib,cqja->ciajb", wm, gs, gs,
                           optimize=True)
            dots = np.einsum("cq,cqid,cqjd->cij", wm, gs, gs,
                             optimize=True)
            K3 = dots[:, :, None, :, None] * eye[None, None, :, None, :]
            ke[c0:c0 + CH] = (K1 + K2 + K3).reshape(-1, ek, ek)
        self._ke_cache64 = ke
        return ke

    def matvec64(self, u: np.ndarray) -> np.ndarray:
        """Exact fp64 masked matvec (m*K*m*u + (1-m)*u)."""
        m = self.mask
        um = (m * u).reshape(self.n_nodes, 3)
        k = self.conn.shape[1]
        ke = self._ke64()
        flat = self.conn.reshape(-1)
        f = np.zeros((self.n_nodes, 3))
        CH = 262144
        C = self.conn.shape[0]
        for c0 in range(0, C, CH):
            cn = self.conn[c0:c0 + CH]
            u_e = um[cn].reshape(-1, 3 * k, 1)
            fe3 = (ke[c0:c0 + CH] @ u_e)[:, :, 0].reshape(-1, k, 3)
            fl = cn.reshape(-1)
            for a in range(3):
                f[:, a] += np.bincount(
                    fl, weights=fe3[:, :, a].reshape(-1),
                    minlength=self.n_nodes)
        f = f.reshape(-1)
        return m * f + (1.0 - m) * u

    def power_lambda_max(self, binv: np.ndarray, iters: int = 12,
                         seed: int = 0) -> float:
        """Upper estimate of lambda_max(B^-1 A), inflated 10% to cover
        power-iteration under-convergence (Chebyshev needs an UPPER
        bound; its polynomial amplifies above the band)."""
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(3 * self.n_nodes) * self.mask
        v /= np.linalg.norm(v)
        lam = 0.0
        for _ in range(iters):
            w = np.einsum("nab,nb->na", binv,
                          self.matvec(v).reshape(-1, 3)).reshape(-1)
            lam = float(np.linalg.norm(w))
            v = w / max(lam, 1e-300)
        return 1.1 * lam


def estimate_smoother_lambda_max(op, binv, iters: int = 30,
                                 seed: int = 0) -> float:
    """lambda_max(B^-1 A) by power iteration (EAGER on purpose: the eager
    matvec fusions are compiled once and reused, while a jitted
    power-iteration program would be a fresh multi-minute remote compile
    on the axon backend).  The damped block-Jacobi smoother needs
    omega * lambda_max < 2 to contract (docs/PERF_NOTES.md); unstructured
    meshes push lambda_max to ~3-4, so it is measured, not assumed."""
    n = op.n_dofs
    dtype = op.free_mask.dtype
    v = jax.random.normal(jax.random.PRNGKey(seed), (n,), dtype)
    v = v * op.free_mask
    v = v / jnp.linalg.norm(v)
    lam = 0.0
    for _ in range(iters):
        w = _einsum("nab,nb->na", binv,
                    op.matvec(v).reshape(-1, 3)).reshape(-1)
        lam = float(jnp.linalg.norm(w))
        v = w / max(lam, 1e-300)
    return lam


def _host_binv_and_lambda_max(ell, mask: np.ndarray, need_lam: bool,
                              iters: int = 30, seed: int = 0):
    """Host fp64 twin of (block_jacobi_preconditioner, power iteration)
    for an ELL Galerkin level — removes two device programs per level
    from the build's remote-compile bill."""
    import scipy.sparse as sp

    A = ell.to_scipy_bsr()
    N = ell.n_nodes
    m = np.asarray(mask, np.float64).reshape(-1)
    m3 = m.reshape(N, 3)
    # diagonal 3x3 blocks from CSR
    Ab = A.tobsr(blocksize=(3, 3))
    Ab.sort_indices()
    diag = np.zeros((N, 3, 3))
    counts = Ab.indptr[1:] - Ab.indptr[:-1]
    rows = np.repeat(np.arange(N), counts)
    sel = Ab.indices == rows
    diag[rows[sel]] = Ab.data[sel]
    eye = np.eye(3)
    bm = diag * (m3[:, :, None] * m3[:, None, :]) \
        + (1.0 - m3)[:, :, None] * eye
    det = np.linalg.det(bm)
    bm[det == 0] = eye
    binv = np.linalg.inv(bm)
    lam = None
    if need_lam:
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(3 * N) * m
        v /= np.linalg.norm(v)
        for _ in range(iters):
            Av = m * (A @ (m * v)) + (1.0 - m) * v
            w = np.einsum("nab,nb->na", binv,
                          Av.reshape(N, 3)).reshape(-1)
            lam = float(np.linalg.norm(w))
            v = w / max(lam, 1e-300)
    return binv, lam


def build_unstructured_multigrid(
        mesh: Mesh, lam, mu,
        free_mask: Optional[np.ndarray] = None,
        dtype=jnp.float32,
        omega: Optional[float] = None, nu: int = 2,
        n_levels: Optional[int] = None,
        max_coarse_dofs: int = 4000,
        coarsen: float = 2.0,
        use_pallas: Optional[bool] = None,
        order: int = 2,
        smoother: str = "chebyshev",
        verbose: bool = False,
) -> Tuple[StiffnessOperator, MultigridPreconditioner]:
    """Matrix-free V-cycle preconditioner for an ARBITRARY imported mesh.

    Fine level = the general :class:`StiffnessOperator` on the mesh;
    coarse levels = stencil operators on an embedded voxel lattice with
    material fractions.  ``lam``/``mu`` may be per-element arrays (SIMP).
    The default smoother is Chebyshev with measured per-level
    lambda_max(B^-1 A); ``smoother="jacobi"`` with ``omega=None`` instead
    sets omega = min(0.7, 1.4 / lambda_max) at the fine level.

    Returns (fine operator, MultigridPreconditioner) — a drop-in ``M``
    for :func:`..fem.solvers.cg`.

    Match: reference FiniteElementAnalysis.jl:547 (any-mesh solve) with
    mesh-independent iteration counts instead of Jacobi-PCG scaling.
    """
    import time as _time

    from ..utils.terminal import log

    t_start = _time.perf_counter()

    def tick(label, t0):
        if verbose:
            log(f"unstructured MG [{label}]: "
                f"{_time.perf_counter() - t0:.1f}s")
        return _time.perf_counter()

    C = mesh.n_cells
    lam_e = np.broadcast_to(np.asarray(lam, np.float64), (C,))
    mu_e = np.broadcast_to(np.asarray(mu, np.float64), (C,))
    if free_mask is None:
        free_mask = np.ones(mesh.n_dofs)
    free_np = np.asarray(free_mask, np.float64).reshape(-1)

    # --- fine level ---------------------------------------------------------
    t0 = _time.perf_counter()
    dmesh = mesh.device(dtype=dtype)
    op = StiffnessOperator.build(dmesh, lam_e, mu_e,
                                 free_mask=jnp.asarray(free_np, dtype),
                                 mode="otf", order=order,
                                 use_pallas=use_pallas)
    # host fp64 build of the smoother blocks + lambda_max: the device
    # versions cost minutes of axon remote compiles (see _HostFineOperator)
    host_fine = _HostFineOperator(mesh, lam_e, mu_e, free_np, order)
    binv_np = _host_block_jacobi(host_fine.node_blocks(), free_np)
    binv_fine = jnp.asarray(binv_np, dtype)
    t0 = tick("fine op + block-Jacobi (host)", t0)

    # --- voxel lattice dims -------------------------------------------------
    lo, hi = mesh.bounding_box()
    extent = np.maximum(hi - lo, 1e-300)
    # voxel edge ~ coarsen x mean node spacing (bbox-based estimate)
    h = coarsen * (float(np.prod(extent))
                   / max(mesh.n_nodes, 1)) ** (1.0 / 3.0)
    dims0 = np.maximum(np.round(extent / h).astype(int), 1)

    # structured levels below the voxel level: round dims up to multiples
    # of 2^(L-1); pick the fewest voxel levels whose coarsest fits the
    # dense inverse
    def rounded(L):
        f = 2 ** (L - 1)
        dr = ((dims0 + f - 1) // f) * f
        nd = 3 * int(np.prod(dr // f + 1))
        return dr, nd

    if n_levels is not None:
        L = max(int(n_levels) - 1, 1)
        dims_r, ndc = rounded(L)
    else:
        L = 1
        while True:
            dims_r, ndc = rounded(L)
            if ndc <= max_coarse_dofs or L >= 12:
                break
            L += 1
    if ndc > max_coarse_dofs:
        raise ValueError(
            f"coarsest voxel level has {ndc} dofs > max_coarse_dofs="
            f"{max_coarse_dofs}; raise max_coarse_dofs or n_levels")
    vx, vy, vz = (int(x) for x in dims_r)
    if verbose:
        log(f"unstructured MG: voxel lattice {vx}x{vy}x{vz}, "
            f"{L} voxel level(s), coarsest {ndc} dofs")

    # --- fine → voxel transfer + Galerkin level 1 ----------------------------
    parents, weights, inc = build_voxel_transfer(mesh.coords, lo, hi,
                                                 (vx, vy, vz))
    transfer0 = Transfer(jnp.asarray(parents),
                         jnp.asarray(weights, dtype), jnp.asarray(inc),
                         chunked=True)
    n_vox_nodes = (vx + 1) * (vy + 1) * (vz + 1)
    fixed_c = propagate_fixed(parents, weights,
                              free_np.reshape(-1, 3) == 0, n_vox_nodes)
    mask_c = np.where(fixed_c, 0.0, 1.0).reshape(-1)

    lam_max_fine = (host_fine.power_lambda_max(binv_np)
                    if smoother == "chebyshev" or omega is None else None)
    del host_fine, binv_np
    levels = [MGLevel(op, binv_fine, transfer0, lam_max=lam_max_fine)]
    t0 = tick("transfer + fine lambda_max (host)", t0)

    # coupling reach on the lattice: an element spanning k voxels along an
    # axis links corners k+1 apart; reach 2 covers elements up to one
    # voxel wide (the coarsen>=2 default guarantees this for graded
    # meshes, but irregular imports can contain outlier elements)
    ext = mesh.coords[mesh.conn].max(axis=1) - mesh.coords[mesh.conn].min(
        axis=1)                                   # [C, 3]
    h_vox = (np.asarray(hi) - np.asarray(lo)) / np.array([vx, vy, vz])
    reach = tuple(int(r) for r in
                  np.clip(np.ceil(ext.max(axis=0) / h_vox) + 1, 2, 4))
    if verbose and reach != (2, 2, 2):
        log(f"unstructured MG: large elements -> probe reach {reach}")

    ell, mask_c = galerkin_voxel_operator(op, transfer0, mask_c,
                                          (vx, vy, vz), reach=reach,
                                          dtype=dtype)
    t0 = tick("Galerkin probing (level 1)", t0)

    # --- Galerkin (RAP) coarser levels ---------------------------------------
    cur_dims = (vx, vy, vz)
    for li in range(L):
        # host build: avoids two fresh device programs per level (remote
        # compiles dominate the on-chip build time otherwise)
        binv_np, lam_max_l = _host_binv_and_lambda_max(
            ell, mask_c, need_lam=(smoother == "chebyshev"))
        binv = jnp.asarray(binv_np, dtype)
        transfer = None
        if li + 1 < L:
            cnx, cny, cnz = cur_dims
            p2, w2, i2 = build_transfer_tables(cnx, cny, cnz)
            transfer = Transfer(jnp.asarray(p2), jnp.asarray(w2, dtype),
                                jnp.asarray(i2), chunked=True)
            n_coarse = (cnx // 2 + 1) * (cny // 2 + 1) * (cnz // 2 + 1)
            fixed_next = propagate_fixed(p2, w2,
                                         mask_c.reshape(-1, 3) == 0,
                                         n_coarse)
            mask_next = np.where(fixed_next, 0.0, 1.0).reshape(-1)
            levels.append(MGLevel(ell, binv, transfer, lam_max=lam_max_l))
            ell, mask_c = _rap_host(ell, p2, w2, n_coarse, mask_next,
                                    dtype)
            cur_dims = (cnx // 2, cny // 2, cnz // 2)
        else:
            levels.append(MGLevel(ell, binv, None, lam_max=lam_max_l))
    t0 = tick("coarse levels (host RAP + binv + lambda_max)", t0)

    # --- coarsest level: eigendecomposition pseudo-inverse -------------------
    # On porous/optimized geometry a voxel can contain fewer fine nodes
    # than its corners carry coarse basis functions, making P^T A P
    # locally RANK-DEFICIENT (nonzero diagonal, singular matrix) — a plain
    # inverse explodes the V-cycle.  The eigenvalue-cutoff pseudo-inverse
    # keeps the coarse correction an A-orthogonal projection onto the
    # well-represented subspace: still exactly non-expansive.
    K_c = ell.to_dense_constrained()
    K_c = 0.5 * (K_c + K_c.T)
    evals, evecs = np.linalg.eigh(K_c)
    # gap-based eigencut: discard rank-deficient junk, keep low physics
    # (see coarse_pinv_weights for the measured failure modes).
    inv_e = coarse_pinv_weights(evals, dtype)
    inv_np = (evecs * inv_e) @ evecs.T
    m_c = np.asarray(mask_c, np.float64).reshape(-1)
    coarse_inv = jnp.asarray(m_c[:, None] * inv_np * m_c[None, :], dtype)

    t0 = tick("coarsest pseudo-inverse", t0)

    # --- smoother damping ----------------------------------------------------
    if omega is None:
        omega = float(min(0.7, 1.4 / max(lam_max_fine, 1e-6)))
    if verbose:
        log(f"unstructured MG: lambda_max(B^-1 A) ~ "
            f"{lam_max_fine if lam_max_fine else 0:.2f}, omega = "
            f"{omega:.3f}, smoother = {smoother}, total build "
            f"{_time.perf_counter() - t_start:.1f}s")

    mg = MultigridPreconditioner(tuple(levels[:-1]), coarse_inv,
                                 omega=omega, nu=nu, smoother=smoother)
    return op, mg
