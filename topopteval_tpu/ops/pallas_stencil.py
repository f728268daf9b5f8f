"""Fused Pallas stencil matvec for structured box meshes (round 4).

The structured operator's XLA ``slices`` formulation is correct on the
axon backend but materializes ~50 intermediate [nz, ny, nx] grids per
application (2.3 ms at 1.23M tets — the dominant kernel of the headline
solve).  Two "MXU-friendly" XLA rewrites (cell-batched matmul, two-conv)
were rejected: on this backend any materialized array with a tiny minor
dim is lane-padded to 128 (~40x HBM traffic) AND those padded op classes
miscompile inside while_loop bodies (fem/structured.py, docs/PERF_NOTES).

This kernel avoids both problems by construction:

- the flat DOF vector (node-major, dof = ((z*NY + y)*NX + x)*3 + a) is
  VIEWED as [NZ, NY, NX*3] — a free reshape, minor dim ~3*NX lanes, no
  layout conversion on either side;
- one grid step produces one z-plane of the output; the 8-corner x
  8-corner hex stencil becomes ~300 lane/sublane-rolled FMA terms whose
  per-lane coefficients (period-3 in the lane index) are precomputed
  rows of a small coefficient table;
- boundary exactness comes from the expanded SIMP/escale plane being
  ZERO outside the real cell range: every term is multiplied by the
  escale of the cell it belongs to, so wrapped roll lanes and padding
  rows contribute exactly nothing.

Reference semantics: the operator equals the assembled K of
FiniteElementAnalysis.jl's uniform grid of 6-tet hexes (doassemble!,
/root/reference/src/FiniteElementAnalysis/FiniteElementAnalysis.jl),
proven against the general gather operator in tests/test_structured.py
and against this file in interpret mode.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: kernel selector: the z-blocked window kernel is chip-validated
#: (machine-eps parity at 3 sizes) but measured SLOWER than the
#: per-plane kernel at the 1.23M-tet headline (3.71 ms vs 2.66 ms —
#: the flattened-window halo recompute + scoped-VMEM temp traffic
#: outweigh the spill fix), so per-plane stays the default.
_KERNEL_MODE = os.environ.get("TOPOPT_STENCIL_KERNEL", "plane")

#: hex corner offsets in (iz, iy, ix), VTK order (fem/structured.py)
_CORNER_OFFSETS = [(0, 0, 0), (0, 0, 1), (0, 1, 1), (0, 1, 0),
                   (1, 0, 0), (1, 0, 1), (1, 1, 1), (1, 1, 0)]


def _build_terms(ke: np.ndarray, nxl: int):
    """Trace-time term list + coefficient table.

    Each term is (slab, j, plane, dy, ls, row): for output lane
    L = 3x + a of plane z, accumulate
        esc_j[L] * C[row, L] * u_plane[y + dy, L + ls]
    where C[row, 3x + a] = sum of Ke[j*3+a, k*3+(a+d)] over the (k, d)
    merged into the row (terms of one j sharing (plane, dy, ls) merge —
    their coefficient patterns add).
    """
    rows = []                                # np [*, nxl]
    terms = []
    for slab in (0, 1):                      # cells at z-1 / z
        for j, (ozj, oyj, oxj) in enumerate(_CORNER_OFFSETS):
            if ozj != 1 - slab:
                continue
            merged = {}
            for k, (ozk, oyk, oxk) in enumerate(_CORNER_OFFSETS):
                plane = slab + ozk           # index into (lo, mid, hi)
                dy = oyk - oyj
                for d in (-2, -1, 0, 1, 2):
                    pat = np.zeros(3)
                    for a in range(3):
                        b = a + d
                        if 0 <= b <= 2:
                            pat[a] = ke[j * 3 + a, k * 3 + b]
                    if not pat.any():
                        continue
                    ls = 3 * (oxk - oxj) + d
                    # merge only same-d terms: each term is applied to
                    # the DIFFERENCE (U_shifted - U_center,d), which
                    # requires d-homogeneous rows (see kernel note on
                    # fp32 cancellation)
                    key = (plane, dy, ls, d)
                    merged[key] = merged.get(key, np.zeros(3)) + pat
            for (plane, dy, ls, d), pat in sorted(merged.items()):
                row = np.tile(pat, nxl // 3 + 1)[:nxl]
                terms.append((slab, j, plane, dy, ls, d, len(rows)))
                rows.append(row)
    return terms, np.stack(rows)


def _window_kernel(c_ref, esc_lo, esc_mid, esc_hi, u_lo, u_mid, u_hi,
                   out_ref, *, terms, pr, nb, nxl):
    """z-blocked flattened-window variant (round-5 work on the round-4
    parked plan, docs/PERF_NOTES.md): one grid step computes NB output
    z-planes at once on a flattened [(NB+2)*PR, nxl] window, where a
    z/y shift is a single flattened-row roll by (dz*PR + dy).

    Rationale: the per-plane kernel's [NYp, nxl] ops are ~45 vregs each,
    so Mosaic register-allocates the dedup caches and spills (~155k
    cycles/slab vs ~45k op estimate); here every operand is NB+2 planes,
    ops stream through VMEM, per-op fixed overhead amortizes ~NB-fold,
    and the live set is bounded (~12 windows) by ordering the terms
    (slab, j)-outer.  A whole-volume (grid=(1,)) first cut OOMed VMEM at
    1.23M tets (149M > 128M) — the window variant caps VMEM at any size.

    The three u/esc refs are adjacent NB-plane blocks of the same padded
    buffer; the window is their concat sliced to planes
    [NB-1, 2*NB+1).  Row-roll wraps touch only the window's first/last
    plane, which are halo (never emitted); y-wraps land in a plane's
    zero padding rows; every term also carries the escale of its cell,
    zero outside the real range — same argument as the per-plane kernel,
    restated for the flattened row axis.
    """
    lo_r, hi_r = (nb - 1) * pr, (2 * nb + 1) * pr
    u = jnp.concatenate([u_lo[...], u_mid[...], u_hi[...]])[lo_r:hi_r]
    esc = jnp.concatenate([esc_lo[...], esc_mid[...],
                           esc_hi[...]])[lo_r:hi_r]
    rows_w = (nb + 2) * pr

    def roll2(arr, sy, sx):
        if sy:
            arr = pltpu.roll(arr, sy % rows_w, axis=0)
        if sx:
            arr = pltpu.roll(arr, sx % nxl, axis=1)
        return arr

    # center values per lane offset d (rigid-body difference trick —
    # see the per-plane kernel's fp32 cancellation note)
    centers = {}
    for (_, _, _, _, _, d, _) in terms:
        if d not in centers:
            centers[d] = roll2(u, 0, -d)

    by_j = {}
    for (slab, j, plane, dy, ls, d, row) in terms:
        by_j.setdefault((slab, j), []).append((plane, dy, ls, d, row))
    acc = jnp.zeros_like(u)
    for (slab, j), tl in sorted(by_j.items()):
        _, oyj, oxj = _CORNER_OFFSETS[j]
        esc_j = roll2(esc, (1 - slab) * pr + oyj, 3 * oxj)
        tj = None
        for (plane, dy, ls, d, row) in tl:
            s = roll2(u, -((plane - 1) * pr + dy), -ls)
            term = c_ref[row, :][None, :] * (s - centers[d])
            tj = term if tj is None else tj + term
        acc = acc + esc_j * tj
    out_ref[...] = acc[pr:(nb + 1) * pr]


def _stencil_kernel(c_ref, esc_lo, esc_hi, u_lo, u_mid, u_hi, out_ref,
                    *, terms, ny_nodes, nxl):
    planes = (u_lo, u_mid, u_hi)
    escs = (esc_lo, esc_hi)

    def roll2(arr, sy, sx):
        # circular; pltpu.roll wants non-negative shifts
        if sy:
            arr = pltpu.roll(arr, sy % ny_nodes, axis=0)
        if sx:
            arr = pltpu.roll(arr, sx % nxl, axis=1)
        return arr

    rolled = {}

    def shifted(plane, dy, ls):
        key = (plane, dy, ls)
        if key not in rolled:
            rolled[key] = roll2(planes[plane][0], -dy, -ls)
        return rolled[key]

    # fp32 cancellation control: elasticity Ke rows sum to zero over the
    # corners (rigid-body translation), so for every (j, d) the row sum
    # of the coefficient patterns over k vanishes — each term may
    # subtract the out-node's own component-b value (U_center,d) EXACTLY.
    # The kernel then accumulates DIFFERENCES of neighboring node values
    # (physically: gradients), which are small for smooth u; summing raw
    # Ke*u instead loses ~1.5% of the energy of a converged solution to
    # fp32 rounding (verified on chip — the solve's u was exact while
    # 0.5 u.K u was 251.6 vs oracle 255.5).
    diffs = {}

    def diffed(plane, dy, ls, d):
        key = (plane, dy, ls, d)
        if key not in diffs:
            diffs[key] = shifted(plane, dy, ls) - shifted(1, 0, d)
        return diffs[key]

    esc_j = {}

    def esc_for(slab, oyj, oxj):
        key = (slab, oyj, oxj)
        if key not in esc_j:
            esc_j[key] = roll2(escs[slab][0], oyj, 3 * oxj)
        return esc_j[key]

    acc = jnp.zeros((ny_nodes, nxl), out_ref.dtype)
    by_j = {}
    for (slab, j, plane, dy, ls, d, row) in terms:
        by_j.setdefault((slab, j), []).append((plane, dy, ls, d, row))
    for (slab, j), tl in by_j.items():
        _, oyj, oxj = _CORNER_OFFSETS[j]
        tj = None
        for (plane, dy, ls, d, row) in tl:
            term = c_ref[row, :][None, :] * diffed(plane, dy, ls, d)
            tj = term if tj is None else tj + term
        acc = acc + esc_for(slab, oyj, oxj) * tj
    out_ref[0] = acc


@functools.partial(jax.jit,
                   static_argnames=("dims", "ke_key", "interpret",
                                    "kernel_mode"))
def _stencil_matvec(u, esc, dims, ke_key, interpret=False,
                    kernel_mode="plane"):
    """y = K_raw u on the (nx, ny, nz)-cell box.

    u: flat [ndof]; esc: [nz, ny, nx] per-hex scale (ones if uniform);
    ke_key: the 24x24 hex stiffness as raw fp64 bytes — static, so the
    coefficient table is a trace-time constant and different materials
    trace separately.
    """
    nx, ny, nz = dims
    NZ, NY, NX = nz + 1, ny + 1, nx + 1
    nxl = NX * 3
    # pad the plane dims to exact physical tiles (sublane 8, lane 128)
    # with EXPLICIT zeros: compiled pltpu.roll wraps through the
    # physical vreg space, so logical shape must equal physical shape
    # for the escale zero-guard to also cover wrapped lanes (interpret
    # mode wraps logically and cannot catch this — it did not)
    NYp = -(-NY // 8) * 8
    nxlp = -(-nxl // 128) * 128
    ke = np.frombuffer(ke_key, np.float64).reshape(24, 24)
    terms, rows = _build_terms(ke, nxlp)
    dt = u.dtype

    # layout firewall: in larger programs (the MG V-cycle) u arrives
    # through reshapes of [N, 3] minor-dim-3 intermediates — the axon
    # relayout class that miscompiles.  The barrier pins a canonical
    # flat buffer at the kernel boundary (verified on chip: without it
    # the e2e MG-PCG energy is 1.5% wrong while every standalone parity
    # check passes).
    u = jax.lax.optimization_barrier(u)
    u3 = u.reshape(NZ, NY, nxl)
    u_pad = jnp.pad(u3, ((1, 1), (0, NYp - NY), (0, nxlp - nxl)))
    esc_e = jnp.repeat(esc.astype(dt), 3, axis=2)      # [nz, ny, 3nx]

    # z-blocked flattened-window fast path (see _window_kernel): NB
    # output planes per grid step, window budget caps VMEM at any size.
    # Mosaic's scoped-VMEM stack allocator keeps ~65 window-sized
    # temporaries live for this kernel (measured on v5e: a 1.7 MB
    # window asked for 109.8 MB of scoped stack), so the window size is
    # budgeted as scoped_limit / LIVE_FACTOR and the kernel is compiled
    # with an explicit raised vmem_limit_bytes — the 16 MB default
    # scoped limit OOMs at any useful NB.
    scoped_limit = int(os.environ.get("TOPOPT_STENCIL_VMEM",
                                      str(100 * 1024 * 1024)))
    live_factor = 72
    wmax = int(os.environ.get("TOPOPT_STENCIL_WINDOW_MAX",
                              str(scoped_limit // live_factor)))
    plane_bytes = NYp * nxlp * u.dtype.itemsize
    NB = wmax // plane_bytes - 2
    if NB >= 1 and kernel_mode == "window":
        Pz = NZ + 2                      # padded volume planes
        NB = min(NB, Pz)
        NZB = -(-Pz // NB)
        nplanes = (NZB + 2) * NB         # + front/back zero blocks
        # buffer plane = padded-volume plane + NB (the window slice
        # [NB-1, 2NB+1) of blocks z..z+2 then covers padded planes
        # [z*NB - 1, (z+1)*NB + 1), and out block z writes padded
        # planes [z*NB, (z+1)*NB) at out-buffer plane == padded plane);
        # esc_e plane e sits at padded plane e+1, hence its NB+1
        u_buf = jnp.pad(u_pad, ((NB, nplanes - NB - Pz),
                                (0, 0), (0, 0)))
        esc_buf = jnp.pad(esc_e, ((NB + 1, nplanes - NB - 1 - nz),
                                  (0, NYp - ny), (0, nxlp - 3 * nx)))
        u_buf = u_buf.reshape(nplanes * NYp, nxlp)
        esc_buf = esc_buf.reshape(nplanes * NYp, nxlp)
        kern = functools.partial(_window_kernel, terms=terms, pr=NYp,
                                 nb=NB, nxl=nxlp)
        blk = (NB * NYp, nxlp)
        specs = [pl.BlockSpec((rows.shape[0], nxlp), lambda z: (0, 0),
                              memory_space=pltpu.VMEM)]
        for off in (0, 1, 2):
            specs.append(pl.BlockSpec(
                blk, functools.partial(lambda z, o: (z + o, 0), o=off),
                memory_space=pltpu.VMEM))
        out = pl.pallas_call(
            kern,
            grid=(NZB,),
            in_specs=specs[:1] + specs[1:4] + specs[1:4],
            out_specs=pl.BlockSpec(blk, lambda z: (z, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NZB * NB * NYp, nxlp), dt),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=scoped_limit),
            interpret=interpret,
        )(jnp.asarray(rows, dt), esc_buf, esc_buf, esc_buf,
          u_buf, u_buf, u_buf)
        out = out.reshape(NZB * NB, NYp, nxlp)
        return out[1:NZ + 1, :NY, :nxl].reshape(-1)

    esc_x = jnp.pad(esc_e, ((1, 1), (0, NYp - ny), (0, nxlp - 3 * nx)))

    kern = functools.partial(_stencil_kernel, terms=terms,
                             ny_nodes=NYp, nxl=nxlp)
    plane = (1, NYp, nxlp)
    out = pl.pallas_call(
        kern,
        grid=(NZ,),
        in_specs=[
            pl.BlockSpec((rows.shape[0], nxlp), lambda z: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(plane, lambda z: (z, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(plane, lambda z: (z + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(plane, lambda z: (z, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(plane, lambda z: (z + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(plane, lambda z: (z + 2, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(plane, lambda z: (z, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NZ, NYp, nxlp), dt),
        interpret=interpret,
    )(jnp.asarray(rows, dt), esc_x, esc_x, u_pad, u_pad, u_pad)
    return out[:, :NY, :nxl].reshape(-1)


def stencil_matvec(u, esc, ke, dims, interpret=False):
    """Public entry: y = K_raw u (see module docstring).

    esc may be None (uniform material).  ke is the assembled 24x24 hex
    stiffness in VTK corner-major order (StructuredStiffnessOperator.
    _hex_ke); it is a trace-time constant.
    """
    nx, ny, nz = dims
    if esc is None:
        esc = jnp.ones((nz, ny, nx), u.dtype)
    ke_key = np.ascontiguousarray(np.asarray(ke, np.float64)).tobytes()
    mode = os.environ.get("TOPOPT_STENCIL_KERNEL", _KERNEL_MODE)
    return _stencil_matvec(u, esc, tuple(int(d) for d in dims),
                           ke_key, interpret=interpret,
                           kernel_mode=mode)
