"""Pallas TPU kernels for block-ELL (BSR-like) sparse matvecs.

The round-2 profile showed the unstructured fine matvec spends 59 of its
63 ms in XLA's row gather + incidence scatter: every [*, 3]-shaped HBM
row pads its minor dims to (8, 128) tiles, so the logical 80 MB of data
movement becomes ~3 GB (docs/PERF_NOTES.md).  These kernels remove both
the scatter and the padded layouts:

- **Component-major layout**: vectors live as ``[3, Np]`` (components on
  sublanes, nodes on the 128-wide lane axis) — zero padding waste.
- **Node-tile grid**: 128 nodes per grid step; the sparse row data
  (``cols``/``vals``) streams through VMEM in lane-major blocks.
- **In-kernel lane gather**: Mosaic lowers same-shape
  ``jnp.take_along_axis(x, idx, axis=1)`` to ``tpu.dynamic_gather``
  (jax/_src/pallas/mosaic/lowering.py); with nodes RCM-ordered
  (bandwidth-minimized), each tile's column window spans only a few
  128-lane chunks.
- **Grouped gathers + group skip**: slots are processed ``GROUP=8`` at a
  time (one [3*G, 128] gather instead of eight [3, 128] ones), and each
  (tile, group) carries its live chunk range in SMEM so dead chunks cost
  one scalar compare, not G gathers.
- **Scatter-free**: the operator is applied row-wise (gather-only); the
  transpose operators (restriction) are stored as their own row-wise
  tables.

Replaces (for the fast unstructured solve path) the reference's
assembled CSC SpMV inside CHOLMOD/Krylov.jl (reference:
src/FiniteElementAnalysis/FiniteElementAnalysis.jl:547,
src/FiniteElementAnalysis/RobustSolver.jl:337-375).

Every kernel has an algebraically-identical pure-jnp twin
(``*_reference``) used on CPU and in parity tests.

Mosaic constraints baked in (learned on-chip, round 3):
- no i1 vreg bitcasts → masks are arithmetic int→float, never bool
  concat/select shapes;
- block shapes must tile (8, 128) or match the array dims → cols/vals
  ship as 3D [Nt, rows, 128] with per-tile (1, rows, 128) blocks, SMEM
  scalars as [Nt, 1, k].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
GROUP = 8          # slots per in-kernel gather; pack pads S to a multiple


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# 3x3-block ELL matvec:
#   out[a, n] = sum_s sum_b vals[n, s, 3a+b] * u[b, cols[n, s]]
#
# Device layouts (Nt = node tiles, S = ELL width, ng = S/GROUP):
#   cols2   [Nt*S, 128] int32     cols2[t*S + s, l] = column of node t*128+l
#   vals2   [Nt*9*S, 128]         PLANE-major: row (t*9 + 3a+b)*S + s
#   wblk    [Nt] int32            per-tile window base chunk
#   gbounds [Nt, 1, 2*ng] int32   per-(tile, group) live chunk range
#                                 [lo, hi] relative to wblk
#   u       [3, Np]               component-major input vector
# Padding slots repeat the row's LAST real column with zero vals (inert,
# and they keep tail groups' windows tight).
# ---------------------------------------------------------------------------


def _grouped_gather(S, cols_ref, gb_ref, u_ref, base, kc, gacc_ref):  # noqa: gb_ref kept for ABI stability
    """Shared inner stage: the whole vector sits in VMEM; for each live
    (group, chunk) pair (scalar-bounds skip), dynamic-slice the 128-lane
    chunk and gather G columns for all 3 components into the
    component-major scratch gacc[a*S + s].

    One grid step per node tile — no per-chunk grid dimension, so there
    are no tiny per-step DMAs (the (Nt, kc)-grid variant measured ~0.8 us
    of fixed cost per step, dominating the kernel)."""
    ng = S // GROUP
    for g in range(ng):
        col8 = cols_ref[0, g * GROUP:(g + 1) * GROUP, :]

        # NOTE: no dead-chunk skip — measured SLOWER than doing the full
        # work (scalar branch cost > saved vector ops;
        # tools/tpu_bell_ablate.py: noskip 0.296 ms vs skip 0.477 ms at
        # 154k tets).  The chunk loop is a fori_loop, not a python
        # unroll: transfer kernels can have kc in the hundreds, and the
        # unrolled form blew Mosaic's scoped-VMEM stack (47 MB at the
        # 1.23M-tet restrict).
        def chunk_body(c, _, g=g, col8=col8):
            off = (base + c) * LANES
            chunk = u_ref[:, pl.ds(pl.multiple_of(off, LANES), LANES)]
            rows = [jnp.broadcast_to(chunk[a:a + 1, :],
                                     (GROUP, LANES)) for a in range(3)]
            ug = jnp.concatenate(rows, axis=0)             # [3G, 128]
            idx8 = col8 - off
            inb8 = (jnp.clip(idx8 + 1, 0, 1)
                    * jnp.clip(LANES - idx8, 0, 1)).astype(ug.dtype)
            idxc8 = jnp.clip(idx8, 0, LANES - 1)
            idx24 = jnp.concatenate([idxc8, idxc8, idxc8], axis=0)
            g24 = jnp.take_along_axis(ug, idx24, axis=1,
                                      mode="promise_in_bounds")
            m24 = jnp.concatenate([inb8, inb8, inb8], axis=0)
            t24 = g24 * m24
            for a in range(3):
                gacc_ref[a * S + g * GROUP:a * S + (g + 1) * GROUP, :] \
                    += t24[a * GROUP:(a + 1) * GROUP, :]
            return 0

        jax.lax.fori_loop(0, kc, chunk_body, 0)


def _bell_kernel(S: int, kc: int):
    def kernel(wblk_ref, gb_ref, cols_ref, vals_ref, u_ref, out_ref,
               gacc_ref):
        i = pl.program_id(0)
        gacc_ref[:] = jnp.zeros_like(gacc_ref)
        _grouped_gather(S, cols_ref, gb_ref, u_ref, wblk_ref[i], kc,
                        gacc_ref)
        # out[a] = sum_s sum_b vals[3a+b, s] * gacc[b*S + s]: three
        # [S,128] elementwise products + one sublane reduction per a
        outs = []
        for a in range(3):
            acc = None
            for b in range(3):
                v = vals_ref[0, (3 * a + b) * S:(3 * a + b + 1) * S, :]
                gb_ = gacc_ref[b * S:(b + 1) * S, :]
                term = v * gb_
                acc = term if acc is None else acc + term
            outs.append(jnp.sum(acc, axis=0, keepdims=True))
        out_ref[:] = jnp.concatenate(outs, axis=0)

    return kernel


@functools.partial(jax.jit, static_argnames=("S", "kc", "interpret"))
def bell_matvec_pallas(cols2: jnp.ndarray, vals2: jnp.ndarray,
                       wblk: jnp.ndarray, gbounds: jnp.ndarray,
                       u_cm: jnp.ndarray, S: int, kc: int,
                       interpret: bool = False) -> jnp.ndarray:
    """Raw (unconstrained, unmasked) block-ELL matvec in [3, Np] layout."""
    Nt = wblk.shape[0]
    Np = u_cm.shape[1]
    ng2 = gbounds.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Nt,),
        in_specs=[
            pl.BlockSpec((1, 1, ng2), lambda i, w: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S, LANES), lambda i, w: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9 * S, LANES), lambda i, w: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Np), lambda i, w: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, LANES), lambda i, w: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((3 * S, LANES), u_cm.dtype)],
    )
    return pl.pallas_call(
        _bell_kernel(S, kc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, Np), u_cm.dtype),
        interpret=interpret,
    )(wblk, gbounds, cols2.reshape(Nt, S, LANES),
      vals2.reshape(Nt, 9 * S, LANES), u_cm)


def bell_matvec_reference(cols2: jnp.ndarray, vals2: jnp.ndarray,
                          u_cm: jnp.ndarray, S: int) -> jnp.ndarray:
    """Pure-jnp twin of :func:`bell_matvec_pallas` (CPU / parity tests).

    ``vals2`` is the plane-major layout [Nt*9*S, 128]."""
    Np = u_cm.shape[1]
    Nt = Np // LANES
    cols = cols2.reshape(Nt, S, LANES).transpose(1, 0, 2).reshape(S, Np)
    vals = vals2.reshape(Nt, 9, S, LANES).transpose(1, 2, 0, 3) \
        .reshape(9, S, Np)
    out = jnp.zeros((3, Np), u_cm.dtype)
    for s in range(S):
        g = u_cm[:, cols[s]]                                  # [3, Np]
        for a in range(3):
            out = out.at[a].add(vals[3 * a + 0, s] * g[0]
                                + vals[3 * a + 1, s] * g[1]
                                + vals[3 * a + 2, s] * g[2])
    return out


# ---------------------------------------------------------------------------
# Scalar-weight ELL matvec (transfer operators P / P^T):
#   out[a, n] = sum_s w[n, s] * u[a, cols[n, s]]
# Same layouts with vals2 replaced by w2 [Nt*S, 128] (slot-major).
# ---------------------------------------------------------------------------


def _sell_kernel(S: int, kc: int):
    def kernel(wblk_ref, gb_ref, cols_ref, w_ref, u_ref, out_ref,
               gacc_ref):
        i = pl.program_id(0)
        gacc_ref[:] = jnp.zeros_like(gacc_ref)
        _grouped_gather(S, cols_ref, gb_ref, u_ref, wblk_ref[i], kc,
                        gacc_ref)
        w = w_ref[0, :, :]                                   # [S, 128]
        outs = [jnp.sum(w * gacc_ref[a * S:(a + 1) * S, :], axis=0,
                        keepdims=True) for a in range(3)]
        out_ref[:] = jnp.concatenate(outs, axis=0)

    return kernel


@functools.partial(jax.jit, static_argnames=("S", "kc", "interpret"))
def sell_matvec_pallas(cols2: jnp.ndarray, w2: jnp.ndarray,
                       wblk: jnp.ndarray, gbounds: jnp.ndarray,
                       u_cm: jnp.ndarray, S: int, kc: int,
                       interpret: bool = False) -> jnp.ndarray:
    """Scalar-weight ELL apply: component-wise transfer (P or P^T rows).

    ``u_cm`` is [3, Np_src]; output is [3, Nt*128] over the target rows.
    """
    Nt = wblk.shape[0]
    Np = u_cm.shape[1]
    ng2 = gbounds.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Nt,),
        in_specs=[
            pl.BlockSpec((1, 1, ng2), lambda i, w: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S, LANES), lambda i, w: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, LANES), lambda i, w: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Np), lambda i, w: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, LANES), lambda i, w: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((3 * S, LANES), u_cm.dtype)],
    )
    return pl.pallas_call(
        _sell_kernel(S, kc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, Nt * LANES), u_cm.dtype),
        interpret=interpret,
    )(wblk, gbounds, cols2.reshape(Nt, S, LANES),
      w2.reshape(Nt, S, LANES), u_cm)


def sell_matvec_reference(cols2: jnp.ndarray, w2: jnp.ndarray,
                          u_cm: jnp.ndarray, S: int,
                          n_rows_p: int) -> jnp.ndarray:
    """Pure-jnp twin of :func:`sell_matvec_pallas`."""
    Nt = n_rows_p // LANES
    cols = cols2.reshape(Nt, S, LANES).transpose(1, 0, 2) \
        .reshape(S, n_rows_p)
    w = w2.reshape(Nt, S, LANES).transpose(1, 0, 2).reshape(S, n_rows_p)
    out = jnp.zeros((3, n_rows_p), u_cm.dtype)
    for s in range(S):
        out = out + w[s][None, :] * u_cm[:, cols[s]]
    return out


# ---------------------------------------------------------------------------
# Chunk-ALIGNED block-ELL: every GROUP of slots in a node tile gathers
# from ONE statically-known 128-lane source chunk (cmeta, SMEM), so the
# kernel does exactly ngt gathers per tile — no window scan at all.
#
# Motivation (measured on the 1.23M-tet fine operator, scale 16): the
# scan kernel above does ng*kc = 2*32 = 64 chunk iterations per tile
# while per-group LIVE spans average 15 chunks (sorted-slot groups
# straddle the whole RCM band), so neither scanning nor bounds-skip gets
# near the real work; chunk alignment does 7-8 gathers/tile (9x less
# vector work) at the cost of ELL padding (S 16 -> ~88 on that matrix).
# The multiply is FUSED into the per-group loop through a [3G, 128]
# accumulator, so padded tail groups only cost their (zero) vals DMA.
# ---------------------------------------------------------------------------


def _bell_aligned_kernel(S: int, ng: int, split: bool):
    G = S // ng          # slots per group (the pack's `group` param)

    def kernel(cmeta_ref, cols_ref, *args):
        if split:
            (vals_ref, vals_lo_ref, u_ref, out_ref, acc_ref,
             acc_lo_ref) = args
        else:
            vals_ref, u_ref, out_ref, acc_ref = args
            vals_lo_ref = acc_lo_ref = None
        acc_ref[:] = jnp.zeros_like(acc_ref)
        if split:
            acc_lo_ref[:] = jnp.zeros_like(acc_lo_ref)
        for g in range(ng):
            # cmeta_ref is the (1, 1, 1+ng) BLOCK of this tile
            off = cmeta_ref[0, 0, 1 + g] * LANES
            chunk = u_ref[:, pl.ds(pl.multiple_of(off, LANES), LANES)]
            rows = [jnp.broadcast_to(chunk[a:a + 1, :], (G, LANES))
                    for a in range(3)]
            ug = jnp.concatenate(rows, axis=0)            # [3G, 128]
            col8 = cols_ref[0, g * G:(g + 1) * G, :]
            idx8 = col8 - off                # in [0, 128) by construction
            idx24 = jnp.concatenate([idx8, idx8, idx8], axis=0)
            g24 = jnp.take_along_axis(ug, idx24, axis=1,
                                      mode="promise_in_bounds")
            for a in range(3):
                t = t_lo = None
                for b in range(3):
                    gb_ = g24[b * G:(b + 1) * G, :]
                    sl = slice((3 * a + b) * S + g * G,
                               (3 * a + b) * S + (g + 1) * G)
                    # vals may be stored narrower than u (bf16 smoother
                    # levels): DMA the narrow bytes, multiply wide
                    v = vals_ref[0, sl, :].astype(gb_.dtype)
                    term = v * gb_
                    t = term if t is None else t + term
                    if vals_lo_ref is not None:
                        # the lo plane accumulates in its OWN scratch:
                        # lo terms are the eps-level fp32 remainders of
                        # the hi terms, so any per-term or per-group
                        # hi+lo add in fp32 rounds straight back to hi
                        # and silently annihilates the split (seen on
                        # chip: bit-identical output with/without lo)
                        term_lo = vals_lo_ref[0, sl, :].astype(
                            gb_.dtype) * gb_
                        t_lo = (term_lo if t_lo is None
                                else t_lo + term_lo)
                acc_ref[a * G:(a + 1) * G, :] += t
                if acc_lo_ref is not None:
                    acc_lo_ref[a * G:(a + 1) * G, :] += t_lo
        # reduce each plane fully, THEN add once per output element —
        # identical summation structure to the proven two-pass kernels
        outs = [jnp.sum(acc_ref[a * G:(a + 1) * G, :], axis=0,
                        keepdims=True) for a in range(3)]
        out = jnp.concatenate(outs, axis=0)
        if acc_lo_ref is not None:
            outs_lo = [jnp.sum(acc_lo_ref[a * G:(a + 1) * G, :],
                               axis=0, keepdims=True) for a in range(3)]
            out = out + jnp.concatenate(outs_lo, axis=0)
        out_ref[:] = out

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("S", "interpret"))
def bell_matvec_aligned(cols2: jnp.ndarray, vals2: jnp.ndarray,
                        cmeta: jnp.ndarray, u_cm: jnp.ndarray, S: int,
                        vals2_lo: jnp.ndarray = None,
                        interpret: bool = False) -> jnp.ndarray:
    """Raw block-ELL matvec on chunk-aligned layouts.

    ``vals2_lo`` (optional) fuses the fp32 hi/lo split operator into one
    pass: the gather runs once, each value plane accumulates in its own
    scratch, and the two row reductions add once at the end (any earlier
    fp32 hi+lo add rounds the eps-level lo contribution away entirely).
    """
    Nt = cmeta.shape[0]
    Np = u_cm.shape[1]
    ng = cmeta.shape[-1] - 1
    vspec = pl.BlockSpec((1, 9 * S, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1, 1 + ng), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, S, LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        vspec,
    ]
    ops = [cmeta, cols2.reshape(Nt, S, LANES),
           vals2.reshape(Nt, 9 * S, LANES)]
    split = vals2_lo is not None
    if split:
        in_specs.append(vspec)
        ops.append(vals2_lo.reshape(Nt, 9 * S, LANES))
    in_specs.append(pl.BlockSpec((3, Np), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))
    ops.append(u_cm)
    return pl.pallas_call(
        _bell_aligned_kernel(S, ng, split),
        grid=(Nt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((3, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, Np), u_cm.dtype),
        scratch_shapes=(
            [pltpu.VMEM((3 * (S // ng), LANES), u_cm.dtype)]
            * (2 if split else 1)),
        interpret=interpret,
    )(*ops)


def _sell_aligned_kernel(S: int, ng: int):
    G = S // ng

    def kernel(cmeta_ref, cols_ref, w_ref, u_ref, out_ref, acc_ref):
        acc_ref[:] = jnp.zeros_like(acc_ref)
        for g in range(ng):
            # cmeta_ref is the (1, 1, 1+ng) BLOCK of this tile
            off = cmeta_ref[0, 0, 1 + g] * LANES
            chunk = u_ref[:, pl.ds(pl.multiple_of(off, LANES), LANES)]
            rows = [jnp.broadcast_to(chunk[a:a + 1, :], (G, LANES))
                    for a in range(3)]
            ug = jnp.concatenate(rows, axis=0)
            col8 = cols_ref[0, g * G:(g + 1) * G, :]
            idx8 = col8 - off
            idx24 = jnp.concatenate([idx8, idx8, idx8], axis=0)
            g24 = jnp.take_along_axis(ug, idx24, axis=1,
                                      mode="promise_in_bounds")
            w = w_ref[0, g * G:(g + 1) * G, :].astype(ug.dtype)
            for a in range(3):
                acc_ref[a * G:(a + 1) * G, :] += \
                    w * g24[a * G:(a + 1) * G, :]
        outs = [jnp.sum(acc_ref[a * G:(a + 1) * G, :], axis=0,
                        keepdims=True) for a in range(3)]
        out_ref[:] = jnp.concatenate(outs, axis=0)

    return kernel


@functools.partial(jax.jit, static_argnames=("S", "interpret"))
def sell_matvec_aligned(cols2: jnp.ndarray, w2: jnp.ndarray,
                        cmeta: jnp.ndarray, u_cm: jnp.ndarray, S: int,
                        interpret: bool = False) -> jnp.ndarray:
    """Scalar-weight chunk-aligned ELL apply (transfer rows)."""
    Nt = cmeta.shape[0]
    Np = u_cm.shape[1]
    ng = cmeta.shape[-1] - 1
    return pl.pallas_call(
        _sell_aligned_kernel(S, ng),
        grid=(Nt,),
        in_specs=[
            pl.BlockSpec((1, 1, 1 + ng), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Np), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, Nt * LANES), u_cm.dtype),
        scratch_shapes=[pltpu.VMEM((3 * (S // ng), LANES), u_cm.dtype)],
        interpret=interpret,
    )(cmeta, cols2.reshape(Nt, S, LANES), w2.reshape(Nt, S, LANES),
      u_cm)


def ell_layout_aligned(rows: np.ndarray, cols: np.ndarray, n_rows: int,
                       n_cols: int, group: int = GROUP):
    """Chunk-aligned ELL LAYOUT (no values) for sorted-dedup triplets.

    Slot groups (``group`` consecutive slots, kernels derive it as
    ``S // ng``) of each 128-node tile are assigned one source chunk
    each; an entry of lane ``l`` with column chunk ``c`` lands in one of
    that (tile, c) key's groups at its within-(row, chunk) rank.
    Padding slots point AT their group's chunk (column ``c*128``) with
    zero data, so in-kernel indices are always in [0, 128) and padded
    work is value-inert.

    ``rows``/``cols`` MUST already be (row, col)-lexsorted and
    deduplicated.  Returns dict with cols2, cmeta, S, ng, n_rows_p,
    n_cols_p, plus the flat VALUE destination maps that make re-packing
    new values on the same pattern a single fancy-scatter
    (density-parametric hierarchies, round-4 VERDICT #1):

    - ``dest9`` [nnz, 9] int64 — positions into the flat plane-major
      block array ``vals2.reshape(-1)`` (row (t*9 + 3a+b)*S + s);
    - ``dest1`` [nnz] int64 — positions into the flat slot-major scalar
      array ``w2.reshape(-1)`` (row t*S + s).
    """
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    Np = _cdiv(max(n_rows, 1), LANES) * LANES
    Nt = Np // LANES
    n_cols_p = _cdiv(max(n_cols, 1), LANES) * LANES
    NCH = n_cols_p // LANES
    nnz = len(rows)

    tile = rows // LANES
    chunk = cols // LANES
    # rank within the (row, chunk) run (rows/cols sorted => runs are
    # contiguous)
    key_rc = rows * NCH + chunk
    newrun = np.ones(nnz, bool)
    newrun[1:] = key_rc[1:] != key_rc[:-1]
    run_starts = np.flatnonzero(newrun)
    run_id = np.cumsum(newrun) - 1
    r_in_run = np.arange(nnz) - run_starts[run_id]
    run_len = np.diff(np.append(run_starts, nnz))

    # (tile, chunk) keys and their group counts
    key_tc = tile * NCH + chunk
    uk, inv = np.unique(key_tc, return_inverse=True)
    uk_of_run = inv[run_starts]
    kmax = np.zeros(len(uk), np.int64)
    np.maximum.at(kmax, uk_of_run, run_len)
    ngroups_k = -(-kmax // group)
    uk_tile = uk // NCH
    uk_chunk = uk % NCH

    # per-key group base within its tile
    gb = np.zeros(len(uk), np.int64)
    np.cumsum(ngroups_k[:-1], out=gb[1:])
    tile_first = np.ones(len(uk), bool)
    tile_first[1:] = uk_tile[1:] != uk_tile[:-1]
    first_idx = np.flatnonzero(tile_first)
    tile_of_key = np.cumsum(tile_first) - 1
    gb_local = gb - gb[first_idx][tile_of_key]

    ngt = np.bincount(uk_tile, weights=ngroups_k,
                      minlength=Nt).astype(np.int64)
    ng = max(int(ngt.max()) if Nt else 1, 1)
    S = ng * group

    # per-(tile, group) chunk table
    cgrp = np.zeros((Nt, ng), np.int64)
    tot = int(ngroups_k.sum())
    krep = np.repeat(np.arange(len(uk)), ngroups_k)
    kstart = np.concatenate([[0], np.cumsum(ngroups_k)[:-1]])
    within = np.arange(tot) - kstart[krep]
    cgrp[uk_tile[krep], gb_local[krep] + within] = uk_chunk[krep]

    # slot assignment + padding fill (each pad slot points AT its own
    # group's chunk so in-kernel idx stays in [0, 128))
    slot = gb_local[inv] * group + r_in_run
    fill_t = np.repeat(cgrp, group, axis=1) * LANES        # [Nt, S]
    cols_full = np.repeat(fill_t, LANES, axis=0)           # [Np, S]
    cols_full[rows, slot] = cols

    cmeta = np.zeros((Nt, 1, 1 + ng), np.int32)
    cmeta[:, 0, 0] = ngt
    cmeta[:, 0, 1:] = cgrp

    cols2 = cols_full.reshape(Nt, LANES, S).transpose(0, 2, 1) \
        .reshape(Nt * S, LANES).astype(np.int32)
    lane = rows % LANES
    # flat position of entry (row, slot) for block component 3a+b:
    #   ((t*9 + 3a+b)*S + s)*128 + l   (plane-major vals2)
    dest9 = ((((tile * 9)[:, None] + np.arange(9)[None, :]) * S
              + slot[:, None]) * LANES + lane[:, None])
    # scalar (slot-major w2): (t*S + s)*128 + l
    dest1 = (tile * S + slot) * LANES + lane
    return {"cols2": cols2, "cmeta": cmeta, "S": S, "ng": ng,
            "n_rows_p": Np, "n_cols_p": n_cols_p,
            "dest9": dest9, "dest1": dest1}


def fill_ell_values(layout: dict, data: np.ndarray,
                    out_dtype=None) -> np.ndarray:
    """Scatter (dedup-sorted) triplet values into the aligned device
    layout via the precomputed destination map — the cheap re-pack for
    new values on a fixed pattern.  ``data`` is [nnz, 3, 3]/[nnz, 9]
    (block) or [nnz] (scalar)."""
    data = np.asarray(data)
    Nt = layout["n_rows_p"] // LANES
    S = layout["S"]
    dt = np.dtype(out_dtype) if out_dtype is not None else data.dtype
    if data.ndim > 1:                       # 3x3 blocks
        vals2 = np.zeros(Nt * 9 * S * LANES, dt)
        vals2[layout["dest9"].reshape(-1)] = \
            data.reshape(-1, 9).astype(dt, copy=False).reshape(-1)
        return vals2.reshape(Nt * 9 * S, LANES)
    vals2 = np.zeros(Nt * S * LANES, dt)
    vals2[layout["dest1"]] = data.astype(dt, copy=False)
    return vals2.reshape(Nt * S, LANES)


def pack_ell_aligned(rows: np.ndarray, cols: np.ndarray,
                     data: np.ndarray, n_rows: int, n_cols: int,
                     group: int = GROUP):
    """Sort triplets into the chunk-aligned ELL device layouts
    (layout derivation + value fill; see :func:`ell_layout_aligned`).

    Returns dict with cols2, vals2 (plane-major for blocks, slot-major
    for scalars), cmeta [Nt, 1, 1+ng] ([ngt, chunk_0..]), S, ng,
    n_rows_p, n_cols_p.
    """
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    data = np.asarray(data)
    order = np.lexsort((cols, rows))
    rows, cols, data = rows[order], cols[order], data[order]
    layout = ell_layout_aligned(rows, cols, n_rows, n_cols, group=group)
    vals2 = fill_ell_values(layout, data)
    return {"cols2": layout["cols2"], "vals2": vals2,
            "cmeta": layout["cmeta"], "S": layout["S"],
            "ng": layout["ng"], "n_rows_p": layout["n_rows_p"],
            "n_cols_p": layout["n_cols_p"]}


# ---------------------------------------------------------------------------
# Host-side packing: (rows, cols, data) triplets -> the device layouts
# ---------------------------------------------------------------------------


def pack_ell_rows(rows: np.ndarray, cols: np.ndarray, data: np.ndarray,
                  n_rows: int, n_cols: int):
    """Sort triplets into fixed-width ELL rows + lane-major device arrays.

    ``data`` is [nnz, 3, 3] (block) or [nnz] (scalar).  Entries within a
    row are sorted by column (tight gather windows); the slot count S is
    padded to a multiple of GROUP.  Padding slots repeat the row's last
    real column with zero data; fully-empty rows forward-fill from the
    nearest preceding real row so lane padding never widens windows.

    Returns dict with cols2, vals2 (plane-major for blocks, slot-major
    for scalars), wblk, gbounds, S, kc, n_rows_p, n_cols_p.
    """
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    order = np.lexsort((cols, rows))
    rows, cols, data = rows[order], cols[order], np.asarray(data)[order]
    counts = np.bincount(rows, minlength=n_rows)
    S = max(int(counts.max()) if n_rows else 1, 1)
    S = _cdiv(S, GROUP) * GROUP
    Np = _cdiv(max(n_rows, 1), LANES) * LANES
    Nt = Np // LANES
    block = data.ndim == 3

    cols_full = np.zeros((Np, S), np.int64)
    vals_full = np.zeros((Np, S, 3, 3) if block else (Np, S), data.dtype)
    slot = np.concatenate([np.arange(c) for c in counts]) \
        if counts.sum() else np.zeros(0, np.int64)
    rr = np.repeat(np.arange(n_rows), counts)
    cols_full[rr, slot] = cols
    vals_full[rr, slot] = data
    counts_p = np.zeros(Np, np.int64)
    counts_p[:n_rows] = counts
    # padding fill: the row's LAST real column (tail slots stay tight);
    # empty rows forward-fill from the nearest preceding real row
    last_col = cols_full[np.arange(Np), np.maximum(counts_p - 1, 0)]
    has = counts_p > 0
    last_real = np.where(has, np.arange(Np), -1)
    np.maximum.accumulate(last_real, out=last_real)
    fill = np.where(last_real >= 0, last_col[np.maximum(last_real, 0)], 0)
    pad_mask = np.arange(S)[None, :] >= counts_p[:, None]
    cols_full = np.where(pad_mask, fill[:, None], cols_full)

    # per-tile window (chunk-scan grid)
    ct = cols_full.reshape(Nt, LANES * S)
    cmin = ct.min(axis=1)
    cmax = ct.max(axis=1)
    wblk = (cmin // LANES).astype(np.int64)
    kc = int(np.max(cmax // LANES - wblk)) + 1 if Nt else 1
    n_cols_p = _cdiv(max(n_cols, 1), LANES) * LANES
    kc = min(kc, n_cols_p // LANES)
    # keep every tile's kc-chunk window inside the padded source: a
    # clamped window still covers the tile's span (span <= kc chunks)
    wblk = np.minimum(wblk, n_cols_p // LANES - kc)

    # per-(tile, group) live chunk ranges, relative to wblk
    ng = S // GROUP
    cg = cols_full.reshape(Nt, LANES, ng, GROUP)
    glo = cg.min(axis=(1, 3)) // LANES - wblk[:, None]       # [Nt, ng]
    ghi = cg.max(axis=(1, 3)) // LANES - wblk[:, None]
    gbounds = np.stack([np.clip(glo, 0, kc - 1),
                        np.clip(ghi, 0, kc - 1)], axis=2) \
        .reshape(Nt, 1, 2 * ng).astype(np.int32)

    cols2 = cols_full.reshape(Nt, LANES, S).transpose(0, 2, 1) \
        .reshape(Nt * S, LANES).astype(np.int32)
    if block:
        # plane-major: row (t*9 + 3a+b)*S + s
        vals2 = vals_full.reshape(Nt, LANES, S, 9) \
            .transpose(0, 3, 2, 1).reshape(Nt * 9 * S, LANES)
    else:
        vals2 = vals_full.reshape(Nt, LANES, S).transpose(0, 2, 1) \
            .reshape(Nt * S, LANES)
    return {"cols2": cols2, "vals2": vals2,
            "wblk": wblk.astype(np.int32), "gbounds": gbounds,
            "S": S, "kc": kc, "n_rows_p": Np, "n_cols_p": n_cols_p}
