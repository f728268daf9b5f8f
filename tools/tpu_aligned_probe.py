"""On-chip parity probe for the chunk-aligned BELL/SELL kernels.

Compares bell_matvec_aligned / sell_matvec_aligned against their pure-jnp
reference twins ON THE SAME DEVICE DATA, for (a) a synthetic banded block
matrix and (b) a real mesh fine operator at a chosen scale.  Catches
TPU-only lowering bugs the interpret-mode tests cannot see.

    ./tools/run_tpu.sh /tmp/probe.log 900 3 python tools/tpu_aligned_probe.py [scale]
"""

import os
import sys

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from topopteval_tpu.ops.pallas_bsr import (
        bell_matvec_aligned, bell_matvec_reference, pack_ell_aligned,
        sell_matvec_aligned, sell_matvec_reference)

    rng = np.random.default_rng(0)

    # --- synthetic banded block matrix --------------------------------------
    N, band, deg = 2000, 300, 14
    rows_l, cols_l = [], []
    for r in range(N):
        c = np.unique(rng.integers(max(0, r - band),
                                   min(N, r + band), deg))
        rows_l += [r] * len(c)
        cols_l += list(c)
    rows = np.array(rows_l)
    cols = np.array(cols_l)
    blocks = rng.standard_normal((len(rows), 3, 3)).astype(np.float32)
    pk = pack_ell_aligned(rows, cols, blocks, N, N)
    u = jnp.asarray(rng.standard_normal((3, pk["n_rows_p"])), jnp.float32)
    c2, v2 = jnp.asarray(pk["cols2"]), jnp.asarray(pk["vals2"])
    cm = jnp.asarray(pk["cmeta"])
    ref = np.asarray(bell_matvec_reference(c2, v2, u, pk["S"]))
    out = np.asarray(bell_matvec_aligned(c2, v2, cm, u, pk["S"]))
    scale_mag = np.abs(ref).max()
    err = np.abs(out - ref).max() / scale_mag
    log(f"bell synthetic: S={pk['S']} rel err {err:.2e} "
        f"({'OK' if err < 1e-5 else 'MISMATCH'})")

    # split plumbing — an INDEPENDENT lo plane at representable scale:
    # verifies the lo plane actually multiplies and adds (a kernel that
    # fuses hi+lo per term would at this scale show delta != lo matvec)
    lo_ind = rng.standard_normal(blocks.shape).astype(np.float32) * 1e-4
    pk_lo = pack_ell_aligned(rows, cols, lo_ind, N, N)
    out_hi = np.asarray(bell_matvec_aligned(
        c2, v2, cm, u, pk["S"]), np.float64)
    out2 = np.asarray(bell_matvec_aligned(
        c2, v2, cm, u, pk["S"],
        vals2_lo=jnp.asarray(pk_lo["vals2"])), np.float64)
    ref_lo = np.asarray(bell_matvec_reference(
        jnp.asarray(pk_lo["cols2"]), jnp.asarray(pk_lo["vals2"]),
        u, pk_lo["S"]), np.float64)
    derr = (np.abs((out2 - out_hi) - ref_lo).max()
            / max(np.abs(ref_lo).max(), 1e-300))
    log(f"bell split plumbing: delta-vs-lo rel err {derr:.2e} "
        f"({'OK' if derr < 2e-2 else 'MISMATCH'})")

    # NOTE on the eps regime (true hi/lo remainders): a single-matvec
    # probe CANNOT demonstrate the split there — fp32 arithmetic noise
    # is the same order as the storage remainder, and the split's value
    # is that the storage BIAS is fixed across refinement passes while
    # arithmetic noise contracts.  The on-chip acceptance test for that
    # is the end-to-end refinement gate (tools/bench_unstructured.py
    # oracle + backward error), not this probe.

    # --- scalar transfer-like rectangular -----------------------------------
    Nc = 500
    prow = rng.integers(0, N, 6000)
    pcol = np.clip(prow // 4 + rng.integers(-20, 21, 6000), 0, Nc - 1)
    w = rng.standard_normal(len(prow)).astype(np.float32)
    sp_ = pack_ell_aligned(prow, pcol, w, N, Nc)
    uc = jnp.asarray(rng.standard_normal((3, sp_["n_cols_p"])),
                     jnp.float32)
    sc2, sw2 = jnp.asarray(sp_["cols2"]), jnp.asarray(sp_["vals2"])
    scm = jnp.asarray(sp_["cmeta"])
    sref = np.asarray(sell_matvec_reference(sc2, sw2, uc, sp_["S"],
                                            sp_["n_rows_p"]))
    sout = np.asarray(sell_matvec_aligned(sc2, sw2, scm, uc, sp_["S"]))
    serr = np.abs(sout - sref).max() / max(np.abs(sref).max(), 1e-30)
    log(f"sell synthetic: S={sp_['S']} rel err {serr:.2e} "
        f"({'OK' if serr < 1e-5 else 'MISMATCH'})")

    # --- real mesh fine operator + full V-cycle parity ----------------------
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from topopteval_tpu.fem.bell import build_bell_multigrid
    from topopteval_tpu.models.beams import generate_grid_tet
    mesh = generate_grid_tet(25 * scale // 2, 4 * scale, scale,
                             (0.0, 0.0, 0.0), (60.0, 20.0, 4.0))
    mesh.structured_info = None
    system, mg, info = build_bell_multigrid(mesh, 0.576923, 0.384615,
                                            dtype=jnp.float32)
    A = system.matrix
    x = jnp.asarray(rng.standard_normal(A.n_dofs), jnp.float32)
    y_pal = np.asarray(A.matvec(x))
    import dataclasses
    A_ref = dataclasses.replace(A, use_pallas=False)
    y_ref = np.asarray(A_ref.matvec(x))
    merr = np.abs(y_pal - y_ref).max() / np.abs(y_ref).max()
    log(f"mesh fine matvec (scale {scale}, S={A.S}): rel err {merr:.2e} "
        f"({'OK' if merr < 1e-5 else 'MISMATCH'})")

    # transfers of level 0
    t = mg.levels[0].transfer
    if t is not None:
        zc = jnp.asarray(rng.standard_normal((3, t.nc_p)), jnp.float32)
        p_pal = np.asarray(t.prolong(zc))
        t_ref = dataclasses.replace(t, use_pallas=False)
        p_ref = np.asarray(t_ref.prolong(zc))
        perr = np.abs(p_pal - p_ref).max() / max(np.abs(p_ref).max(),
                                                 1e-30)
        rf = jnp.asarray(rng.standard_normal((3, t.nf_p)), jnp.float32)
        r_pal = np.asarray(t.restrict(rf))
        r_ref = np.asarray(t_ref.restrict(rf))
        rerr = np.abs(r_pal - r_ref).max() / max(np.abs(r_ref).max(),
                                                 1e-30)
        log(f"transfers: prolong rel err {perr:.2e}, restrict {rerr:.2e} "
            f"({'OK' if max(perr, rerr) < 1e-5 else 'MISMATCH'})")

    # --- group=4 packing of the same fine matrix: parity + timing A/B ------
    # (the low-padding layout: S drops ~45% on RCM-banded FEM matrices;
    # the Mosaic risk is the [3*4, 128] scratch slicing at sub-sublane
    # offsets, which only the real chip can validate)
    import time

    from topopteval_tpu.fem.bell import (_permute_triplets,
                                         assemble_bsr_triplets, rcm_order)
    rows_m, cols_m, blocks_m = assemble_bsr_triplets(
        mesh, np.full(mesh.n_cells, 0.576923),
        np.full(mesh.n_cells, 0.384615), 2)
    perm_m = rcm_order(rows_m, cols_m, mesh.n_nodes)
    rows_m, cols_m, blocks_m = _permute_triplets(rows_m, cols_m,
                                                 blocks_m, perm_m)
    x32 = np.asarray(rng.standard_normal((3, A.n_rows_p)), np.float32)
    outs_g = {}
    for gsz in (8, 4):
        pkg = pack_ell_aligned(rows_m, cols_m,
                               blocks_m.astype(np.float32),
                               mesh.n_nodes, mesh.n_nodes, group=gsz)
        cg_ = jnp.asarray(pkg["cols2"])
        vg_ = jnp.asarray(pkg["vals2"])
        mg_ = jnp.asarray(pkg["cmeta"])
        ug_ = jnp.asarray(x32[:, :pkg["n_rows_p"]])
        o = bell_matvec_aligned(cg_, vg_, mg_, ug_, pkg["S"])
        o.block_until_ready()
        t0 = time.perf_counter()
        reps = 30
        for _ in range(reps):
            o = bell_matvec_aligned(cg_, vg_, mg_, ug_, pkg["S"])
        o.block_until_ready()
        dt = (time.perf_counter() - t0) / reps * 1e3
        outs_g[gsz] = (np.asarray(o, np.float64), dt, pkg["S"])
        log(f"group={gsz}: S={pkg['S']} matvec {dt:.2f} ms")
    gerr = (np.abs(outs_g[4][0] - outs_g[8][0]).max()
            / max(np.abs(outs_g[8][0]).max(), 1e-30))
    log(f"group4 vs group8 parity: rel err {gerr:.2e} "
        f"({'OK' if gerr < 1e-5 else 'MISMATCH'}); "
        f"speedup {outs_g[8][1] / outs_g[4][1]:.2f}x")

    # V-cycle apply parity (pallas MG vs reference-twin MG, same arrays)
    r = jnp.asarray(rng.standard_normal(A.n_dofs), jnp.float32)
    z_pal = np.asarray(mg.apply(r))

    def strip(mgl):
        lvl = dataclasses.replace(
            mgl, op=dataclasses.replace(mgl.op, use_pallas=False),
            transfer=(dataclasses.replace(mgl.transfer, use_pallas=False)
                      if mgl.transfer is not None else None))
        return lvl
    mg_ref = dataclasses.replace(
        mg, levels=tuple(strip(l) for l in mg.levels))
    z_ref = np.asarray(mg_ref.apply(r))
    verr = np.abs(z_pal - z_ref).max() / np.abs(z_ref).max()
    log(f"V-cycle apply: rel err {verr:.2e} "
        f"({'OK' if verr < 1e-4 else 'MISMATCH'})")


if __name__ == "__main__":
    main()
