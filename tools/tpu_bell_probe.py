"""On-chip validation + microbenchmark of the BELL Pallas kernels.

Stages (progress printed per stage so run_tpu.sh sees growth):
1. small random BSR: grouped chunk-scan kernel vs the jnp twin
2. small transfer (sell) kernel vs twin
3. beam-mesh BSR at the requested scale: correctness vs host scipy,
   then chained-matvec timing

Usage: python tools/tpu_bell_probe.py [scale]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np


def log(msg):
    print(msg, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    log(f"devices: {jax.devices()}")

    from topopteval_tpu.ops.pallas_bsr import (
        LANES, bell_matvec_pallas, bell_matvec_reference, pack_ell_rows,
        sell_matvec_pallas, sell_matvec_reference)

    rng = np.random.default_rng(0)

    # -- stage 1: small random BSR ------------------------------------------
    N = 300
    nnzb = 2500
    rows = rng.integers(0, N, nnzb)
    cols = np.clip(rows + rng.integers(-40, 41, nnzb), 0, N - 1)
    blocks = rng.standard_normal((nnzb, 3, 3)).astype(np.float32)
    pk = pack_ell_rows(rows, cols, blocks, N, N)
    Np = pk["n_rows_p"]
    u = np.zeros((3, Np), np.float32)
    u[:, :N] = rng.standard_normal((3, N)).astype(np.float32)
    u_d = jnp.asarray(u)
    c2, v2 = jnp.asarray(pk["cols2"]), jnp.asarray(pk["vals2"])
    ref = np.asarray(bell_matvec_reference(c2, v2, u_d, pk["S"]))
    t0 = time.time()
    out1 = np.asarray(bell_matvec_pallas(
        c2, v2, jnp.asarray(pk["wblk"]), jnp.asarray(pk["gbounds"]),
        u_d, pk["S"], pk["kc"]))
    err1 = np.abs(out1 - ref).max() / np.abs(ref).max()
    log(f"stage1 bell: err={err1:.2e} (compile {time.time()-t0:.1f}s, "
        f"S={pk['S']} kc={pk['kc']})")
    assert err1 < 1e-5, "small-case kernel mismatch"

    # -- stage 2: small transfer --------------------------------------------
    nnz = 1200
    prow = rng.integers(0, N, nnz)
    pcol = np.clip(prow // 2 + rng.integers(-10, 11, nnz), 0, N // 2 - 1)
    w = rng.standard_normal(nnz).astype(np.float32)
    pp = pack_ell_rows(prow, pcol, w, N, N // 2)
    ncp = pp["n_cols_p"]
    uc = np.zeros((3, ncp), np.float32)
    uc[:, :N // 2] = rng.standard_normal((3, N // 2)).astype(np.float32)
    uc_d = jnp.asarray(uc)
    pc2, pw2 = jnp.asarray(pp["cols2"]), jnp.asarray(pp["vals2"])
    refp = np.asarray(sell_matvec_reference(pc2, pw2, uc_d, pp["S"],
                                            pp["n_rows_p"]))
    o1 = np.asarray(sell_matvec_pallas(
        pc2, pw2, jnp.asarray(pp["wblk"]), jnp.asarray(pp["gbounds"]),
        uc_d, pp["S"], pp["kc"]))
    scale_p = np.abs(refp).max()
    log(f"stage2 sell: err={np.abs(o1-refp).max()/scale_p:.2e}")
    assert np.abs(o1 - refp).max() / scale_p < 1e-5

    # -- stage 3: beam mesh at scale ----------------------------------------
    from topopteval_tpu.fem.bell import (assemble_bsr_triplets,
                                         _permute_triplets,
                                         _triplets_to_scipy_bsr, rcm_order)
    from topopteval_tpu.materials import lame_parameters
    from topopteval_tpu.models.beams import generate_grid_tet

    nx, ny, nz = 25 * scale // 2, 4 * scale, scale
    mesh = generate_grid_tet(nx, ny, nz, (0, 0, 0), (60, 20, 4))
    log(f"stage3 mesh: {mesh.n_cells} tets, {mesh.n_nodes} nodes")
    lam, mu = lame_parameters(1.0, 0.3)
    t0 = time.time()
    C = mesh.n_cells
    r3, c3, b3 = assemble_bsr_triplets(
        mesh, np.full(C, lam), np.full(C, mu))
    perm = rcm_order(r3, c3, mesh.n_nodes)
    r3, c3, b3 = _permute_triplets(r3, c3, b3, perm)
    pk3 = pack_ell_rows(r3, c3, b3.astype(np.float32), mesh.n_nodes,
                        mesh.n_nodes)
    log(f"stage3 host build {time.time()-t0:.1f}s: S={pk3['S']} "
        f"kc={pk3['kc']} Nt={pk3['n_rows_p']//LANES}")
    A = _triplets_to_scipy_bsr(r3, c3, b3, mesh.n_nodes)
    Np3 = pk3["n_rows_p"]
    x = np.zeros((3, Np3), np.float32)
    x[:, :mesh.n_nodes] = rng.standard_normal(
        (3, mesh.n_nodes)).astype(np.float32)
    truth = (A @ x[:, :mesh.n_nodes].T.reshape(-1)).reshape(-1, 3).T

    c2, v2 = jnp.asarray(pk3["cols2"]), jnp.asarray(pk3["vals2"])
    wb, gb = jnp.asarray(pk3["wblk"]), jnp.asarray(pk3["gbounds"])
    x_d = jnp.asarray(x)
    tscale = np.abs(truth).max()

    import functools

    @functools.partial(jax.jit, static_argnames=("S", "kc", "reps"))
    def chain(c2, v2, wb, gb, x, S, kc, reps):
        y = x
        for _ in range(reps):
            y = bell_matvec_pallas(c2, v2, wb, gb, y, S, kc)
            y = y * (1.0 / jnp.float32(1000.0))   # keep magnitudes bounded
        return y

    t0 = time.time()
    o = np.asarray(chain(c2, v2, wb, gb, x_d, pk3["S"], pk3["kc"], 1)
                   )[:, :mesh.n_nodes] * 1000.0
    err = np.abs(o - truth).max() / tscale
    log(f"stage3 bell: err={err:.2e} (compile+run {time.time()-t0:.1f}s)")
    reps = 20
    t0 = time.time()
    chain(c2, v2, wb, gb, x_d, pk3["S"], pk3["kc"],
          reps).block_until_ready()
    t_compile = time.time() - t0
    t0 = time.time()
    chain(c2, v2, wb, gb, x_d, pk3["S"], pk3["kc"],
          reps).block_until_ready()
    dt = (time.time() - t0) / reps
    nnzb3 = len(r3)
    gbps = (nnzb3 * (36 + 4) + Np3 * 3 * 4 * 2) / dt / 1e9
    log(f"stage3 bell: {dt*1e3:.2f} ms/matvec "
        f"({gbps:.0f} GB/s effective; chain compile {t_compile:.1f}s)")

    log("PROBE OK")


if __name__ == "__main__":
    main()
