"""Benchmark: ~1M-tet cantilever, matrix-free block-Jacobi PCG on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric = end-to-end device solve seconds on the ~1M-tet refined
beam (BASELINE.md target: < 5 s on one v5p chip; vs_baseline = 5/actual so
>1.0 beats the target).  Assembly throughput (tets/s, target 1e8) and CG
iteration stats go to stderr.
"""

import json
import os
import sys
import time

import numpy as np

# persistent compilation cache: the axon remote compile is slow (minutes
# for the big fused kernels); cache hits make reruns start in seconds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from topopteval_tpu.fem.bc import DirichletBC, free_mask_from_bcs, \
        nodes_at_plane
    from topopteval_tpu.fem.operator import StiffnessOperator
    from topopteval_tpu.fem.solvers import (block_jacobi_preconditioner, cg)
    from topopteval_tpu.materials import lame_parameters
    from topopteval_tpu.models.beams import refined_beam
    from topopteval_tpu.ops.elements import element_stiffness
    from topopteval_tpu.utils import set_verbosity

    set_verbosity(False)
    dtype = jnp.float32
    target_tets = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000

    t0 = time.perf_counter()
    mesh = refined_beam(target_tets)
    log(f"mesh: {mesh.n_cells} tets, {mesh.n_nodes} nodes, "
        f"{mesh.n_dofs} dofs ({time.perf_counter() - t0:.1f}s host build)")

    fixed = DirichletBC.fixed(nodes_at_plane(mesh, 0, 0.0))
    mask = free_mask_from_bcs(mesh.n_dofs, [fixed])
    tip = nodes_at_plane(mesh, 0, 60.0)
    f = np.zeros(mesh.n_dofs)
    f[tip * 3 + 2] = -1.0 / tip.size

    lam, mu = lame_parameters(1.0, 0.3)
    dmesh = mesh.device(dtype=dtype)
    # order=1 is exact for constant-strain tet4 (B constant) — 4x less
    # per-iteration geometry work than the parity-default 4-point rule
    op = StiffnessOperator.build(dmesh, lam, mu,
                                 free_mask=jnp.asarray(mask, dtype),
                                 mode="otf", order=1)
    f_dev = jnp.asarray(f, dtype) * op.free_mask

    # --- assembly throughput (fused Pallas Ke batch from coords) -----------
    from topopteval_tpu.ops.pallas_kernels import \
        tet4_element_stiffness_pallas
    coords_e = dmesh.coords[dmesh.conn]
    ke_fn = jax.jit(lambda ce: tet4_element_stiffness_pallas(
        ce, jnp.full(ce.shape[0], lam, dtype),
        jnp.full(ce.shape[0], mu, dtype), transpose_out=False))
    ke = ke_fn(coords_e)
    ke.block_until_ready()          # compile + warmup
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        ke = ke_fn(coords_e)
    ke.block_until_ready()
    asm_s = (time.perf_counter() - t0) / reps
    tets_per_s = mesh.n_cells / asm_s
    log(f"assembly: {asm_s * 1e3:.1f} ms -> {tets_per_s:.3e} tets/s "
        f"(target 1e8)")
    del ke

    # --- end-to-end solve --------------------------------------------------
    # chunked unrolled PCG: <=CHUNK iterations per device program (the axon
    # runtime kills long-running programs), 8 CG iterations per loop step
    # (amortizes the ~5 ms/step dispatch overhead, tools/tpu_bisect5)
    tol, unroll = 1e-6, 8
    # keep each device program under the axon runtime's execution watchdog
    chunk = 2000 if mesh.n_cells <= 300_000 else 600
    max_chunks = 60

    M = block_jacobi_preconditioner(op.node_blocks_raw(), op.free_mask)
    M.block_until_ready()

    def solve(verbose=False):
        x = None
        total = 0
        for ci in range(max_chunks):
            res = cg(op, f_dev, x0=x, M=M, tol=tol, maxiter=chunk,
                     precise_dots=False, unroll=unroll)
            x = res.x
            total += int(res.niter)
            if verbose:
                log(f"  chunk {ci}: +{int(res.niter)} iters, "
                    f"rnorm={float(res.residual_norm):.3e}")
            if bool(res.converged):
                break
        return res, total

    res, iters = solve(verbose=True)  # compile + warmup
    res.x.block_until_ready()
    log(f"warmup solve: iters={iters} "
        f"converged={bool(res.converged)} rnorm={float(res.residual_norm):.3e}")

    t0 = time.perf_counter()
    res, iters = solve(verbose=True)
    res.x.block_until_ready()
    solve_s = time.perf_counter() - t0

    energy = float(0.5 * jnp.vdot(res.x, f_dev))
    log(f"solve: {solve_s:.3f}s, {iters} iters "
        f"({solve_s / max(iters, 1) * 1e3:.2f} ms/iter), energy={energy:.6e}")
    dof_iters_per_s = mesh.n_dofs * iters / solve_s
    log(f"PCG throughput: {dof_iters_per_s:.3e} DOF-iters/s")

    print(json.dumps({
        "metric": "e2e_solve_seconds_1M_tet_beam",
        "value": round(solve_s, 4),
        "unit": "s",
        "vs_baseline": round(5.0 / solve_s, 3),
        "detail": {
            "n_tets": mesh.n_cells,
            "n_dofs": mesh.n_dofs,
            "cg_iters": iters,
            "converged": bool(res.converged),
            "tolerance": tol,
            "energy": energy,
            "assembly_tets_per_s": round(tets_per_s),
            "dof_iters_per_s": round(dof_iters_per_s),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
