"""BASELINE config 5 for real: 64 density fields x 4 load cases through
evaluate_design_batch (parallel/sweep.py), with per-lane convergence
masks and energy cross-checks against direct oracles on sampled lanes.

Prints ONE bench-style JSON line: sweep throughput in lanes/s.

    python tools/bench_sweep.py [nx ny nz] [B] [L]

Defaults: 16x8x4 cantilever (the dryrun mesh class scaled up), 64
densities, 4 load cases, SIMP E0=1, nu=0.3, Emin=1e-9, p=3.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from topopteval_tpu.api import (apply_fixed_boundary, apply_force,
                                    assemble_stiffness_matrix,
                                    evaluate_design_batch, setup_problem,
                                    solve_system)
    from topopteval_tpu.config import SolverConfig
    from topopteval_tpu.fem.bc import nodes_at_plane
    from topopteval_tpu.materials import SIMPMaterial, lame_parameters
    from topopteval_tpu.models.beams import generate_grid_tet
    from topopteval_tpu.utils import set_verbosity

    set_verbosity(False)
    args = [int(a) for a in sys.argv[1:]]
    nx, ny, nz = (args[0], args[1], args[2]) if len(args) >= 3 \
        else (16, 8, 4)
    B = args[3] if len(args) >= 4 else 64
    L = args[4] if len(args) >= 5 else 4

    mesh = generate_grid_tet(nx, ny, nz, (0, 0, 0), (6.0, 2.0, 1.0))
    problem = setup_problem(mesh, dtype=jnp.float32)
    lam, mu = lame_parameters(1.0, 0.3)
    assemble_stiffness_matrix(problem, lam, mu)
    apply_fixed_boundary(problem, nodes_at_plane(mesh, 0, 0.0))
    tip = nodes_at_plane(mesh, 0, 6.0)
    apply_force(problem, tip, [0.0, 0.0, -1.0])
    material = SIMPMaterial(E0=1.0, nu=0.3, Emin=1e-9, p=3.0)

    rng = np.random.default_rng(0)
    densities = rng.uniform(0.05, 1.0, (B, mesh.n_cells))
    densities[:, : mesh.n_cells // 4] = 1.0     # stiff load path
    loads = np.zeros((L, mesh.n_dofs))
    dirs = [(0, 0, -1.0), (0, -1.0, 0), (1.0, 0, 0), (0, 0.7, -0.7)]
    for j in range(L):
        for c, v in enumerate(dirs[j % 4]):
            loads[j, tip * 3 + c] = v / tip.size

    tol, maxiter = 1e-6, 20000
    log(f"mesh {mesh.n_cells} tets / {mesh.n_dofs} dofs; {B}x{L} lanes "
        f"(SIMP Emin=1e-9 p=3, tol={tol})")
    # warmup (compile)
    e, it, conv = evaluate_design_batch(problem, densities, loads,
                                        material=material, tol=tol,
                                        maxiter=maxiter)
    t0 = time.perf_counter()
    e, it, conv = evaluate_design_batch(problem, densities, loads,
                                        material=material, tol=tol,
                                        maxiter=maxiter)
    dt = time.perf_counter() - t0
    lanes = B * L
    log(f"sweep: {dt:.2f}s for {lanes} lanes -> {lanes / dt:.2f} lanes/s; "
        f"converged {int(conv.sum())}/{lanes}, "
        f"iters p50={int(np.median(it))} max={int(it.max())}")

    # correctness: sampled lanes vs fp64 direct oracle
    errs = []
    for b, j in [(0, 0), (B // 2, L - 1), (B - 1, 1 % L)]:
        lam_b, mu_b = material.lame(densities[b])
        problem.lam, problem.mu = np.asarray(lam_b), np.asarray(mu_b)
        problem.f = loads[j]
        r = solve_system(problem, SolverConfig(method="direct",
                                               verbose=False))
        errs.append(abs(float(e[b, j]) - r.energy) / abs(r.energy))
    log(f"oracle rel errs (3 sampled lanes): {[f'{x:.2e}' for x in errs]}")

    print(json.dumps({
        "metric": "design_sweep_lanes_per_s",
        "value": round(lanes / dt, 3),
        "unit": "lanes/s",
        "vs_baseline": None,
        "detail": {
            "B": B, "L": L, "n_tets": mesh.n_cells,
            "n_dofs": mesh.n_dofs,
            "converged_lanes": int(conv.sum()),
            "total_lanes": lanes,
            "iters_median": int(np.median(it)),
            "iters_max": int(it.max()),
            "oracle_rel_err_max": max(errs),
            "simp": {"Emin": 1e-9, "p": 3.0},
            "tolerance": tol,
            "seconds": round(dt, 3),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
