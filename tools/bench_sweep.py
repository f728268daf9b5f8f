"""BASELINE config 5 for real: 64 density fields x 4 load cases through
evaluate_design_batch (parallel/sweep.py), with per-lane convergence
masks and energy cross-checks against fp64 direct oracles on sampled
lanes (computed in a CPU/x64 subprocess — an in-process "direct" oracle
without x64 assembles K in fp32, and at SIMP contrast 1e-9 cond(K) makes
an fp32 factorization itself ~1e-2 wrong, gating nothing).

Prints ONE bench-style JSON line: sweep throughput in lanes/s.

    python tools/bench_sweep.py [nx ny nz] [B] [L]

Defaults: 16x8x4 cantilever (the dryrun mesh class scaled up), 64
densities, 4 load cases, SIMP E0=1, nu=0.3, Emin=1e-9, p=3.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_case(nx, ny, nz, B, L):
    """The benchmark problem, deterministic in (nx, ny, nz, B, L) so the
    CPU/x64 oracle subprocess reconstructs the identical lanes."""
    import jax.numpy as jnp

    from topopteval_tpu.api import (apply_fixed_boundary, apply_force,
                                    assemble_stiffness_matrix,
                                    setup_problem)
    from topopteval_tpu.fem.bc import nodes_at_plane
    from topopteval_tpu.materials import SIMPMaterial, lame_parameters

    from topopteval_tpu.models.beams import generate_grid_tet

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
    return mesh, problem, material, densities, loads


def oracle_main(nx, ny, nz, B, L, lanes):
    """fp64 direct energies for sampled (b, j) lanes — run me with the
    CPU platform and x64 forced (the parent sets that up)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from topopteval_tpu.api import solve_system
    from topopteval_tpu.config import SolverConfig
    from topopteval_tpu.utils import set_verbosity

    set_verbosity(False)
    _, problem, material, densities, loads = build_case(nx, ny, nz, B, L)
    out = {}
    for b, j in lanes:
        lam_b, mu_b = material.lame(densities[b])
        problem.lam = np.asarray(lam_b, np.float64)
        problem.mu = np.asarray(mu_b, np.float64)
        problem.f = loads[j]
        r = solve_system(problem, SolverConfig(method="direct",
                                               verbose=False))
        out[f"{b},{j}"] = r.energy
    print("ORACLE " + json.dumps(out))


def main():
    import jax
    import jax.numpy as jnp

    from topopteval_tpu.api import evaluate_design_batch
    from topopteval_tpu.utils import set_verbosity

    set_verbosity(False)
    args = [int(a) for a in sys.argv[1:]]
    nx, ny, nz = (args[0], args[1], args[2]) if len(args) >= 3 \
        else (16, 8, 4)
    B = args[3] if len(args) >= 4 else 64
    L = args[4] if len(args) >= 5 else 4

    mesh, problem, material, densities, loads = build_case(nx, ny, nz,
                                                           B, L)
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

    # correctness: sampled lanes vs fp64 direct oracle (subprocess with
    # CPU platform + x64 — see module docstring)
    sampled = [(0, 0), (B // 2, L - 1), (B - 1, 1 % L)]
    cmd = [sys.executable, os.path.abspath(__file__),
           str(nx), str(ny), str(nz), str(B), str(L), "--oracle",
           ",".join(f"{b}:{j}" for b, j in sampled)]
    t0 = time.perf_counter()
    res = subprocess.run(cmd, capture_output=True, text=True,
                         timeout=3600)
    errs = []
    if res.returncode == 0:
        for line in reversed(res.stdout.strip().splitlines()):
            if line.startswith("ORACLE "):
                table = json.loads(line[len("ORACLE "):])
                for b, j in sampled:
                    ref = table[f"{b},{j}"]
                    errs.append(abs(float(e[b, j]) - ref) / abs(ref))
                break
    if errs:
        log(f"fp64 oracle rel errs (3 sampled lanes, "
            f"{time.perf_counter() - t0:.0f}s): "
            f"{[f'{x:.2e}' for x in errs]}")
    else:
        log(f"WARNING: oracle subprocess failed rc={res.returncode}: "
            f"{(res.stderr or '')[-400:]}")

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
            "oracle_rel_err_max": max(errs) if errs else None,
            "simp": {"Emin": 1e-9, "p": 3.0},
            "tolerance": tol,
            "seconds": round(dt, 3),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    if "--oracle" in sys.argv:
        i = sys.argv.index("--oracle")
        lanes = [tuple(int(x) for x in s.split(":"))
                 for s in sys.argv[i + 1].split(",")]
        a = [int(v) for v in sys.argv[1:i]]
        oracle_main(a[0], a[1], a[2], a[3], a[4], lanes)
    else:
        main()
