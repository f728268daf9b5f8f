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

    from topopteval_tpu.fem.bc import free_mask_from_bcs
    from topopteval_tpu.fem.operator import assemble_scipy
    from topopteval_tpu.fem.solvers import direct_solve
    from topopteval_tpu.utils import set_verbosity

    set_verbosity(False)
    mesh, problem, material, densities, loads = build_case(nx, ny, nz,
                                                           B, L)
    mask = free_mask_from_bcs(problem.n_dofs, problem.bcs)
    out = {}
    for b, j in lanes:
        # end-to-end fp64: assemble in float64 and read the energy as
        # 0.5 * u64 . f64 straight from the direct solution — going
        # through solve_system would report energy via the problem's
        # fp32 device operator (~1e-6 noise floor, ADVICE r4)
        lam_b, mu_b = material.lame(np.asarray(densities[b], np.float64))
        K = assemble_scipy(mesh, np.asarray(lam_b, np.float64),
                           np.asarray(mu_b, np.float64),
                           order=problem.quad_order, free_mask=mask)
        f64 = np.asarray(loads[j], np.float64) * mask
        u64 = direct_solve(K, f64)
        out[f"{b},{j}"] = 0.5 * float(u64 @ f64)
    print("ORACLE " + json.dumps(out))


def run_sweep(nx=16, ny=8, nz=4, B=64, L=4, tol=1e-6, maxiter=20000,
              oracle_budget_s=3600) -> dict:
    """Timed design sweep + sampled-lane fp64 oracle; returns the
    result fields (also consumed by bench.py's design-sweep leg)."""
    from topopteval_tpu.api import evaluate_design_batch
    from topopteval_tpu.utils import set_verbosity

    set_verbosity(False)
    mesh, problem, material, densities, loads = build_case(nx, ny, nz,
                                                           B, L)
    log(f"mesh {mesh.n_cells} tets / {mesh.n_dofs} dofs; {B}x{L} lanes "
        f"(SIMP Emin=1e-9 p=3, tol={tol})")
    # heartbeat: the warmup compile + chunked lane runs are silent for
    # minutes on chip (remote compile + long CG dispatches), which trips
    # log-growth watchdogs (run_tpu.sh killed a healthy run at 300 s)
    import threading
    hb_stop = threading.Event()
    t_hb = time.perf_counter()

    def _heartbeat():
        while not hb_stop.wait(120):
            log(f"sweep heartbeat: {time.perf_counter() - t_hb:.0f}s "
                f"elapsed (compile or lane chunks in flight)")

    hb = threading.Thread(target=_heartbeat, daemon=True)
    hb.start()
    try:
        # warmup (compile)
        e, it, conv = evaluate_design_batch(problem, densities, loads,
                                            material=material, tol=tol,
                                            maxiter=maxiter)
        log(f"sweep warmup done in {time.perf_counter() - t_hb:.1f}s")
        t0 = time.perf_counter()
        e, it, conv = evaluate_design_batch(problem, densities, loads,
                                            material=material, tol=tol,
                                            maxiter=maxiter)
        dt = time.perf_counter() - t0
    finally:
        hb_stop.set()
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
    errs = []
    try:
        res = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=oracle_budget_s)
        if res.returncode == 0:
            for line in reversed(res.stdout.strip().splitlines()):
                if line.startswith("ORACLE "):
                    table = json.loads(line[len("ORACLE "):])
                    for b, j in sampled:
                        ref = table[f"{b},{j}"]
                        errs.append(abs(float(e[b, j]) - ref) / abs(ref))
                    break
        else:
            log(f"WARNING: oracle subprocess failed "
                f"rc={res.returncode}: {(res.stderr or '')[-400:]}")
    except subprocess.TimeoutExpired:
        # the sweep throughput must survive an oracle overrun (ADVICE
        # r4): fall through to the errs-empty warning path
        log(f"WARNING: fp64 oracle subprocess exceeded "
            f"{oracle_budget_s}s; reporting throughput without it")
    if errs:
        log(f"fp64 oracle rel errs (3 sampled lanes, "
            f"{time.perf_counter() - t0:.0f}s): "
            f"{[f'{x:.2e}' for x in errs]}")
    return {"lanes_per_s": round(lanes / dt, 3),
            "B": B, "L": L, "n_tets": mesh.n_cells,
            "n_dofs": mesh.n_dofs,
            "converged_lanes": int(conv.sum()),
            "total_lanes": lanes,
            "iters_median": int(np.median(it)),
            "iters_max": int(it.max()),
            "oracle_rel_errs": errs or None,
            "tolerance": tol,
            "seconds": round(dt, 3)}


def main():
    import jax

    args = [int(a) for a in sys.argv[1:]]
    nx, ny, nz = (args[0], args[1], args[2]) if len(args) >= 3 \
        else (16, 8, 4)
    B = args[3] if len(args) >= 4 else 64
    L = args[4] if len(args) >= 5 else 4
    r = run_sweep(nx, ny, nz, B, L)
    errs = r.pop("oracle_rel_errs")
    print(json.dumps({
        "metric": "design_sweep_lanes_per_s",
        "value": r["lanes_per_s"],
        "unit": "lanes/s",
        "vs_baseline": None,
        "detail": {
            **r,
            "oracle_rel_err_max": max(errs) if errs else None,
            "simp": {"Emin": 1e-9, "p": 3.0},
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
