"""On-chip A/B: structured stencil matvec formulations (round-4).

Modes (argv[1]): ``conv`` (two tiny-channel 3D convolutions → implicit
GEMM on the MXU) vs ``slices`` (per-tet-type elementwise grids on the
VPU — the round-1..3 formulation, measured 4.29 ms/matvec at 1.23M tets
= the entire headline solve).  A cell-batched ``mxu`` matmul formulation
was rejected (550 ms + miscompile, see structured.py).  Times the raw
fine matvec and the full public-API MG-PCG solve.

    python tools/tpu_stencil_probe.py {conv|slices} [scale]

Run each mode in its own process (the formulation switch TOPOPT_STENCIL
is read at trace time; separate processes keep the jit caches and the
remote-compile shapes clean).
"""

import functools
import json
import os
import sys
import time

import numpy as np

mode = sys.argv[1] if len(sys.argv) > 1 else "mxu"
scale = int(sys.argv[2]) if len(sys.argv) > 2 else 16
os.environ["TOPOPT_STENCIL"] = mode
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from topopteval_tpu.api import (_get_multigrid, apply_fixed_boundary,
                                    apply_force, assemble_stiffness_matrix,
                                    setup_problem, solve_system)
    from topopteval_tpu.config import SolverConfig
    from topopteval_tpu.fem.bc import nodes_at_plane
    from topopteval_tpu.materials import lame_parameters
    from topopteval_tpu.models.beams import generate_grid_tet
    from topopteval_tpu.utils import set_verbosity

    set_verbosity(False)
    dtype = jnp.float32
    nx, ny, nz = 25 * scale // 2, 4 * scale, scale
    lam, mu = lame_parameters(1.0, 0.3)
    mesh = generate_grid_tet(nx, ny, nz, (0.0, 0.0, 0.0),
                             (60.0, 20.0, 4.0))
    problem = setup_problem(mesh, dtype=dtype)
    assemble_stiffness_matrix(problem, lam, mu)
    apply_fixed_boundary(problem, nodes_at_plane(mesh, 0, 0.0))
    apply_force(problem, nodes_at_plane(mesh, 0, 60.0), [0.0, 0.0, -1.0])
    op, _ = _get_multigrid(problem)
    log(f"[{mode}] mesh {mesh.n_cells} tets, {mesh.n_dofs} dofs, "
        f"operator {type(op).__name__}")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(mesh.n_dofs), dtype)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def _chain(y, reps):
        for _ in range(reps):
            y = op.matvec(y) * (1.0 / jnp.float32(1000.0))
        return y

    reps = 20
    # warm EVERY program in the timed region, including the tiny r[0]
    # slice + D2H: its first use costs 0.8-11 s on axon (remote compile
    # + tunnel), which poisoned earlier "matvec" numbers by 100x+
    r = _chain(x, reps)
    r.block_until_ready()
    _ = float(r[0])
    t0 = time.perf_counter()
    r = _chain(x, reps)
    r.block_until_ready()
    _ = float(r[0])
    mv_ms = (time.perf_counter() - t0) / reps * 1e3
    bytes_moved = 4 * (2 * 3 * mesh.n_nodes + mesh.n_cells // 6)
    gbps = bytes_moved / (mv_ms * 1e-3) / 1e9
    log(f"[{mode}] fine matvec: {mv_ms:.3f} ms, {gbps:.0f} GB/s min-model "
        f"({gbps / 819.0 * 100:.1f}% of v5e HBM peak)")

    cfg = SolverConfig(method="cg", preconditioner="multigrid",
                       tolerance=1e-6, max_iterations=400,
                       chunk_iterations=50, verbose=False)
    res = solve_system(problem, cfg)
    res = solve_system(problem, cfg)
    log(f"[{mode}] e2e solve: {res.solve_time:.3f}s, {res.iterations} "
        f"iters, converged={res.converged}, energy={res.energy:.6e}")
    print(json.dumps({"mode": mode, "scale": scale,
                      "matvec_ms": round(mv_ms, 3),
                      "matvec_gbps": round(gbps, 1),
                      "solve_s": round(res.solve_time, 4),
                      "iters": res.iterations,
                      "energy": res.energy,
                      "converged": bool(res.converged)}))


if __name__ == "__main__":
    main()
