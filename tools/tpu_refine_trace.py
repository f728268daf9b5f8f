"""One verbose scale-16 imported solve to expose the refinement pass
structure (pass count x inner iters) driving the e2e time.

Usage: python tools/tpu_refine_trace.py [scale] [tol]
"""

import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from topopteval_tpu.api import (apply_fixed_boundary, apply_force,
                                    assemble_stiffness_matrix, import_mesh,
                                    setup_problem, solve_system)
    from topopteval_tpu.config import SolverConfig
    from topopteval_tpu.fem.bc import nodes_at_plane
    from topopteval_tpu.io.results import write_vtu
    from topopteval_tpu.materials import lame_parameters
    from topopteval_tpu.models.beams import generate_grid_tet
    from topopteval_tpu.utils import set_verbosity

    set_verbosity(True)
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    tol = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-6
    nx, ny, nz = 25 * scale // 2, 4 * scale, scale
    lam, mu = lame_parameters(1.0, 0.3)
    gen = generate_grid_tet(nx, ny, nz, (0.0, 0.0, 0.0),
                            (60.0, 20.0, 4.0))
    path = os.path.join(tempfile.gettempdir(), f"unstructured_{scale}.vtu")
    if not os.path.exists(path):
        write_vtu(path, gen)
    mesh = import_mesh(path)
    del gen
    problem = setup_problem(mesh, dtype=jnp.float32)
    assemble_stiffness_matrix(problem, lam, mu)
    apply_fixed_boundary(problem, nodes_at_plane(mesh, 0, 0.0))
    apply_force(problem, nodes_at_plane(mesh, 0, 60.0), [0, 0, -1.0])
    cfg = SolverConfig(method="cg", preconditioner="multigrid",
                       tolerance=tol, max_iterations=400,
                       chunk_iterations=50, verbose=True)
    r = solve_system(problem, cfg)           # warmup (compile)
    print("--- timed solve ---", flush=True)
    t0 = time.perf_counter()
    r = solve_system(problem, cfg)
    print(f"solve {time.perf_counter() - t0:.3f}s wall, "
          f"{r.solve_time:.3f}s reported, iters={r.iterations}, "
          f"conv={r.converged}, rnorm={r.residual_norm:.3e}", flush=True)


if __name__ == "__main__":
    main()
