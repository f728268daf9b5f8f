"""Bisect WHERE the pallas stencil goes wrong inside solve_system.

matvec parity + plain while_loop CG pass on chip; the MG-PCG e2e gives
energy 522.45 vs 324.12.  Grid: {block_diagonal, multigrid} x scales,
both formulations, through the public solve_system.

    python tools/tpu_stencil_solve_bisect.py [scales...]
"""

import json
import os
import sys

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax.numpy as jnp

    from topopteval_tpu.api import (apply_fixed_boundary, apply_force,
                                    assemble_stiffness_matrix,
                                    setup_problem, solve_system)
    from topopteval_tpu.config import SolverConfig
    from topopteval_tpu.fem.bc import nodes_at_plane
    from topopteval_tpu.materials import lame_parameters
    from topopteval_tpu.models.beams import generate_grid_tet
    from topopteval_tpu.utils import set_verbosity

    set_verbosity(False)
    scales = [int(a) for a in sys.argv[1:]] or [4]
    lam, mu = lame_parameters(1.0, 0.3)
    out = {}
    for scale in scales:
        nx, ny, nz = 25 * scale // 2, 4 * scale, scale
        mesh = generate_grid_tet(nx, ny, nz, (0.0, 0.0, 0.0),
                                 (60.0, 20.0, 4.0))
        problem = setup_problem(mesh, dtype=jnp.float32)
        assemble_stiffness_matrix(problem, lam, mu)
        apply_fixed_boundary(problem, nodes_at_plane(mesh, 0, 0.0))
        apply_force(problem, nodes_at_plane(mesh, 0, 60.0),
                    [0.0, 0.0, -1.0])
        for precond, iters in [("multigrid", 100)]:
            for mode, min_dofs in [("slices", "0"),
                                   ("pallas", "0"),
                                   ("pallas-fine", None),
                                   ("pallas-coarse", None)]:
                if mode == "pallas-fine":
                    # pallas only on the finest level
                    os.environ["TOPOPT_STENCIL"] = "pallas"
                    os.environ["TOPOPT_STENCIL_MIN_DOFS"] = str(
                        mesh.n_dofs)
                elif mode == "pallas-coarse":
                    # cannot express "coarse only" with a min threshold;
                    # approximate: all levels EXCEPT the finest use
                    # slices is covered above, so use second-finest cut
                    os.environ["TOPOPT_STENCIL"] = "pallas"
                    os.environ["TOPOPT_STENCIL_MIN_DOFS"] = "0"
                    continue
                else:
                    os.environ["TOPOPT_STENCIL"] = mode
                    os.environ["TOPOPT_STENCIL_MIN_DOFS"] = min_dofs
                cfg = SolverConfig(method="cg", preconditioner=precond,
                                   tolerance=1e-6, max_iterations=iters,
                                   chunk_iterations=50, verbose=False)
                try:
                    r = solve_system(problem, cfg)
                    key = f"s{scale}_{precond}_{mode}"
                    # host fp64 verdict on the returned solution
                    from topopteval_tpu.fem.operator import assemble_scipy
                    from topopteval_tpu.fem.bc import free_mask_from_bcs
                    K = assemble_scipy(problem.mesh, problem.lam,
                                       problem.mu,
                                       order=1,
                                       free_mask=free_mask_from_bcs(
                                           problem.n_dofs, problem.bcs))
                    u64 = np.asarray(r.u, np.float64)
                    f64 = (np.asarray(problem.f, np.float64)
                           * free_mask_from_bcs(problem.n_dofs,
                                                problem.bcs))
                    e_uf = 0.5 * float(u64 @ f64)
                    res64 = float(np.linalg.norm(f64 - K @ u64)
                                  / max(np.linalg.norm(f64), 1e-30))
                    out[key] = {"energy": r.energy, "e_uf": e_uf,
                                "host_rel_res": res64,
                                "iters": r.iterations,
                                "conv": bool(r.converged)}
                    log(f"{key}: energy={r.energy:.6e} "
                        f"e_uf={e_uf:.6e} host_res={res64:.3e} "
                        f"iters={r.iterations} conv={r.converged}")
                except Exception as e:
                    log(f"s{scale}_{precond}_{mode}: "
                        f"{type(e).__name__}: {e}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
