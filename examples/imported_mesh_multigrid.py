"""Imported-mesh multigrid workflow: the reference's core use case —
any VTU/GMSH mesh through one solve entry (reference:
FiniteElementAnalysis.jl:547) — on the TPU-native fast path.

Loads the bundled topology-optimized beam fixture, selects BCs/loads
geometrically, and solves with SolverConfig(preconditioner="multigrid"):
solve_system builds a voxel-embedded Galerkin V-cycle for the imported
mesh (fem/multigrid.build_unstructured_multigrid) and runs
mesh-independent-iteration PCG.  On one TPU chip the same configuration
solves a 1.23M-tet import in ~4.6 s (tools/bench_unstructured.py).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import topopteval_tpu as tt

DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data")


def main():
    mesh = tt.import_mesh(os.path.join(DATA,
                                       "beam_linear_volume_mesh.vtu"))
    tt.calculate_volume(mesh)

    lam, mu = tt.create_material_model(1.0, 0.3)
    problem = tt.setup_problem(mesh)
    tt.assemble_stiffness_matrix(problem, lam, mu)

    fixed = tt.select_nodes_by_plane(mesh, [0, 0, 0], [1, 0, 0], 1e-6)
    loaded = tt.select_nodes_by_plane(mesh, [60, 0, 0], [1, 0, 0], 1e-6)
    tt.apply_fixed_boundary(problem, fixed)
    tt.apply_force(problem, loaded, [0.0, 0.0, -1.0])

    # reference-parity answer for a mesh this small: the direct solve
    direct = tt.solve_system(problem, tt.SolverConfig(method="direct",
                                                      verbose=False))
    tt.print_data(f"direct           : energy {direct.energy:.9e}, "
                  f"max von Mises {direct.max_von_mises:.4f}")

    # the large-mesh fast path, exercised on the same import: a
    # voxel-embedded Galerkin multigrid V-cycle (this porous fixture is
    # the HARD case — optimized ~40%-volume-fraction geometry)
    config = tt.SolverConfig(method="cg", preconditioner="multigrid",
                             tolerance=1e-8, max_iterations=500,
                             verbose=False)
    result = tt.solve_system(problem, config)
    rel = abs(result.energy - direct.energy) / abs(direct.energy)
    tt.print_data(f"multigrid PCG    : {result.iterations} iterations "
                  f"(converged={result.converged}), rel energy err "
                  f"{rel:.2e}")
    assert result.converged
    # fp64 runs agree to <=1e-9; fp32 device compute bottoms out near
    # ~0.5% on THIS ill-conditioned porous problem (fp32 attainable
    # accuracy, docs/PERF_NOTES.md) — on solid geometry at 1.23M tets the
    # same fp32 path matches the fp64 oracle to 1e-8
    # (tools/bench_unstructured.py)
    assert rel < 2e-2


if __name__ == "__main__":
    main()
