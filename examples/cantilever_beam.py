"""Linear cantilever beam workflow (the reference's first integration case,
reference: test/runtests.jl:21-49).

Run: python examples/cantilever_beam.py [mesh.vtu]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import topopteval_tpu as tt


def main():
    mesh_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "data",
        "beam_linear_volume_mesh.vtu")

    mesh = tt.import_mesh(mesh_path)
    volume = tt.calculate_volume(mesh)
    tt.print_info(f"Mesh volume: {volume:.3f}")

    lam, mu = tt.create_material_model(1.0, 0.3)
    problem = tt.setup_problem(mesh)
    tt.assemble_stiffness_matrix(problem, lam, mu)

    fixed = tt.nodes_at_plane(mesh, 0, 0.0)
    loaded = tt.nodes_at_plane(mesh, 0, 60.0)
    tt.apply_fixed_boundary(problem, fixed)
    tt.apply_force(problem, loaded, [0.0, 0.0, -1.0])

    result = tt.solve_system(problem)
    tt.print_success(f"Energy: {result.energy:.6f} J; max von Mises "
                     f"{result.max_von_mises:.4f} at cell "
                     f"{result.max_stress_cell} "
                     f"({result.iterations} CG iters, "
                     f"{result.solve_time:.2f}s)")

    tt.export_results(result, problem, "cantilever_beam-linear")
    tt.export_boundary_conditions(mesh, fixed, loaded,
                                  "cantilever_beam-linear_bc")


if __name__ == "__main__":
    main()
