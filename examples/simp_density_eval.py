"""SIMP density-field evaluation (the reference's second integration case,
reference: test/runtests.jl:51-89) plus a vmapped design sweep.

Run: python examples/simp_density_eval.py [mesh.vtu]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import topopteval_tpu as tt


def main():
    mesh_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "data", "beam_vfrac_04_Raw.vtu")

    mesh = tt.import_mesh(mesh_path)
    density = tt.extract_cell_density(mesh_path)
    tt.print_info(f"Weighted volume: "
                  f"{tt.calculate_volume(mesh, density):.3f}")

    material = tt.create_simp_material_model(1.0, 0.3, Emin=1e-8, p=3.0)
    problem = tt.setup_problem(mesh)
    tt.assemble_stiffness_matrix_simp(problem, material, density)
    tt.apply_fixed_boundary(problem, tt.nodes_at_plane(mesh, 0, 0.0))
    tt.apply_force(problem, tt.nodes_at_plane(mesh, 0, 60.0),
                   [0.0, 0.0, -1.0])

    result = tt.solve_system_simp(problem)
    tt.print_success(f"Energy: {result.energy:.6f} J; max von Mises "
                     f"{result.max_von_mises:.4f}")
    tt.export_results(result, problem, "cantilever_beam-raw")

    # design sweep: threshold the field at several cutoffs and compare
    from topopteval_tpu.api import evaluate_design_batch
    cutoffs = np.linspace(0.1, 0.7, 4)
    batch = np.stack([np.where(density > c, density, 0.0)
                      for c in cutoffs])
    energies, iters, conv = evaluate_design_batch(problem, batch, tol=1e-8,
                                                  maxiter=20000)
    for c, e in zip(cutoffs, energies[:, 0]):
        tt.print_data(f"  void cutoff {c:.2f}: compliance {e:.4f}")


if __name__ == "__main__":
    main()
