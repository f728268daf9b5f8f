"""Self-weight validation vs Euler-Bernoulli (the reference's manual
analytical test, reference: test/VolumeForces/testVolumeForces.jl:6-60).

Run: python examples/gravity_validation.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import topopteval_tpu as tt
from topopteval_tpu.models.beams import generate_grid_hex


def main():
    L, w, h = 10.0, 1.0, 1.0
    mesh = generate_grid_hex(40, 8, 8, (0, 0, 0), (L, w, h))
    E, nu, rho, g = 200e9, 0.3, 7850.0, 9.81

    problem = tt.setup_problem(mesh)
    tt.assemble_stiffness_matrix(problem, *tt.create_material_model(E, nu))
    fixed = tt.select_nodes_by_plane(mesh, [0, 0, 0], [1, 0, 0], 1e-9)
    tt.apply_fixed_boundary(problem, fixed)
    tt.apply_gravity(problem, rho, g, [0.0, 0.0, -1.0])

    result = tt.solve_system(problem)

    I = w * h ** 3 / 12
    analytical = rho * g * L ** 4 / (8 * E * I)
    numerical = np.max(np.abs(result.u.reshape(-1, 3)[:, 2]))
    err = abs(numerical - analytical) / analytical * 100

    tt.print_data("=" * 60)
    tt.print_data("CANTILEVER BEAM RESULTS COMPARISON")
    tt.print_data("=" * 60)
    tt.print_data(f"Analytical deflection: {analytical:.6e} m")
    tt.print_data(f"Numerical deflection:  {numerical:.6e} m")
    tt.print_data(f"Relative error:        {err:.2f} %")
    if err < 5.0:
        tt.print_success("Results match analytical solution (error < 5%)")
    else:
        tt.print_warning("error >= 5%, refine the mesh")


if __name__ == "__main__":
    main()
