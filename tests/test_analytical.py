"""Analytical validation (reference: test/VolumeForces/testVolumeForces.jl —
never wired into the reference's runtests.jl; wired into CI here per
SURVEY.md §4):

- cantilever under self-weight vs Euler-Bernoulli delta = rho g L^4/(8 E I)
- cube under gravity: stress scale sigma_z = rho g h, displacement bounds
- gravity in 4 directions → nonzero energy/displacement each
"""

import numpy as np
import pytest

from topopteval_tpu.api import (apply_fixed_boundary,
                                assemble_stiffness_matrix, setup_problem,
                                solve_system)
from topopteval_tpu.config import SolverConfig
from topopteval_tpu.fem.bc import select_nodes_by_plane
from topopteval_tpu.fem.loads import apply_gravity
from topopteval_tpu.materials import create_material_model
from topopteval_tpu.models.beams import generate_grid_hex

DIRECT = SolverConfig(method="direct", verbose=False)


def test_cantilever_gravity_euler_bernoulli():
    """reference: testVolumeForces.jl:6-60, assert <10% at :168."""
    L, w, h = 10.0, 1.0, 1.0
    mesh = generate_grid_hex(40, 8, 8, (0, 0, 0), (L, w, h))
    E, nu, rho, g = 200e9, 0.3, 7850.0, 9.81

    lam, mu = create_material_model(E, nu)
    problem = setup_problem(mesh)
    assemble_stiffness_matrix(problem, lam, mu)
    # NOTE: the reference's default selection tolerance of 1.0 would clamp
    # four node layers (x <= 0.75) here, shortening the beam and making its
    # own (unwired) manual test fail the 10% bar by construction — we select
    # the actual clamped plane instead (known reference quirk, SURVEY.md §4).
    fixed = select_nodes_by_plane(mesh, [0.0, 0, 0], [1.0, 0, 0], 1e-9)
    apply_fixed_boundary(problem, fixed)
    apply_gravity(problem, rho, g, [0.0, 0.0, -1.0])
    result = solve_system(problem, DIRECT)

    I = w * h ** 3 / 12
    analytical = rho * g * L ** 4 / (8 * E * I)
    numerical = np.max(np.abs(result.u.reshape(-1, 3)[:, 2]))
    rel_err = abs(numerical - analytical) / analytical * 100
    assert numerical > 0.0
    assert rel_err < 5.0, f"relative error {rel_err:.2f}% >= 5%"


def test_cube_gravity_stress_scale():
    """reference: testVolumeForces.jl:65-102, bounds at :172-178."""
    mesh = generate_grid_hex(8, 8, 8)
    E, nu, rho, g = 200e9, 0.3, 7850.0, 9.81
    lam, mu = create_material_model(E, nu)
    problem = setup_problem(mesh)
    assemble_stiffness_matrix(problem, lam, mu)
    fixed = select_nodes_by_plane(mesh, [0.0, 0, 0], [0.0, 0, 1.0], 1e-9)
    apply_fixed_boundary(problem, fixed)
    apply_gravity(problem, rho)
    result = solve_system(problem, DIRECT)

    max_disp = np.max(np.abs(result.u))
    assert 0.0 < max_disp < 1e-3           # reference's sanity bounds
    # quantitative upgrade: bottom-layer sigma_zz ≈ -rho g h
    analytical = rho * 9.81 * 1.0
    bottom_cells = np.flatnonzero(
        mesh.coords[mesh.conn].mean(axis=1)[:, 2] < 1.0 / 8)
    szz = result.stress_avg[bottom_cells, 2, 2]
    assert abs(np.median(szz) + analytical) / analytical < 0.15


@pytest.mark.parametrize("direction,fix_axis", [
    ([0.0, 0.0, -1.0], 2),
    ([1.0, 0.0, 0.0], 0),
    ([0.0, 1.0, 0.0], 1),
    ([1.0 / np.sqrt(2), 1.0 / np.sqrt(2), 0.0], 0),
])
def test_gravity_directions(direction, fix_axis):
    """reference: testVolumeForces.jl:107-157, 181-191."""
    mesh = generate_grid_hex(6, 6, 6)
    lam, mu = create_material_model(200e9, 0.3)
    problem = setup_problem(mesh)
    assemble_stiffness_matrix(problem, lam, mu)
    normal = [0.0, 0.0, 0.0]
    normal[fix_axis] = 1.0
    fixed = select_nodes_by_plane(mesh, [0.0, 0, 0], normal, 1e-9)
    apply_fixed_boundary(problem, fixed)
    apply_gravity(problem, 7850.0, 9.81, direction)
    result = solve_system(problem, DIRECT)
    assert result.energy > 0.0
    assert np.max(np.abs(result.u)) > 0.0
