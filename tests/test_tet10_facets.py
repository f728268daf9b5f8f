"""tet10 surface loads: consistent quadratic (tri6) facet quadrature —
round-1 VERDICT weak #5 (loads were silently lowered to flat 3-node
faces, loading corner DOFs only)."""

import jax.numpy as jnp
import numpy as np

from topopteval_tpu.api import (apply_fixed_boundary,
                                assemble_stiffness_matrix, setup_problem,
                                solve_system)
from topopteval_tpu.config import SolverConfig
from topopteval_tpu.fem.bc import nodes_at_plane, select_nodes_by_plane
from topopteval_tpu.fem.loads import (apply_uniform_surface_traction,
                                      compute_boundary_area,
                                      get_boundary_facets)
from topopteval_tpu.materials import lame_parameters
from topopteval_tpu.models.beams import generate_grid_tet

LAM, MU = lame_parameters(1.0, 0.3)


def _tet10_problem():
    mesh4 = generate_grid_tet(4, 2, 2, (0, 0, 0), (4.0, 2.0, 2.0))
    problem = setup_problem(mesh4, interpolation_order=2)
    return mesh4, problem


def test_surface_selection_includes_midedge_nodes():
    mesh4, problem = _tet10_problem()
    mesh10 = problem.mesh
    sel = select_nodes_by_plane(mesh10, (4.0, 0, 0), (1, 0, 0),
                                tolerance=1e-6)
    n_corner = int((np.abs(mesh4.coords[:, 0] - 4.0) < 1e-9).sum())
    assert sel.size > n_corner          # mid-edge nodes selected too
    # every selected node really lies on the plane
    assert np.all(np.abs(mesh10.coords[sel, 0] - 4.0) < 1e-9)


def test_tet10_traction_consistent_load_vector():
    """Constant traction on straight tri6 faces: the consistent load
    vector puts (exactly) zero on corners and A*t/3 per mid-edge node —
    the classic quadratic-triangle pattern; a linear lowering would load
    corners only."""
    mesh4, problem = _tet10_problem()
    mesh10 = problem.mesh
    sel = select_nodes_by_plane(mesh10, (4.0, 0, 0), (1, 0, 0),
                                tolerance=1e-6)
    facets = get_boundary_facets(mesh10, sel)
    area = compute_boundary_area(mesh10, facets)
    assert abs(area - 4.0) < 1e-10
    apply_uniform_surface_traction(problem, facets, [0.0, 0.0, -1.0])
    tot = problem.f.reshape(-1, 3).sum(axis=0)
    np.testing.assert_allclose(tot, [0, 0, -1.0], atol=1e-12)
    fz = problem.f.reshape(-1, 3)[:, 2]
    corners = sel[sel < mesh4.n_nodes]
    mids = sel[sel >= mesh4.n_nodes]
    assert abs(fz[corners].sum()) < 1e-10 * abs(fz[mids].sum())


def test_tet10_traction_solve_matches_direct():
    mesh4, problem = _tet10_problem()
    mesh10 = problem.mesh
    sel = select_nodes_by_plane(mesh10, (4.0, 0, 0), (1, 0, 0),
                                tolerance=1e-6)
    facets = get_boundary_facets(mesh10, sel)
    apply_uniform_surface_traction(problem, facets, [0.0, 0.0, -1.0])
    assemble_stiffness_matrix(problem, LAM, MU)
    apply_fixed_boundary(problem, nodes_at_plane(mesh10, 0, 0.0))
    r_it = solve_system(problem, SolverConfig(
        method="cg", preconditioner="block_diagonal", tolerance=1e-12,
        max_iterations=10000, verbose=False))
    r_d = solve_system(problem, SolverConfig(method="direct",
                                             verbose=False))
    assert abs(r_it.energy - r_d.energy) / r_d.energy < 1e-9
