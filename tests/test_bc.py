"""Surface extraction + node selection + Dirichlet mask tests
(reference semantics: SelectNodesForBC.jl, FiniteElementAnalysis.jl:314-374).
"""

import numpy as np

from topopteval_tpu.fem.bc import (DirichletBC, free_mask_from_bcs,
                                   nodes_at_plane, select_nodes_by_circle,
                                   select_nodes_by_plane)
from topopteval_tpu.io import read_vtu_mesh
from topopteval_tpu.models.beams import generate_grid_hex, generate_grid_tet


def test_surface_node_count_hex_box():
    nx, ny, nz = 4, 3, 2
    mesh = generate_grid_hex(nx, ny, nz)
    surf = mesh.surface()
    total = (nx + 1) * (ny + 1) * (nz + 1)
    interior = (nx - 1) * (ny - 1) * (nz - 1)
    assert surf.surface_nodes.size == total - interior
    # face count: 2*(nx*ny + ny*nz + nx*nz) quads
    assert surf.face_conn.shape[0] == 2 * (nx * ny + ny * nz + nx * nz)


def test_surface_face_count_tet_box():
    nx, ny, nz = 3, 2, 2
    mesh = generate_grid_tet(nx, ny, nz)
    surf = mesh.surface()
    # each boundary quad of the box splits into 2 triangles
    assert surf.face_conn.shape[0] == 4 * (nx * ny + ny * nz + nx * nz)
    total = (nx + 1) * (ny + 1) * (nz + 1)
    interior = (nx - 1) * (ny - 1) * (nz - 1)
    assert surf.surface_nodes.size == total - interior


def test_plane_selection_matches_bruteforce(beam_tet_path):
    mesh = read_vtu_mesh(beam_tet_path)
    sel = select_nodes_by_plane(mesh, [0.0, 0.0, 0.0], [1.0, 0.0, 0.0],
                                tolerance=1e-6)
    brute = nodes_at_plane(mesh, 0, 0.0)
    np.testing.assert_array_equal(np.sort(sel), np.sort(brute))
    # plane nodes of a solid mesh are all surface nodes
    sel60 = select_nodes_by_plane(mesh, [60.0, 0.0, 0.0], [1.0, 0.0, 0.0],
                                  tolerance=1e-6)
    np.testing.assert_array_equal(np.sort(sel60),
                                  np.sort(nodes_at_plane(mesh, 0, 60.0)))


def test_plane_selection_default_tolerance_is_one():
    mesh = generate_grid_hex(10, 2, 2, (0, 0, 0), (10, 1, 1))
    # default tol=1.0 catches nodes within distance 1 of the plane
    sel = select_nodes_by_plane(mesh, [0.0, 0.0, 0.0], [1.0, 0.0, 0.0])
    xs = mesh.coords[sel][:, 0]
    assert xs.max() < 1.0
    assert (mesh.coords[np.setdiff1d(mesh.surface().surface_nodes, sel)][:, 0]
            >= 1.0).all()


def test_circle_selection():
    mesh = generate_grid_hex(8, 8, 2, (0, 0, 0), (2, 2, 0.5))
    center, normal, radius, tol = [1.0, 1.0, 0.5], [0, 0, 1.0], 0.5, 1e-6
    sel = select_nodes_by_circle(mesh, center, normal, radius, tol)
    # brute force: top-plane nodes within in-plane radius
    c = mesh.coords
    on_top = np.abs(c[:, 2] - 0.5) < tol
    inr = np.linalg.norm(c[:, :2] - [1.0, 1.0], axis=1) <= radius + tol
    np.testing.assert_array_equal(np.sort(sel),
                                  np.flatnonzero(on_top & inr))


def test_fixed_and_sliding_masks():
    mesh = generate_grid_hex(2, 2, 2)
    nodes = np.array([0, 5])
    fixed = DirichletBC.fixed(nodes)
    np.testing.assert_array_equal(fixed.fixed_dofs,
                                  [0, 1, 2, 15, 16, 17])
    slide = DirichletBC.sliding(nodes, [2])
    np.testing.assert_array_equal(slide.fixed_dofs, [2, 17])
    mask = free_mask_from_bcs(mesh.n_dofs, [slide])
    assert mask[2] == 0 and mask[17] == 0
    assert mask.sum() == mesh.n_dofs - 2
    # padded dofs are fixed
    mask_p = free_mask_from_bcs(mesh.n_dofs, [slide],
                                pad_to=mesh.n_dofs + 6)
    assert mask_p[mesh.n_dofs:].sum() == 0


def test_surface_cache_reuse_and_clear(beam_tet_path):
    mesh = read_vtu_mesh(beam_tet_path)
    s1 = mesh.surface()
    assert mesh.surface() is s1           # cached
    mesh.clear_surface_cache()
    s2 = mesh.surface()
    assert s2 is not s1
    np.testing.assert_array_equal(s1.surface_nodes, s2.surface_nodes)
