"""Load application tests: nodal forces, volume forces, surface traction
(reference semantics: FiniteElementAnalysis.jl:392-418, VolumeForce.jl,
SurfaceTraction.jl)."""

import numpy as np
import pytest

from topopteval_tpu.api import (apply_force, assemble_stiffness_matrix,
                                setup_problem)
from topopteval_tpu.fem.loads import (apply_gravity,
                                      apply_surface_traction,
                                      apply_uniform_surface_traction,
                                      apply_variable_density_volume_force,
                                      apply_volume_force,
                                      compute_boundary_area,
                                      get_boundary_facets)
from topopteval_tpu.fem.bc import nodes_at_plane
from topopteval_tpu.io import read_vtu_mesh
from topopteval_tpu.models.beams import generate_grid_hex, generate_grid_tet


def _problem(mesh):
    return setup_problem(mesh)


def test_nodal_force_equal_split():
    mesh = generate_grid_hex(2, 2, 2)
    p = _problem(mesh)
    nodes = np.array([1, 4, 9, 11])
    apply_force(p, nodes, [4.0, -8.0, 2.0])
    f = p.f.reshape(-1, 3)
    np.testing.assert_allclose(f.sum(axis=0), [4.0, -8.0, 2.0])
    np.testing.assert_allclose(f[1], [1.0, -2.0, 0.5])
    assert np.count_nonzero(f.sum(axis=1)) == 4


def test_nodal_force_empty_raises():
    p = _problem(generate_grid_hex(1, 1, 1))
    with pytest.raises(ValueError, match="No nodes"):
        apply_force(p, [], [1.0, 0, 0])


@pytest.mark.parametrize("gen", [generate_grid_hex, generate_grid_tet])
def test_volume_force_total(gen):
    mesh = gen(3, 2, 2, (0, 0, 0), (3.0, 2.0, 1.0))
    p = _problem(mesh)
    b = np.array([0.5, -1.0, 2.0])
    apply_volume_force(p, b)
    V = 3.0 * 2.0 * 1.0
    np.testing.assert_allclose(p.f.reshape(-1, 3).sum(axis=0), b * V,
                               rtol=1e-12)


def test_gravity_total_force():
    mesh = generate_grid_hex(4, 4, 4)   # unit cube
    p = _problem(mesh)
    rho, g = 7850.0, 9.81
    apply_gravity(p, rho, g, [0.0, 0.0, -1.0])
    np.testing.assert_allclose(p.f.reshape(-1, 3).sum(axis=0),
                               [0.0, 0.0, -rho * g], rtol=1e-12, atol=1e-9)


def test_variable_density_volume_force_skips_void():
    mesh = generate_grid_hex(4, 1, 1, (0, 0, 0), (4.0, 1, 1))
    p = _problem(mesh)
    rho = np.array([1.0, 0.5, 1e-8, 0.0])   # last two below 1e-6 → skipped
    apply_variable_density_volume_force(p, [0, 0, -10.0], rho)
    total = p.f.reshape(-1, 3).sum(axis=0)
    np.testing.assert_allclose(total, [0, 0, -10.0 * (1.0 + 0.5)],
                               rtol=1e-12)
    # nodes exclusively supporting void cells receive nothing
    x = mesh.coords[:, 0]
    void_only = np.flatnonzero(x >= 3.0 - 1e-12)
    assert np.all(p.f.reshape(-1, 3)[void_only] == 0.0)


def test_boundary_facets_and_area_beam_end(beam_tet_path):
    """The fixture is a topology-OPTIMIZED beam: its x=60 cross-section is
    a partial region of the 20x4 bbox face.  Cross-check facet selection +
    area against an independent brute-force over surface triangles."""
    mesh = read_vtu_mesh(beam_tet_path)
    end_nodes = nodes_at_plane(mesh, 0, 60.0)
    facets = get_boundary_facets(mesh, end_nodes)
    assert len(facets) > 0
    area = compute_boundary_area(mesh, facets)
    # independent oracle: surface faces whose nodes all sit at x=60
    from topopteval_tpu.ops.facets import facet_areas
    surf = mesh.surface()
    fc = mesh.coords[surf.face_conn]
    on_end = np.all(np.abs(fc[:, :, 0] - 60.0) < 1e-6, axis=1)
    assert on_end.sum() == len(facets)
    np.testing.assert_allclose(area, facet_areas(fc[on_end]).sum(),
                               rtol=1e-12)
    assert 0 < area < 20.0 * 4.0


def test_boundary_facets_hex_box():
    mesh = generate_grid_hex(3, 2, 2, (0, 0, 0), (3, 2, 2))
    top = nodes_at_plane(mesh, 2, 2.0)
    facets = get_boundary_facets(mesh, top)
    assert len(facets) == 3 * 2
    np.testing.assert_allclose(compute_boundary_area(mesh, facets), 6.0,
                               rtol=1e-12)


def test_uniform_surface_traction_totals(beam_tet_path):
    mesh = read_vtu_mesh(beam_tet_path)
    p = _problem(mesh)
    facets = get_boundary_facets(mesh, nodes_at_plane(mesh, 0, 60.0))
    F = [0.0, 0.0, -1.0]
    apply_uniform_surface_traction(p, facets, F)
    np.testing.assert_allclose(p.f.reshape(-1, 3).sum(axis=0), F,
                               rtol=1e-9, atol=1e-12)
    # load lands only on the end-plane nodes
    loaded = np.flatnonzero(np.abs(p.f.reshape(-1, 3)).sum(axis=1) > 0)
    np.testing.assert_array_equal(
        np.sort(loaded), np.sort(nodes_at_plane(mesh, 0, 60.0)))


def test_position_dependent_traction():
    mesh = generate_grid_hex(2, 2, 1, (0, 0, 0), (2, 2, 1))
    p = _problem(mesh)
    facets = get_boundary_facets(mesh, nodes_at_plane(mesh, 2, 1.0))
    # traction t = [0, 0, -x]: total Fz = -∫∫ x dA over [0,2]x[0,2] = -4
    apply_surface_traction(p, facets, lambda x, y, z: [0.0 * x, 0.0 * x, -x])
    np.testing.assert_allclose(p.f.reshape(-1, 3).sum(axis=0),
                               [0, 0, -4.0], rtol=1e-12, atol=1e-12)


def test_zero_area_guard():
    mesh = generate_grid_hex(2, 2, 2)
    p = _problem(mesh)
    with pytest.raises(ValueError, match="zero"):
        apply_uniform_surface_traction(p, np.zeros((0, 2), dtype=int),
                                       [1.0, 0, 0])
