"""Results export tests (reference: ResultsExport.jl + runtests.jl:47-48,
87-88 write displacement/stress VTU artifacts)."""

import numpy as np

from topopteval_tpu.api import (apply_fixed_boundary, apply_force,
                                assemble_stiffness_matrix, setup_problem,
                                solve_system)
from topopteval_tpu.config import SolverConfig
from topopteval_tpu.fem.bc import nodes_at_plane
from topopteval_tpu.io.results import (export_boundary_conditions,
                                       export_displacement, export_results,
                                       export_stress)
from topopteval_tpu.io.vtu import VTUFile, read_vtu_mesh
from topopteval_tpu.materials import create_material_model
from topopteval_tpu.models.beams import generate_grid_hex, generate_grid_tet


def _solved_problem():
    mesh = generate_grid_tet(6, 2, 2, (0, 0, 0), (6, 2, 2))
    problem = setup_problem(mesh)
    assemble_stiffness_matrix(problem, *create_material_model(1.0, 0.3))
    apply_fixed_boundary(problem, nodes_at_plane(mesh, 0, 0.0))
    apply_force(problem, nodes_at_plane(mesh, 0, 6.0), [0, 0, -1.0])
    return problem, solve_system(problem, SolverConfig(method="direct",
                                                       verbose=False))


def test_export_displacement_and_stress(tmp_path):
    problem, result = _solved_problem()
    mesh = problem.mesh

    up = export_displacement(result.u, mesh, str(tmp_path / "disp"))
    vtu = VTUFile(up)
    u = vtu.point_data()["u"]
    np.testing.assert_allclose(u, result.u.reshape(-1, 3))

    sp = export_stress(result.stress_qp, mesh, str(tmp_path / "stress"))
    cd = VTUFile(sp).cell_data()
    assert set(cd) == {"von_Mises_stress", "principal_stress_max",
                       "principal_stress_min"}
    np.testing.assert_allclose(cd["von_Mises_stress"], result.von_mises,
                               rtol=1e-12)
    assert (cd["principal_stress_max"] >= cd["principal_stress_min"]).all()
    # exported von Mises max matches the solve's tracked max
    np.testing.assert_allclose(cd["von_Mises_stress"].max(),
                               result.max_von_mises, rtol=1e-12)


def test_export_results_polymorphic(tmp_path):
    problem, result = _solved_problem()
    mesh = problem.mesh
    # displacement dispatch
    p1 = export_results(result.u, mesh, str(tmp_path / "a"))
    assert p1.endswith(".vtu")
    # stress dispatch
    p2 = export_results(result.stress_qp, problem, str(tmp_path / "b"))
    assert "von_Mises_stress" in VTUFile(p2).cell_data()
    # SolveResult dispatch writes both
    export_results(result, problem, str(tmp_path / "c"))
    assert (tmp_path / "c_u.vtu").exists()
    assert (tmp_path / "c_stress.vtu").exists()


def test_export_boundary_conditions(tmp_path):
    mesh = generate_grid_hex(4, 2, 2, (0, 0, 0), (4, 2, 2))
    fixed = nodes_at_plane(mesh, 0, 0.0)
    force = nodes_at_plane(mesh, 0, 4.0)
    path = export_boundary_conditions(mesh, fixed, force,
                                      str(tmp_path / "bc"))
    back = read_vtu_mesh(path)
    assert back.element_type == "quad4"
    bt = VTUFile(path).cell_data()["boundary_type"]
    # 2x2 quads on each end face
    assert (bt == 1).sum() == 4 and (bt == 2).sum() == 4
    # fixed faces sit at x=0, force faces at x=4
    for t, x in [(1, 0.0), (2, 4.0)]:
        fc = back.coords[back.conn[bt == t]]
        assert np.allclose(fc[:, :, 0], x)


def test_export_boundary_conditions_tet(tmp_path):
    mesh = generate_grid_tet(2, 2, 2)
    fixed = nodes_at_plane(mesh, 0, 0.0)
    force = nodes_at_plane(mesh, 0, 1.0)
    path = export_boundary_conditions(mesh, fixed, force,
                                      str(tmp_path / "bc_tet"))
    back = read_vtu_mesh(path)
    assert back.element_type == "tri3"
    assert back.n_cells > 0
