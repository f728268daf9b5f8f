"""GMSH .msh reader tests (v2.2 and v4.1 ASCII; reference imports .msh via
FerriteGmsh, MeshImport.jl:24-28)."""

import numpy as np
import pytest

from topopteval_tpu.api import import_mesh
from topopteval_tpu.io.gmsh import read_msh_mesh

MSH_V2 = """$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
5
1 0 0 0
2 1 0 0
3 0 1 0
4 0 0 1
5 1 1 1
$EndNodes
$Elements
4
1 4 2 7 1 1 2 3 4
2 4 2 7 1 2 3 4 5
3 2 2 9 1 1 2 3
4 15 2 0 1 1
$EndElements
"""

MSH_V4 = """$MeshFormat
4.1 0 8
$EndMeshFormat
$Nodes
1 4 1 4
3 1 0 4
1
2
3
4
0 0 0
1 0 0
0 1 0
0 0 1
$EndNodes
$Elements
1 1 1 1
3 1 4 1
1 1 2 3 4
$EndElements
"""


def test_read_msh_v2(tmp_path):
    p = tmp_path / "model.msh"
    p.write_text(MSH_V2)
    mesh = read_msh_mesh(str(p))
    assert mesh.element_type == "tet4"       # dominant solid type
    assert mesh.n_cells == 2
    assert mesh.n_nodes == 5
    np.testing.assert_array_equal(mesh.conn[0], [0, 1, 2, 3])
    # physical group 7 -> cellset
    assert "cellset_7" in mesh.cellsets
    assert mesh.cellsets["cellset_7"].size == 2


def test_read_msh_v4(tmp_path):
    p = tmp_path / "model4.msh"
    p.write_text(MSH_V4)
    mesh = read_msh_mesh(str(p))
    assert mesh.element_type == "tet4"
    assert mesh.n_cells == 1
    np.testing.assert_allclose(mesh.coords[1], [1, 0, 0])
    np.testing.assert_array_equal(mesh.conn[0], [0, 1, 2, 3])


def test_import_mesh_dispatches_msh(tmp_path):
    p = tmp_path / "model.msh"
    p.write_text(MSH_V2)
    mesh = import_mesh(str(p))
    assert mesh.element_type == "tet4"


def test_msh_solve_end_to_end(tmp_path):
    """A one-tet .msh can be solved through the standard pipeline."""
    from topopteval_tpu.api import (apply_fixed_boundary, apply_force,
                                    assemble_stiffness_matrix, setup_problem,
                                    solve_system)
    from topopteval_tpu.config import SolverConfig
    from topopteval_tpu.materials import create_material_model
    p = tmp_path / "model4.msh"
    p.write_text(MSH_V4)
    mesh = read_msh_mesh(str(p))
    problem = setup_problem(mesh)
    assemble_stiffness_matrix(problem, *create_material_model(1.0, 0.3))
    apply_fixed_boundary(problem, [0, 1, 2])
    apply_force(problem, [3], [0, 0, -1.0])
    r = solve_system(problem, SolverConfig(method="direct", verbose=False))
    assert r.energy > 0 and np.all(np.isfinite(r.u))
