"""Abaqus .inp reader/converter tests (reference: src/Utils/InpToVtu.jl,
rebuilt as a working feature)."""

import numpy as np
import pytest

from topopteval_tpu.io.inp import (inp_to_vtu, inspect_inp_elements,
                                   parse_inp, read_inp_mesh,
                                   validate_inp_file)
from topopteval_tpu.io.vtu import VTUFile, read_vtu_mesh

INP_SAMPLE = """** sample heading
*NODE
1, 0.0, 0.0, 0.0
2, 1.0, 0.0, 0.0
3, 0.0, 1.0, 0.0
4, 0.0, 0.0, 1.0
5, 1.0, 1.0, 1.0
*ELEMENT, TYPE=C3D4, ELSET=solid
1, 1, 2, 3, 4
2, 2, 3, 4, 5
*ELEMENT, TYPE=S3, ELSET=skin
3, 1, 2, 3
*ELEMENT, TYPE=FOO99
9, 1, 2
"""


@pytest.fixture
def inp_path(tmp_path):
    p = tmp_path / "model.inp"
    p.write_text(INP_SAMPLE)
    return str(p)


def test_parse_and_validate(inp_path):
    parsed = parse_inp(inp_path)
    assert len(parsed.nodes) == 5
    assert [s[0] for s in parsed.sections] == ["C3D4", "S3"]
    report = validate_inp_file(inp_path)
    assert report["valid"]
    assert report["element_types"] == {"C3D4": 2, "S3": 1}
    assert "FOO99" in report["unsupported_types"]


def test_read_inp_mesh_dominant_type(inp_path):
    mesh = read_inp_mesh(inp_path)
    assert mesh.element_type == "tet4"
    assert mesh.n_cells == 2 and mesh.n_nodes == 5
    np.testing.assert_array_equal(mesh.conn[0], [0, 1, 2, 3])


def test_inp_to_vtu_roundtrip(inp_path, tmp_path):
    out = str(tmp_path / "converted")
    assert inp_to_vtu(inp_path, out, verbose=False)
    vtu = VTUFile(out + ".vtu")
    conn, offsets, types = vtu.cells()
    assert list(types) == [10, 10, 5]          # 2 tets + 1 tri
    assert vtu.n_points == 5
    # dominant-type import of the converted file
    mesh = read_vtu_mesh(out + ".vtu")
    assert mesh.element_type == "tet4" and mesh.n_cells == 2


def test_inspect(inp_path):
    counts = inspect_inp_elements(inp_path)
    assert counts == {"C3D4": 2, "S3": 1}


def test_nonexistent_file():
    with pytest.raises(FileNotFoundError):
        inp_to_vtu("/nope/missing.inp", "/tmp/x", verbose=False)
    assert not validate_inp_file("/nope/missing.inp")["exists"]


def test_hex_and_quadratic_types(tmp_path):
    txt = """*NODE
""" + "\n".join(f"{i+1}, {x}, {y}, {z}"
                for i, (x, y, z) in enumerate(
                    [(0,0,0),(1,0,0),(1,1,0),(0,1,0),
                     (0,0,1),(1,0,1),(1,1,1),(0,1,1)])) + """
*ELEMENT, TYPE=C3D8R
1, 1, 2, 3, 4, 5, 6, 7, 8
"""
    p = tmp_path / "hex.inp"
    p.write_text(txt)
    mesh = read_inp_mesh(str(p))
    assert mesh.element_type == "hex8"
