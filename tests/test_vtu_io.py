"""VTU reader/writer tests against the bundled fixture meshes.

Fixture facts decoded in SURVEY.md §2.1 row 32:
- beam_linear_volume_mesh.vtu: 2,877 nodes / 8,121 Tet4, bbox 60x20x4
- beam_vfrac_04_Raw.vtu: 6,405 nodes / 4,800 Hex8, density mean ~0.4007
Both use header_type="UInt64" + vtkZLibDataCompressor appended rawdata.
"""

import numpy as np
import pytest

from topopteval_tpu.io import (VTUWriter, read_cell_density, read_vtu_mesh,
                               write_vtu)
from topopteval_tpu.io.vtu import VTUFile


def test_read_tet_fixture(beam_tet_path):
    mesh = read_vtu_mesh(beam_tet_path)
    assert mesh.element_type == "tet4"
    assert mesh.n_nodes == 2877
    assert mesh.n_cells == 8121
    lo, hi = mesh.bounding_box()
    np.testing.assert_allclose(lo, [0, 0, 0], atol=1e-12)
    np.testing.assert_allclose(hi, [60, 20, 4], atol=1e-12)
    assert mesh.conn.min() >= 0 and mesh.conn.max() == mesh.n_nodes - 1


def test_read_hex_fixture(beam_hex_path):
    mesh = read_vtu_mesh(beam_hex_path)
    assert mesh.element_type == "hex8"
    assert mesh.n_nodes == 6405
    assert mesh.n_cells == 4800
    lo, hi = mesh.bounding_box()
    np.testing.assert_allclose(hi, [60, 20, 4], atol=1e-12)


def test_density_extraction(beam_hex_path):
    d = read_cell_density(beam_hex_path)
    assert d.shape == (4800,)
    assert 0.0 <= d.min() and d.max() <= 1.0
    assert abs(d.mean() - 0.4007) < 1e-3  # ~40% volume fraction


def test_density_extraction_rejects_meshes_without_field(beam_tet_path):
    with pytest.raises(ValueError, match="No density data"):
        read_cell_density(beam_tet_path)


def test_writer_roundtrip(tmp_path, beam_hex_path):
    mesh = read_vtu_mesh(beam_hex_path)
    dens = read_cell_density(beam_hex_path)
    rng = np.random.default_rng(0)
    u = rng.standard_normal((mesh.n_nodes, 3))
    vm = rng.random(mesh.n_cells)

    path = write_vtu(str(tmp_path / "rt"), mesh,
                     point_data={"u": u},
                     cell_data={"density": dens, "von_Mises_stress": vm})
    assert path.endswith(".vtu")

    back = read_vtu_mesh(path)
    assert back.element_type == mesh.element_type
    np.testing.assert_array_equal(back.conn, mesh.conn)
    np.testing.assert_allclose(back.coords, mesh.coords)
    vtu = VTUFile(path)
    pd, cd = vtu.point_data(), vtu.cell_data()
    np.testing.assert_allclose(pd["u"], u)
    np.testing.assert_allclose(cd["density"], dens)
    np.testing.assert_allclose(cd["von_Mises_stress"], vm)


def test_writer_uncompressed_roundtrip(tmp_path, beam_tet_path):
    mesh = read_vtu_mesh(beam_tet_path)
    w = VTUWriter(mesh, compress=False)
    w.add_point_data("x", mesh.coords.copy())
    path = w.write(str(tmp_path / "raw"))
    vtu = VTUFile(path)
    np.testing.assert_allclose(vtu.points(), mesh.coords)
    np.testing.assert_allclose(vtu.point_data()["x"], mesh.coords)


def test_cellset_import(tmp_path, beam_tet_path):
    mesh = read_vtu_mesh(beam_tet_path)
    ids = np.zeros(mesh.n_cells, dtype=np.int32)
    ids[: 100] = 7
    path = write_vtu(str(tmp_path / "sets"), mesh,
                     cell_data={"CellEntityIds": ids})
    back = read_vtu_mesh(path)
    assert set(back.cellsets) == {"cellset_0", "cellset_7"}
    assert back.cellsets["cellset_7"].size == 100


def _b64_zlib_dataarray(arr: np.ndarray, vtk_type: str, name=None,
                        ncomp=None) -> str:
    """Inline format="binary" + vtkZLibDataCompressor element text: VTK
    base64-encodes the (3+n_blocks)-word UInt64 header and the compressed
    data as two SEPARATE streams (the round-1 ADVICE decode bug)."""
    import base64
    import zlib

    raw = np.ascontiguousarray(arr).tobytes()
    comp = zlib.compress(raw)
    header = np.array([1, len(raw), len(raw), len(comp)],
                      dtype="<u8").tobytes()
    text = (base64.b64encode(header).decode()
            + base64.b64encode(comp).decode())
    attrs = f'type="{vtk_type}" format="binary"'
    if name:
        attrs += f' Name="{name}"'
    if ncomp:
        attrs += f' NumberOfComponents="{ncomp}"'
    return f"<DataArray {attrs}>{text}</DataArray>"


def test_inline_binary_compressed_vtu(tmp_path):
    """Compressed inline-binary VTU (two-stream base64) decodes correctly."""
    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                   dtype=np.float64)
    conn = np.array([0, 1, 2, 3], dtype=np.int64)
    offs = np.array([4], dtype=np.int64)
    types = np.array([10], dtype=np.uint8)
    dens = np.array([0.5], dtype=np.float64)
    xml = f"""<?xml version="1.0"?>
<VTKFile type="UnstructuredGrid" version="1.0" byte_order="LittleEndian"
         header_type="UInt64" compressor="vtkZLibDataCompressor">
<UnstructuredGrid><Piece NumberOfPoints="4" NumberOfCells="1">
<Points>{_b64_zlib_dataarray(pts, "Float64", ncomp=3)}</Points>
<Cells>{_b64_zlib_dataarray(conn, "Int64", name="connectivity")}
{_b64_zlib_dataarray(offs, "Int64", name="offsets")}
{_b64_zlib_dataarray(types, "UInt8", name="types")}</Cells>
<CellData>{_b64_zlib_dataarray(dens, "Float64", name="density")}</CellData>
</Piece></UnstructuredGrid></VTKFile>"""
    p = tmp_path / "inline.vtu"
    p.write_text(xml)
    mesh = read_vtu_mesh(str(p))
    assert mesh.element_type == "tet4"
    assert mesh.n_cells == 1
    np.testing.assert_allclose(mesh.coords, pts)
    np.testing.assert_array_equal(mesh.conn[0], [0, 1, 2, 3])
    np.testing.assert_allclose(read_cell_density(str(p)), [0.5])
