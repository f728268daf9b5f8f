"""Native library vs NumPy fallback equivalence + perf sanity."""

import os
import time

import numpy as np
import pytest

from topopteval_tpu.io.native import (extract_surface_faces_native,
                                      native_available)
from topopteval_tpu.mesh import FACE_TABLES
from topopteval_tpu.models.beams import generate_grid_tet, generate_grid_hex

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native library not built")


def _numpy_surface(mesh):
    faces = np.asarray(FACE_TABLES[mesh.element_type], dtype=np.int64)
    fk = faces.shape[1]
    flat = mesh.conn.astype(np.int64)[:, faces].reshape(-1, fk)
    keys = np.sort(flat, axis=1)
    _, inverse, counts = np.unique(keys, axis=0, return_inverse=True,
                                   return_counts=True)
    return np.flatnonzero(counts[inverse] == 1)


@pytest.mark.parametrize("gen,shape", [
    (generate_grid_tet, (5, 4, 3)),
    (generate_grid_hex, (4, 4, 4)),
    (generate_grid_tet, (1, 1, 1)),
])
def test_native_matches_numpy(gen, shape):
    mesh = gen(*shape)
    faces = np.asarray(FACE_TABLES[mesh.element_type], dtype=np.int64)
    native = extract_surface_faces_native(mesh.conn, faces)
    numpy_idx = _numpy_surface(mesh)
    np.testing.assert_array_equal(native, numpy_idx)


def test_extract_surface_uses_native_and_fallback_agree():
    mesh = generate_grid_tet(6, 5, 4)
    s_native = mesh.surface()
    os.environ["TOPOPTEVAL_NO_NATIVE"] = "1"
    try:
        import topopteval_tpu.io.native as nat
        nat._TRIED, nat._LIB = False, None       # force re-probe
        mesh.clear_surface_cache()
        s_numpy = mesh.surface()
    finally:
        del os.environ["TOPOPTEVAL_NO_NATIVE"]
        nat._TRIED, nat._LIB = False, None
    np.testing.assert_array_equal(s_native.surface_nodes,
                                  s_numpy.surface_nodes)
    np.testing.assert_array_equal(s_native.face_conn, s_numpy.face_conn)
    np.testing.assert_array_equal(s_native.face_cells, s_numpy.face_cells)


def test_native_faster_on_large_mesh():
    mesh = generate_grid_tet(40, 20, 10)     # 48k tets, 192k faces
    faces = np.asarray(FACE_TABLES["tet4"], dtype=np.int64)
    t0 = time.perf_counter()
    extract_surface_faces_native(mesh.conn, faces)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    _numpy_surface(mesh)
    t_numpy = time.perf_counter() - t0
    # no hard assert on ratio (CI noise) but it should not be slower 5x
    assert t_native < t_numpy * 5
