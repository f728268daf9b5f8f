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


def test_unit_ke_cm_native_matches_numpy():
    """topopt_unit_ke_cm == the _host_ke_blocks_unit einsum chain in the
    exact component-major layout bell.build_bell_skeleton consumes (the
    skeleton's 57.4s unit_assembly hot spot at 1.23M tets)."""
    from topopteval_tpu.fem.bell import _host_ke_blocks_unit
    from topopteval_tpu.io.native import unit_ke_cm_native
    from topopteval_tpu.ops.elements import element_tables

    for gen, shape, et in ((generate_grid_tet, (5, 3, 2), "tet4"),
                           (generate_grid_hex, (3, 3, 2), "hex8")):
        mesh = gen(*shape)
        C, k = mesh.conn.shape
        _, dN, w = element_tables(et, 1 if et == "tet4" else 2)
        out = np.empty((18, C * k * k))
        assert unit_ke_cm_native(np.asarray(mesh.coords, np.float64),
                                 mesh.conn, np.asarray(dN, np.float64),
                                 np.asarray(w, np.float64), out)
        ref = np.empty_like(out)
        pos = 0
        for cn, kl, km in _host_ke_blocks_unit(mesh, 2):
            cc = cn.shape[0] * k * k
            ref[:9, pos: pos + cc] = kl.reshape(cc, 9).T
            ref[9:, pos: pos + cc] = km.reshape(cc, 9).T
            pos += cc
        scale = np.abs(ref).max()
        np.testing.assert_allclose(out, ref, atol=1e-13 * scale)


def test_bsr_rap_scalar_native_matches_scipy():
    """Native scalar-P Galerkin RAP on a frozen pattern == scipy's
    kron-expanded bsr product (the density swap's rap_chain hot spot)."""
    import scipy.sparse as sp

    from topopteval_tpu.io.native import bsr_rap_scalar_native

    rng = np.random.default_rng(7)
    n_f, n_c = 90, 25
    Apat = sp.random(n_f, n_f, density=0.1, random_state=1)
    Apat = (Apat + Apat.T + sp.eye(n_f)).tocsr()
    Apat.sort_indices()
    data = rng.standard_normal((Apat.nnz, 3, 3))
    A = sp.bsr_matrix((data, Apat.indices.astype(np.int64), Apat.indptr),
                      shape=(3 * n_f, 3 * n_f))
    P = sp.random(n_f, n_c, density=0.2, random_state=2, format="csr")
    P.sort_indices()
    PT = P.T.tocsr()
    PT.sort_indices()
    P_dof = sp.kron(P, sp.eye(3), format="csr").tobsr((3, 3))
    PT_dof = sp.kron(PT, sp.eye(3), format="csr").tobsr((3, 3))
    ref = PT_dof @ (A @ P_dof)
    ref.sort_indices()
    got = bsr_rap_scalar_native(
        A.indptr, A.indices, A.data.reshape(-1, 9),
        P.indptr, P.indices, P.data,
        PT.indptr, PT.indices, PT.data,
        ref.indptr, ref.indices.astype(np.int32), n_f, n_c)
    scale = np.abs(ref.data).max()
    np.testing.assert_allclose(got, ref.data, atol=1e-13 * scale)

    # pattern-mismatch detection: drop one structural entry
    with pytest.raises(ValueError, match="frozen"):
        bsr_rap_scalar_native(
            A.indptr, A.indices, A.data.reshape(-1, 9),
            P.indptr, P.indices, P.data,
            PT.indptr, PT.indices, PT.data,
            np.concatenate([ref.indptr[:1], ref.indptr[1:] - 1]),
            ref.indices[1:].astype(np.int32), n_f, n_c)
