"""ctypes bindings for the native host-preprocessing library.

Loads ``native/libtopopt_native.so`` (hash-based surface-face extraction,
see native/topopt_native.cpp); every entry point has a pure-NumPy fallback
so the package works without the compiled library.  Set
``TOPOPTEVAL_NO_NATIVE=1`` to force the fallback (used by tests to compare
both paths).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _candidate_paths():
    here = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(os.path.dirname(here))
    return [
        os.path.join(root, "native", "libtopopt_native.so"),
        os.path.join(here, "libtopopt_native.so"),
    ]


def load_native() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("TOPOPTEVAL_NO_NATIVE") == "1":
        return None
    for path in _candidate_paths():
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
                lib.topopt_extract_surface_faces.restype = ctypes.c_int64
                lib.topopt_extract_surface_faces.argtypes = [
                    ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                    ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
                    ctypes.c_int32, ctypes.c_int32,
                    ctypes.POINTER(ctypes.c_int64)]
                lib.topopt_version.restype = ctypes.c_int
                if lib.topopt_version() >= 3:
                    lib.topopt_set_ftz.restype = ctypes.c_uint32
                    lib.topopt_set_ftz.argtypes = [ctypes.c_int32]
                    lib.topopt_restore_csr.argtypes = [ctypes.c_uint32]
                    lib.topopt_unit_ke_cm_dest.argtypes = [
                        ctypes.POINTER(ctypes.c_double),
                        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                        ctypes.c_int32, ctypes.POINTER(ctypes.c_double),
                        ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
                        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                        ctypes.POINTER(ctypes.c_int32)]
                if lib.topopt_version() >= 4:
                    lib.topopt_element_gradients.argtypes = [
                        ctypes.POINTER(ctypes.c_double),
                        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                        ctypes.c_int32, ctypes.POINTER(ctypes.c_double),
                        ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
                        ctypes.POINTER(ctypes.c_double),
                        ctypes.POINTER(ctypes.c_double)]
                    lib.topopt_blocks_from_g.argtypes = [
                        ctypes.POINTER(ctypes.c_double),
                        ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
                        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
                        ctypes.POINTER(ctypes.c_uint16),
                        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                        ctypes.POINTER(ctypes.c_double),
                        ctypes.POINTER(ctypes.c_double),
                        ctypes.POINTER(ctypes.c_double)]
                if lib.topopt_version() >= 3:
                    lib.topopt_bsr_rap_scalar.restype = ctypes.c_int32
                    lib.topopt_bsr_rap_scalar.argtypes = [
                        ctypes.c_int64, ctypes.c_int64,
                        ctypes.POINTER(ctypes.c_int64),
                        ctypes.POINTER(ctypes.c_int32),
                        ctypes.POINTER(ctypes.c_double),
                        ctypes.POINTER(ctypes.c_int64),
                        ctypes.POINTER(ctypes.c_int32),
                        ctypes.POINTER(ctypes.c_double),
                        ctypes.POINTER(ctypes.c_int64),
                        ctypes.POINTER(ctypes.c_int32),
                        ctypes.POINTER(ctypes.c_double),
                        ctypes.POINTER(ctypes.c_int64),
                        ctypes.POINTER(ctypes.c_int32),
                        ctypes.POINTER(ctypes.c_double)]
                _LIB = lib
                break
            except OSError:  # pragma: no cover
                continue
    return _LIB


def native_available() -> bool:
    return load_native() is not None


def native_v2() -> Optional[ctypes.CDLL]:
    """The library, if it carries the round-5 kernels (unit-Ke planes,
    scalar-P RAP, FTZ control)."""
    lib = load_native()
    if lib is None or lib.topopt_version() < 3:
        return None
    return lib


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def unit_ke_cm_native(coords: np.ndarray, conn: np.ndarray,
                      dn: np.ndarray, w: np.ndarray,
                      out: np.ndarray,
                      dest: Optional[np.ndarray] = None) -> bool:
    """Fill the [18, n_cells*k*k] component-major unit-Ke contribution
    planes (fem/bell._host_ke_blocks_unit semantics).  ``dest`` maps
    each raw contribution to its final column, fusing the downstream
    sorted-order gather into the write pass.  Returns False if the
    native library is unavailable."""
    lib = native_v2()
    if lib is None:
        return False
    C, k = conn.shape
    coords = np.ascontiguousarray(coords, np.float64)
    conn = np.ascontiguousarray(conn, np.int32)
    dn = np.ascontiguousarray(dn, np.float64)
    w = np.ascontiguousarray(w, np.float64)
    assert out.flags.c_contiguous and out.shape == (18, C * k * k)
    if dest is not None:
        dest = np.ascontiguousarray(dest, np.int32)
        assert dest.shape == (C * k * k,)
        dp = _ptr(dest, ctypes.c_int32)
    else:
        dp = ctypes.POINTER(ctypes.c_int32)()
    lib.topopt_unit_ke_cm_dest(
        _ptr(coords, ctypes.c_double), _ptr(conn, ctypes.c_int32),
        ctypes.c_int64(C), ctypes.c_int32(k),
        _ptr(dn, ctypes.c_double), _ptr(w, ctypes.c_double),
        ctypes.c_int32(dn.shape[0]),
        _ptr(out, ctypes.c_double), ctypes.c_int64(out.shape[1]), dp)
    return True


def element_gradients_native(coords: np.ndarray, conn: np.ndarray,
                             dn: np.ndarray, w: np.ndarray,
                             g_out: np.ndarray,
                             wdet_out: np.ndarray) -> bool:
    """Physical shape-function gradients g[c,q,k,3] + quadrature weights
    wdet[c,q] (the gradient factorization of the unit Ke — see
    native/topopt_native.cpp).  Returns False if unavailable."""
    lib = native_v2()
    if lib is None or lib.topopt_version() < 4:
        return False
    C, k = conn.shape
    nqp = dn.shape[0]
    coords = np.ascontiguousarray(coords, np.float64)
    conn = np.ascontiguousarray(conn, np.int32)
    dn = np.ascontiguousarray(dn, np.float64)
    w = np.ascontiguousarray(w, np.float64)
    assert g_out.flags.c_contiguous and g_out.shape == (C, nqp, k, 3)
    assert wdet_out.flags.c_contiguous and wdet_out.shape == (C, nqp)
    lib.topopt_element_gradients(
        _ptr(coords, ctypes.c_double), _ptr(conn, ctypes.c_int32),
        ctypes.c_int64(C), ctypes.c_int32(k),
        _ptr(dn, ctypes.c_double), _ptr(w, ctypes.c_double),
        ctypes.c_int32(nqp),
        _ptr(g_out, ctypes.c_double), _ptr(wdet_out, ctypes.c_double))
    return True


def blocks_from_g_native(g: np.ndarray, wdet: np.ndarray,
                         elem: np.ndarray, ij: np.ndarray,
                         indptr: np.ndarray, lam: np.ndarray,
                         mu: np.ndarray) -> Optional[np.ndarray]:
    """Deduplicated global block values [nnzb, 9] (node-major, row-major
    3x3) from gradient-factorized element data and a sorted contribution
    list.  None if the library is unavailable."""
    lib = native_v2()
    if lib is None or lib.topopt_version() < 4:
        return None
    C, nqp, k, _ = g.shape
    g = np.ascontiguousarray(g, np.float64)
    wdet = np.ascontiguousarray(wdet, np.float64)
    elem = np.ascontiguousarray(elem, np.int32)
    ij = np.ascontiguousarray(ij, np.uint16)
    indptr = np.ascontiguousarray(indptr, np.int64)
    lam = np.ascontiguousarray(lam, np.float64)
    mu = np.ascontiguousarray(mu, np.float64)
    nnzb = indptr.shape[0] - 1
    out = np.empty((nnzb, 9), np.float64)
    lib.topopt_blocks_from_g(
        _ptr(g, ctypes.c_double), _ptr(wdet, ctypes.c_double),
        ctypes.c_int32(nqp), ctypes.c_int32(k),
        _ptr(elem, ctypes.c_int32), _ptr(ij, ctypes.c_uint16),
        _ptr(indptr, ctypes.c_int64), ctypes.c_int64(nnzb),
        _ptr(lam, ctypes.c_double), _ptr(mu, ctypes.c_double),
        _ptr(out, ctypes.c_double))
    return out


def bsr_rap_scalar_native(A_indptr, A_indices, A_data,
                          P_indptr, P_indices, P_w,
                          PT_indptr, PT_indices, PT_w,
                          out_indptr, out_indices,
                          n_f: int, n_c: int) -> Optional[np.ndarray]:
    """Ac = P^T A P (3x3-block A, scalar P) on a frozen output pattern.
    Returns the [nnz_out, 3, 3] block data, or None if the library is
    unavailable.  Raises ValueError on a pattern mismatch (caller maps
    it to SkeletonMismatch).  Runs with FTZ/DAZ on: SIMP Emin-scaled
    blocks otherwise drown the RAP in denormal assists."""
    lib = native_v2()
    if lib is None:
        return None
    A_indptr = np.ascontiguousarray(A_indptr, np.int64)
    A_indices = np.ascontiguousarray(A_indices, np.int32)
    A_data = np.ascontiguousarray(A_data, np.float64)
    P_indptr = np.ascontiguousarray(P_indptr, np.int64)
    P_indices = np.ascontiguousarray(P_indices, np.int32)
    P_w = np.ascontiguousarray(P_w, np.float64)
    PT_indptr = np.ascontiguousarray(PT_indptr, np.int64)
    PT_indices = np.ascontiguousarray(PT_indices, np.int32)
    PT_w = np.ascontiguousarray(PT_w, np.float64)
    out_indptr = np.ascontiguousarray(out_indptr, np.int64)
    out_indices = np.ascontiguousarray(out_indices, np.int32)
    nnz_out = out_indices.shape[0]
    out = np.empty((nnz_out, 3, 3), np.float64)
    prev = lib.topopt_set_ftz(1)
    try:
        rc = lib.topopt_bsr_rap_scalar(
            ctypes.c_int64(n_f), ctypes.c_int64(n_c),
            _ptr(A_indptr, ctypes.c_int64), _ptr(A_indices, ctypes.c_int32),
            _ptr(A_data, ctypes.c_double),
            _ptr(P_indptr, ctypes.c_int64), _ptr(P_indices, ctypes.c_int32),
            _ptr(P_w, ctypes.c_double),
            _ptr(PT_indptr, ctypes.c_int64),
            _ptr(PT_indices, ctypes.c_int32), _ptr(PT_w, ctypes.c_double),
            _ptr(out_indptr, ctypes.c_int64),
            _ptr(out_indices, ctypes.c_int32), _ptr(out, ctypes.c_double))
    finally:
        lib.topopt_restore_csr(prev)
    if rc != 0:
        raise ValueError("RAP produced a column outside the frozen "
                         "coarse pattern")
    return out


def extract_surface_faces_native(conn: np.ndarray, face_table: np.ndarray
                                 ) -> Optional[np.ndarray]:
    """Flat surface-face indices (cell*n_faces + local) or None if the
    native library is unavailable."""
    lib = load_native()
    if lib is None:
        return None
    conn = np.ascontiguousarray(conn, dtype=np.int32)
    ft = np.ascontiguousarray(face_table, dtype=np.int32)
    C, k = conn.shape
    nf, fk = ft.shape
    out = np.empty(C * nf, dtype=np.int64)
    n = lib.topopt_extract_surface_faces(
        conn.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(C), ctypes.c_int32(k),
        ft.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(nf), ctypes.c_int32(fk),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out[:n].copy()
