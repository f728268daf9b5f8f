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
                _LIB = lib
                break
            except OSError:  # pragma: no cover
                continue
    return _LIB


def native_available() -> bool:
    return load_native() is not None


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
