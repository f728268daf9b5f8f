"""Structured mesh generators (the reference's only fixture generator is
Ferrite's ``generate_grid(Hexahedron, ...)``, used by the analytical tests,
reference: test/VolumeForces/testVolumeForces.jl:9, 67, 108).

Provides:
- ``generate_grid_hex``: structured hex8 box grid (VTK node ordering)
- ``generate_grid_tet``: the same box split into 6 conforming tets per hex
  (all sharing the v0–v6 diagonal; orientation-positive, face-diagonal
  consistent across neighbors)
- ``refined_beam``: parametric cantilever used by bench.py to build the
  ~1M-tet model (BASELINE.md target config 4)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from ..mesh import Mesh

_TET_SPLIT = np.array([
    [0, 1, 2, 6],
    [0, 2, 3, 6],
    [0, 3, 7, 6],
    [0, 7, 4, 6],
    [0, 4, 5, 6],
    [0, 5, 1, 6],
], dtype=np.int64)


def _box_nodes(nx: int, ny: int, nz: int, lo, hi) -> np.ndarray:
    xs = np.linspace(lo[0], hi[0], nx + 1)
    ys = np.linspace(lo[1], hi[1], ny + 1)
    zs = np.linspace(lo[2], hi[2], nz + 1)
    Z, Y, X = np.meshgrid(zs, ys, xs, indexing="ij")
    return np.stack([X, Y, Z], axis=-1).reshape(-1, 3)


def _hex_conn(nx: int, ny: int, nz: int) -> np.ndarray:
    def nid(ix, iy, iz):
        return ix + iy * (nx + 1) + iz * (nx + 1) * (ny + 1)

    ix, iy, iz = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                             indexing="ij")
    ix, iy, iz = ix.reshape(-1), iy.reshape(-1), iz.reshape(-1)
    return np.stack([
        nid(ix, iy, iz), nid(ix + 1, iy, iz),
        nid(ix + 1, iy + 1, iz), nid(ix, iy + 1, iz),
        nid(ix, iy, iz + 1), nid(ix + 1, iy, iz + 1),
        nid(ix + 1, iy + 1, iz + 1), nid(ix, iy + 1, iz + 1),
    ], axis=1).astype(np.int32)


def generate_grid_hex(nx: int, ny: int, nz: int,
                      lo: Sequence[float] = (0.0, 0.0, 0.0),
                      hi: Sequence[float] = (1.0, 1.0, 1.0)) -> Mesh:
    """Structured hex8 box grid (Ferrite generate_grid(Hexahedron, ...)
    equivalent)."""
    mesh = Mesh(_box_nodes(nx, ny, nz, lo, hi), _hex_conn(nx, ny, nz),
                "hex8")
    # structured-box provenance: lets solve_system pick the gather-free
    # stencil/multigrid fast path (fem/structured.py, fem/multigrid.py)
    mesh.structured_info = {"dims": (nx, ny, nz),
                            "lo": tuple(float(v) for v in lo),
                            "hi": tuple(float(v) for v in hi)}
    return mesh


def generate_grid_tet(nx: int, ny: int, nz: int,
                      lo: Sequence[float] = (0.0, 0.0, 0.0),
                      hi: Sequence[float] = (1.0, 1.0, 1.0)) -> Mesh:
    """Structured tet4 box grid: 6 conforming tets per hex cell."""
    hexes = _hex_conn(nx, ny, nz)                       # [H, 8]
    conn = hexes[:, _TET_SPLIT].reshape(-1, 4).astype(np.int32)
    mesh = Mesh(_box_nodes(nx, ny, nz, lo, hi), conn, "tet4")
    mesh.structured_info = {"dims": (nx, ny, nz),
                            "lo": tuple(float(v) for v in lo),
                            "hi": tuple(float(v) for v in hi)}
    return mesh


def refined_beam(target_tets: int = 1_000_000,
                 dims: Tuple[float, float, float] = (60.0, 20.0, 4.0)
                 ) -> Mesh:
    """Cantilever beam with ~target_tets tet4 elements, matching the
    fixture beam's 60x20x4 proportions (BASELINE.md 1M-tet config)."""
    L, W, H = dims
    # 6 tets per hex; nx:ny:nz ~ L:W:H
    vol_per_hex = L * W * H / (target_tets / 6)
    h = vol_per_hex ** (1.0 / 3.0)
    nx = max(1, round(L / h))
    ny = max(1, round(W / h))
    nz = max(1, round(H / h))
    return generate_grid_tet(nx, ny, nz, (0, 0, 0), (L, W, H))
