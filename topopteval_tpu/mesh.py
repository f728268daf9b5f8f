"""Mesh data model: host container + device pytree of padded arrays.

TPU-native replacement for the reference's Ferrite ``Grid``/``DofHandler``
object graph (reference: src/FiniteElementAnalysis/FiniteElementAnalysis.jl:151-185,
src/MeshImport/MeshImport.jl:92-121).  Instead of a cell iterator over
heterogeneous objects, a mesh is a pair of dense arrays —
``coords [n_nodes, 3]`` and ``conn [n_cells, k]`` — that land directly in
HBM, with DOF numbering defined arithmetically as ``dof = 3*node + comp``
(this collapses the reference's node→DOF Dict,
FiniteElementAnalysis.jl:265-293, into indexing math; the reference's
interleaved-xyz layout assumption becomes the definition here).

Two layers:

- :class:`Mesh` — host-side container (NumPy), carries auxiliary data the
  device never needs (cellsets, cached surface topology) and performs
  host-only preprocessing (surface extraction, quadratic refinement).
- :class:`DeviceMesh` — frozen pytree of ``jnp`` arrays (optionally padded
  to TPU-friendly sizes) passed into jitted kernels.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

try:  # allow host-only use without jax present
    import jax
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jax = None
    jnp = None

from .utils.terminal import log

_WARNED_X64_DOWNGRADE = False

# ---------------------------------------------------------------------------
# Element topology registry
# ---------------------------------------------------------------------------

#: canonical local-face → local-node tables, matching the Ferrite facet
#: convention the reference pins down (reference: FiniteElementAnalysis.jl:42-67).
#: Node indices are 0-based here (the reference is 1-based Julia).
FACE_TABLES: Dict[str, tuple] = {
    "tet4": ((0, 2, 1), (0, 1, 3), (1, 2, 3), (0, 3, 2)),
    # corner nodes only — face IDENTITY/topology (a face is uniquely keyed
    # by its corners); quadrature and node selection use FULL_FACE_TABLES
    "tet10": ((0, 2, 1), (0, 1, 3), (1, 2, 3), (0, 3, 2)),
    "hex20": (
        (0, 3, 2, 1), (0, 1, 5, 4), (1, 2, 6, 5),
        (2, 3, 7, 6), (0, 4, 7, 3), (4, 5, 6, 7),
    ),
    "hex8": (
        (0, 3, 2, 1),  # bottom (z=-1)
        (0, 1, 5, 4),  # front  (y=-1)
        (1, 2, 6, 5),  # right  (x=+1)
        (2, 3, 7, 6),  # back   (y=+1)
        (0, 4, 7, 3),  # left   (x=-1)
        (4, 5, 6, 7),  # top    (z=+1)
    ),
    "tri3": ((0, 1), (1, 2), (2, 0)),
    "quad4": ((0, 1), (1, 2), (2, 3), (3, 0)),
}

#: full face tables including higher-order nodes, used for facet
#: quadrature (consistent quadratic load vectors) and surface-node
#: selection; VTK_QUADRATIC_TRIANGLE order [v0, v1, v2, m01, m12, m20].
#: Mid-edge ids derive from EDGE_TABLES['tet4'] ((0,1),(1,2),(2,0),(0,3),
#: (1,3),(2,3)) offset by the 4 corner slots.
FULL_FACE_TABLES: Dict[str, tuple] = dict(FACE_TABLES)
FULL_FACE_TABLES["tet10"] = (
    (0, 2, 1, 6, 5, 4),   # corners (0,2,1): mids (0,2)->6, (2,1)->5, (1,0)->4
    (0, 1, 3, 4, 8, 7),   # (0,1)->4, (1,3)->8, (3,0)->7
    (1, 2, 3, 5, 9, 8),   # (1,2)->5, (2,3)->9, (3,1)->8
    (0, 3, 2, 7, 9, 6),   # (0,3)->7, (3,2)->9, (2,0)->6
)
#: quad8 faces (VTK_QUADRATIC_QUAD order: 4 corners then the 4 face-edge
#: mids); mid-edge node k of a hex20 sits on EDGE_TABLES['hex8'][k-8]
FULL_FACE_TABLES["hex20"] = (
    (0, 3, 2, 1, 11, 10, 9, 8),     # bottom
    (0, 1, 5, 4, 8, 17, 12, 16),    # front
    (1, 2, 6, 5, 9, 18, 13, 17),    # right
    (2, 3, 7, 6, 10, 19, 14, 18),   # back
    (0, 4, 7, 3, 16, 15, 19, 11),   # left
    (4, 5, 6, 7, 12, 13, 14, 15),   # top
)

#: tet edge table in Ferrite/VTK quadratic-node order: mid-edge node k of a
#: tet10 sits on edge EDGES['tet4'][k] (VTK_QUADRATIC_TETRA ordering).
EDGE_TABLES: Dict[str, tuple] = {
    "tet4": ((0, 1), (1, 2), (2, 0), (0, 3), (1, 3), (2, 3)),
    "hex8": (
        (0, 1), (1, 2), (2, 3), (3, 0),
        (4, 5), (5, 6), (6, 7), (7, 4),
        (0, 4), (1, 5), (2, 6), (3, 7),
    ),
}

#: VTK cell-type ids (reference reads these from VTU, MeshImport.jl:72-89).
VTK_CELL_IDS: Dict[str, int] = {
    "line2": 3,
    "tri3": 5,
    "quad4": 9,
    "tet4": 10,
    "hex8": 12,
    "tet10": 24,
    "hex20": 25,
}
VTK_ID_TO_TYPE = {v: k for k, v in VTK_CELL_IDS.items()}

NODES_PER_CELL: Dict[str, int] = {
    "line2": 2,
    "tri3": 3,
    "quad4": 4,
    "tet4": 4,
    "hex8": 8,
    "tet10": 10,
    "hex20": 20,
}

#: element types the FEM layer can analyze (3D solids)
SOLID_TYPES = ("tet4", "hex8", "tet10", "hex20")

DIM = 3  # 3D problems throughout (reference: FiniteElementAnalysis.jl:152)


def dofs_of_nodes(node_ids: np.ndarray) -> np.ndarray:
    """Node ids → their 3 DOF ids, shape [..., 3].

    Arithmetic replacement for the reference's ``get_node_dofs`` Dict
    (reference: FiniteElementAnalysis.jl:265-293).
    """
    node_ids = np.asarray(node_ids)
    return node_ids[..., None] * DIM + np.arange(DIM, dtype=node_ids.dtype)


def element_dofs(conn: np.ndarray) -> np.ndarray:
    """Connectivity [C,k] → element DOF matrix [C, 3k] (interleaved xyz)."""
    C, k = conn.shape
    return dofs_of_nodes(conn).reshape(C, k * DIM)


# ---------------------------------------------------------------------------
# Device pytree
# ---------------------------------------------------------------------------

def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class DeviceMesh:
    """Frozen pytree of device arrays for one homogeneous element batch.

    Padded cells reference node 0 with zero density, making them provably
    inert through assembly: their element stiffness is scaled by density 0
    and they scatter zeros (see tests/test_padding.py).
    """

    coords: "jnp.ndarray"          # [Np, 3] node coordinates (Np >= n_nodes)
    conn: "jnp.ndarray"            # [Cp, k] int32 connectivity (Cp >= n_cells)
    density: "jnp.ndarray"         # [Cp] per-element density (1.0 default, 0 pad)
    cell_mask: "jnp.ndarray"       # [Cp] 1.0 for real cells, 0.0 padding
    n_nodes: int = dataclasses.field(metadata={"static": True})
    n_cells: int = dataclasses.field(metadata={"static": True})
    element_type: str = dataclasses.field(metadata={"static": True})

    @property
    def n_dofs(self) -> int:
        return DIM * self.n_nodes

    @property
    def n_padded_dofs(self) -> int:
        return DIM * self.coords.shape[0]

    @property
    def edofs(self) -> "jnp.ndarray":
        """Element DOF indices [Cp, 3k]."""
        k = self.conn.shape[1]
        return (self.conn[:, :, None] * DIM
                + jnp.arange(DIM, dtype=self.conn.dtype)).reshape(-1, k * DIM)


if jax is not None:
    def _dm_flatten(m: DeviceMesh):
        return (
            (m.coords, m.conn, m.density, m.cell_mask),
            (m.n_nodes, m.n_cells, m.element_type),
        )

    def _dm_unflatten(aux, leaves):
        coords, conn, density, cell_mask = leaves
        n_nodes, n_cells, element_type = aux
        return DeviceMesh(coords, conn, density, cell_mask,
                          n_nodes, n_cells, element_type)

    jax.tree_util.register_pytree_node(DeviceMesh, _dm_flatten, _dm_unflatten)


# ---------------------------------------------------------------------------
# Host mesh
# ---------------------------------------------------------------------------

class Mesh:
    """Host-side homogeneous mesh (dominant cell type, like the reference's
    Grid built from the most common VTK cell type, MeshImport.jl:92-121).

    Parameters
    ----------
    coords : float array [n_nodes, 3]
    conn : int array [n_cells, k]  (0-based connectivity)
    element_type : one of ``tet4 | hex8 | tet10 | tri3 | quad4 | line2``
    density : optional per-cell density field
    cellsets : optional mapping name -> cell-index array (reference imports
        these from VTU cell-data fields, MeshImport.jl:129-150)
    nodesets : optional mapping name -> node-index array (named physical
        surface groups from .msh imports — FerriteGmsh carries these
        through togrid, MeshImport.jl:28; usable for BC selection via
        fem.bc.select_nodes_by_set)
    """

    def __init__(
        self,
        coords: np.ndarray,
        conn: np.ndarray,
        element_type: str,
        density: Optional[np.ndarray] = None,
        cellsets: Optional[Dict[str, np.ndarray]] = None,
        nodesets: Optional[Dict[str, np.ndarray]] = None,
    ):
        coords = np.ascontiguousarray(coords, dtype=np.float64)
        if coords.ndim != 2 or coords.shape[1] != DIM:
            raise ValueError(f"coords must be [n,3], got {coords.shape}")
        conn = np.ascontiguousarray(conn, dtype=np.int32)
        k = NODES_PER_CELL.get(element_type)
        if k is None:
            raise ValueError(f"unknown element type {element_type!r}")
        if conn.ndim != 2 or conn.shape[1] != k:
            raise ValueError(
                f"conn for {element_type} must be [C,{k}], got {conn.shape}")
        if conn.size and (conn.min() < 0 or conn.max() >= len(coords)):
            raise ValueError("connectivity indices out of range")
        self.coords = coords
        self.conn = conn
        self.element_type = element_type
        self.density = (None if density is None
                        else np.asarray(density, dtype=np.float64).reshape(-1))
        if self.density is not None and len(self.density) != len(conn):
            raise ValueError(
                f"density length ({len(self.density)}) does not match "
                f"number of cells ({len(conn)})")
        self.cellsets: Dict[str, np.ndarray] = dict(cellsets or {})
        self.nodesets: Dict[str, np.ndarray] = dict(nodesets or {})
        self._surface_cache = None  # lazy (reference: SelectNodesForBC.jl:30-38)
        #: set by models/beams.py generators: {"dims": (nx,ny,nz), "lo", "hi"}
        #: — enables the stencil-operator/multigrid fast path in solve_system
        self.structured_info = None

    # -- basic queries ------------------------------------------------------

    @property
    def n_nodes(self) -> int:
        return self.coords.shape[0]

    @property
    def n_cells(self) -> int:
        return self.conn.shape[0]

    @property
    def n_dofs(self) -> int:
        return DIM * self.n_nodes

    @property
    def nodes_per_cell(self) -> int:
        return self.conn.shape[1]

    def __repr__(self) -> str:
        return (f"Mesh({self.element_type}, nodes={self.n_nodes}, "
                f"cells={self.n_cells})")

    # -- surface topology (host-side, cached) -------------------------------

    def surface(self):
        """Lazily-computed surface topology; see :mod:`..fem.bc`."""
        if self._surface_cache is None:
            from .fem.bc import extract_surface  # local import to avoid cycle
            self._surface_cache = extract_surface(self)
        return self._surface_cache

    def clear_surface_cache(self) -> None:
        """Drop the cached surface topology (reference:
        SelectNodesForBC.jl:379-382)."""
        self._surface_cache = None

    # -- refinement ---------------------------------------------------------

    def to_quadratic(self) -> "Mesh":
        """Tet4 → Tet10 / Hex8 → Hex20 by mid-edge node insertion.

        Equivalent of the reference's ``interpolation_order=2`` path, which
        attaches quadratic Lagrange DOFs to a linear grid of either family
        (reference: FiniteElementAnalysis.jl:160-163).  Mid-edge nodes
        follow the VTK quadratic orderings (EDGE_TABLES).
        """
        quad_of = {"tet4": "tet10", "hex8": "hex20"}
        if self.element_type not in quad_of:
            raise NotImplementedError(
                f"quadratic refinement supports tet4 and hex8 meshes "
                f"(got {self.element_type!r})")
        edges = np.asarray(EDGE_TABLES[self.element_type],
                           dtype=np.int64)              # [n_edges, 2]
        # all element edges as sorted node pairs -> unique mid-edge node ids
        ev = self.conn[:, edges]                        # [C, n_edges, 2]
        ev_sorted = np.sort(ev, axis=2).reshape(-1, 2)
        uniq, inverse = np.unique(ev_sorted, axis=0, return_inverse=True)
        mid_coords = 0.5 * (self.coords[uniq[:, 0]] + self.coords[uniq[:, 1]])
        new_coords = np.vstack([self.coords, mid_coords])
        mid_ids = (self.n_nodes + inverse).reshape(self.n_cells,
                                                   len(edges))
        conn_q = np.hstack([self.conn, mid_ids]).astype(np.int32)
        return Mesh(new_coords, conn_q, quad_of[self.element_type],
                    density=self.density, cellsets=self.cellsets,
                    nodesets=self.nodesets)

    # -- device transfer ----------------------------------------------------

    def device(
        self,
        dtype=None,
        pad_cells_to: Optional[int] = None,
        pad_nodes_to: Optional[int] = None,
        cell_align: int = 1,
    ) -> DeviceMesh:
        """Build the device pytree, optionally padded to fixed shapes.

        Padding keeps shapes static across a family of meshes (XLA compiles
        once); padded cells are density-0 ghost cells wired to node 0.
        """
        if jnp is None:  # pragma: no cover
            raise RuntimeError("jax is not available")
        dtype = dtype or jnp.float32
        if jnp.dtype(dtype) == jnp.float64:
            import jax as _jax
            if not _jax.config.jax_enable_x64:
                # fp64 is unavailable (TPU default) — downgrade cleanly
                # instead of letting every asarray emit a truncation
                # warning for the same fact; but say so ONCE, so code
                # that believes it computed an fp64 reference sees the
                # precision loss (ADVICE r3)
                global _WARNED_X64_DOWNGRADE
                if not _WARNED_X64_DOWNGRADE:
                    _WARNED_X64_DOWNGRADE = True
                    from .utils.terminal import print_warning
                    print_warning(
                        "float64 requested but jax_enable_x64 is off — "
                        "computing in float32 (set JAX_ENABLE_X64=1 for "
                        "fp64)")
                dtype = jnp.float32
        Cp = pad_cells_to or _round_up(max(self.n_cells, 1), cell_align)
        Np = pad_nodes_to or self.n_nodes
        if Cp < self.n_cells or Np < self.n_nodes:
            raise ValueError("padding smaller than actual size")

        conn = np.zeros((Cp, self.nodes_per_cell), dtype=np.int32)
        conn[: self.n_cells] = self.conn
        coords = np.zeros((Np, DIM), dtype=np.float64)
        coords[: self.n_nodes] = self.coords
        dens = np.zeros((Cp,), dtype=np.float64)
        dens[: self.n_cells] = 1.0 if self.density is None else self.density
        mask = np.zeros((Cp,), dtype=np.float64)
        mask[: self.n_cells] = 1.0

        return DeviceMesh(
            coords=jnp.asarray(coords, dtype=dtype),
            conn=jnp.asarray(conn),
            density=jnp.asarray(dens, dtype=dtype),
            cell_mask=jnp.asarray(mask, dtype=dtype),
            n_nodes=self.n_nodes,
            n_cells=self.n_cells,
            element_type=self.element_type,
        )

    # -- misc ---------------------------------------------------------------

    def bounding_box(self):
        return self.coords.min(axis=0), self.coords.max(axis=0)


def log_mesh_imported(mesh: Mesh) -> None:
    log(f"Mesh imported successfully: {mesh.n_nodes} nodes, "
        f"{mesh.n_cells} elements")
