"""GMSH .msh reader (ASCII v2.2 and v4.1) — host-side I/O.

TPU-native replacement for the reference's FerriteGmsh dependency
(reference: src/MeshImport/MeshImport.jl:28 ``FerriteGmsh.togrid``): parses
the two common ASCII MSH formats into the same homogeneous dominant-type
:class:`..mesh.Mesh` the VTU path produces, importing physical-group cell
sets.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..mesh import Mesh, NODES_PER_CELL
from ..utils.terminal import log, print_warning

#: GMSH element type id → our element type
_GMSH_TYPES = {
    1: "line2",
    2: "tri3",
    3: "quad4",
    4: "tet4",
    5: "hex8",
    11: "tet10",
}


def _read_sections(path: str) -> Dict[str, List[str]]:
    sections: Dict[str, List[str]] = {}
    current = None
    with open(path) as fh:
        for raw in fh:
            line = raw.strip()
            if line.startswith("$End"):
                current = None
            elif line.startswith("$"):
                current = line[1:]
                sections[current] = []
            elif current is not None:
                sections[current].append(line)
    return sections


def read_msh_mesh(path: str) -> Mesh:
    sec = _read_sections(path)
    if "MeshFormat" not in sec:
        raise ValueError(f"{path}: not a GMSH .msh file")
    version = float(sec["MeshFormat"][0].split()[0])
    if sec["MeshFormat"][0].split()[1] != "0":
        raise NotImplementedError("binary .msh files are not supported")
    if version >= 4.0:
        coords, id_map, elems = _parse_v4(sec)
    else:
        coords, id_map, elems = _parse_v2(sec)

    # dominant-type rule, matching the VTU path (MeshImport.jl:92-121)
    counts = {t: len(v) for t, (v, _) in elems.items()}
    solid = {t: c for t, c in counts.items() if t in ("tet4", "hex8",
                                                      "tet10")}
    pool = solid or counts
    if not pool:
        raise ValueError("No supported cell types found in the mesh")
    etype = max(pool, key=pool.get)
    conn_raw, tags = elems[etype]
    conn = np.array([[id_map[n] for n in row] for row in conn_raw],
                    dtype=np.int32)

    cellsets: Dict[str, np.ndarray] = {}
    tags = np.asarray(tags)
    for tag in np.unique(tags):
        members = np.flatnonzero(tags == tag)
        if members.size:
            cellsets[f"cellset_{int(tag)}"] = members

    mesh = Mesh(coords, conn, etype, cellsets=cellsets)
    log(f"Mesh imported successfully: {mesh.n_nodes} nodes, "
        f"{mesh.n_cells} elements")
    return mesh


def _parse_v2(sec) -> Tuple[np.ndarray, Dict[int, int], Dict]:
    lines = sec["Nodes"]
    n = int(lines[0])
    ids = np.empty(n, dtype=np.int64)
    coords = np.empty((n, 3))
    for i, ln in enumerate(lines[1: 1 + n]):
        parts = ln.split()
        ids[i] = int(parts[0])
        coords[i] = [float(parts[1]), float(parts[2]), float(parts[3])]
    id_map = {int(g): i for i, g in enumerate(ids)}

    elines = sec["Elements"]
    ne = int(elines[0])
    elems: Dict[str, Tuple[List[List[int]], List[int]]] = {}
    for ln in elines[1: 1 + ne]:
        parts = [int(x) for x in ln.split()]
        _, gtype, ntags = parts[0], parts[1], parts[2]
        etype = _GMSH_TYPES.get(gtype)
        if etype is None:
            print_warning(f"Unsupported GMSH element type: {gtype}, skipping")
            continue
        phys = parts[3] if ntags >= 1 else 0
        nodes = parts[3 + ntags:]
        if len(nodes) != NODES_PER_CELL[etype]:
            continue
        conn, tags = elems.setdefault(etype, ([], []))
        conn.append(nodes)
        tags.append(phys)
    return coords, id_map, elems


def _parse_v4(sec) -> Tuple[np.ndarray, Dict[int, int], Dict]:
    lines = sec["Nodes"]
    head = lines[0].split()
    num_blocks, total = int(head[0]), int(head[1])
    ids: List[int] = []
    coords: List[List[float]] = []
    i = 1
    for _ in range(num_blocks):
        _, _, _, n_in_block = (int(x) for x in lines[i].split())
        i += 1
        block_ids = [int(lines[i + j]) for j in range(n_in_block)]
        i += n_in_block
        for j in range(n_in_block):
            parts = lines[i + j].split()
            coords.append([float(parts[0]), float(parts[1]),
                           float(parts[2])])
        i += n_in_block
        ids.extend(block_ids)
    coords_arr = np.asarray(coords)
    id_map = {g: k for k, g in enumerate(ids)}

    elines = sec["Elements"]
    head = elines[0].split()
    num_blocks = int(head[0])
    elems: Dict[str, Tuple[List[List[int]], List[int]]] = {}
    i = 1
    for _ in range(num_blocks):
        _, entity_tag, gtype, n_in_block = (int(x)
                                            for x in elines[i].split())
        i += 1
        etype = _GMSH_TYPES.get(gtype)
        if etype is None:
            print_warning(f"Unsupported GMSH element type: {gtype}, skipping")
            i += n_in_block
            continue
        conn, tags = elems.setdefault(etype, ([], []))
        for j in range(n_in_block):
            parts = [int(x) for x in elines[i + j].split()]
            conn.append(parts[1:])
            tags.append(entity_tag)
        i += n_in_block
    return coords_arr, id_map, elems
