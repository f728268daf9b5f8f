"""topopteval_tpu — TPU-native strain-energy validation of topology-optimized
structures.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
jezekon/TopOptEval.jl (reference mounted read-only at /root/reference):
mesh import (VTU/GMSH), linear-elastic FEM with SIMP density penalization,
matrix-free preconditioned Krylov solves entirely in HBM, stress recovery,
von Mises / principal stress export, and batched/sharded design sweeps
across TPU meshes.

The public API mirrors the reference facade's ~30 re-exports
(reference: src/TopOptEval.jl:17-42) with a functional, array-first idiom.
"""

__version__ = "0.1.0"

from .mesh import Mesh, DeviceMesh, dofs_of_nodes, element_dofs
from .io import read_vtu_mesh, read_cell_density, write_vtu, VTUWriter

__all__ = [
    "Mesh", "DeviceMesh", "dofs_of_nodes", "element_dofs",
    "read_vtu_mesh", "read_cell_density", "write_vtu", "VTUWriter",
]
