"""topopteval_tpu — TPU-native strain-energy validation of topology-optimized
structures.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
jezekon/TopOptEval.jl (reference mounted read-only at /root/reference):
mesh import (VTU/GMSH/INP), linear-elastic FEM with SIMP density
penalization, matrix-free preconditioned Krylov solves entirely in HBM,
stress recovery, von Mises / principal stress export, and batched/sharded
design sweeps across TPU meshes.

The public surface mirrors the reference facade's re-exports
(reference: src/TopOptEval.jl:17-42) with a functional, array-first idiom.
"""

__version__ = "0.1.0"

import os as _os

# glibc malloc tuning: the host pre-processing path (hierarchy builds,
# oracle assembly) churns GB-scale NumPy temporaries.  glibc mmap()s and
# munmap()s every allocation past its 32 MB dynamic threshold, so each
# reuse re-faults and re-zeroes huge pages — on the bench host that
# zeroing runs at ~400 MB/s and dominated the 1.23M-tet hierarchy build
# (measured: a 24 GB alloc/free loop 63.4 s -> 0.2 s with the thresholds
# raised).  Keep freed memory in the heap and reuse it instead.
if _os.environ.get("TOPOPT_NO_MALLOPT") != "1":
    try:
        import ctypes as _ctypes

        _libc = _ctypes.CDLL(None)
        _libc.mallopt(-3, 2 ** 31 - 1)     # M_MMAP_THRESHOLD
        _libc.mallopt(-1, 2 ** 31 - 1)     # M_TRIM_THRESHOLD
    except Exception:                      # pragma: no cover — non-glibc
        pass

# Hugepage-backed numpy allocator: this host first-touches plain
# malloc'd pages at 8-400 MB/s but MADV_HUGEPAGE regions at ~1.4 GB/s
# (THP defrag=defer+madvise: only madvise'd mappings get synchronous
# hugepages).  The hierarchy build streams multi-GB numpy buffers, so
# installing a PyDataMem handler that mmaps+madvises every allocation
# >= 4 MB removes the dominant page-fault cost (native/np_hugealloc.c).
if _os.environ.get("TOPOPT_NO_HUGEPAGES") != "1":
    try:
        import sys as _sys

        _nat_dir = _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "native")
        if _os.path.exists(_os.path.join(_nat_dir, "np_hugealloc.so")):
            _sys.path.insert(0, _nat_dir)
            try:
                import np_hugealloc as _npha

                _npha.install()
            finally:
                _sys.path.remove(_nat_dir)
    except Exception:                      # pragma: no cover
        pass

# Flush-to-zero/denormals-are-zero for the host float pipeline: SIMP
# values are Emin-scaled down to ~1e-8 and their products reach the
# fp64 subnormal range inside the Galerkin RAP / LAPACK eigensolves,
# where hardware denormal assists cost 2-4x wall-clock (measured:
# rap_chain 59.7 s vs 26.5 s, coarse_pinv 23.0 s vs 4.5 s at 1.23M
# tets).  Magnitudes below 1e-308 carry no physical meaning here.
if _os.environ.get("TOPOPT_NO_FTZ") != "1":
    try:
        from .io.native import load_native as _ln

        _nat = _ln()
        if _nat is not None and _nat.topopt_version() >= 3:
            _nat.topopt_set_ftz(1)
    except Exception:                      # pragma: no cover
        pass

# persistent XLA compile cache by default: TPU backends with remote
# compilation pay minutes per fresh program; a disk cache makes every
# entry point (examples, user scripts) warm-start like the bench tools
if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    _cache = _os.path.join(_os.path.expanduser("~"), ".cache",
                           "topopteval_tpu", "jax")
    _os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache
    try:                       # jax may already be imported — env alone
        import jax as _jax     # would then be read too late
        _jax.config.update("jax_compilation_cache_dir", _cache)
    except Exception:          # pragma: no cover
        pass

# data model
from .mesh import Mesh, DeviceMesh, dofs_of_nodes, element_dofs

# mesh I/O (reference: MeshImport + ResultsExport)
from .api import import_mesh, extract_cell_density, calculate_volume
from .io import read_vtu_mesh, read_cell_density, write_vtu, VTUWriter
from .io.results import (export_results, export_displacement, export_stress,
                         export_boundary_conditions)

# materials (reference: FiniteElementAnalysis materials)
from .materials import (create_material_model, create_simp_material_model,
                        lame_parameters, SIMPMaterial, elasticity_matrix)

# problem workflow (reference: FiniteElementAnalysis core)
from .api import (Problem, SolveResult, setup_problem,
                  assemble_stiffness_matrix, assemble_stiffness_matrix_simp,
                  apply_fixed_boundary, apply_sliding_boundary, apply_force,
                  solve_system, solve_system_simp, solve_system_adaptive,
                  solve_system_robust, solve_system_robust_simp)

# boundary selection (reference: SelectNodesForBC)
from .fem.bc import (select_nodes_by_plane, select_nodes_by_circle,
                     select_nodes_by_set,
                     nodes_at_plane, extract_surface, DirichletBC,
                     free_mask_from_bcs)

# loads (reference: VolumeForce + SurfaceTraction)
from .fem.loads import (apply_volume_force, apply_gravity,
                        apply_acceleration,
                        apply_variable_density_volume_force,
                        get_boundary_facets, compute_boundary_area,
                        apply_surface_traction,
                        apply_uniform_surface_traction)

# solver config (reference: RobustSolver)
from .config import (SolverConfig, large_symmetric_config,
                     large_general_config, memory_efficient_config)

# scaling: geometric multigrid + structured stencil operator
from .fem.multigrid import (MultigridPreconditioner,
                            build_structured_multigrid,
                            build_unstructured_multigrid)
from .fem.structured import StructuredStiffnessOperator

# terminal helpers (reference: Utils.TerminalStyle)
from .utils import (print_info, print_error, print_warning, print_success,
                    print_data, set_verbosity)

__all__ = [
    "Mesh", "DeviceMesh", "dofs_of_nodes", "element_dofs",
    "import_mesh", "extract_cell_density", "calculate_volume",
    "read_vtu_mesh", "read_cell_density", "write_vtu", "VTUWriter",
    "export_results", "export_displacement", "export_stress",
    "export_boundary_conditions",
    "create_material_model", "create_simp_material_model",
    "lame_parameters", "SIMPMaterial", "elasticity_matrix",
    "Problem", "SolveResult", "setup_problem",
    "assemble_stiffness_matrix", "assemble_stiffness_matrix_simp",
    "apply_fixed_boundary", "apply_sliding_boundary", "apply_force",
    "solve_system", "solve_system_simp", "solve_system_adaptive",
    "solve_system_robust", "solve_system_robust_simp",
    "select_nodes_by_plane", "select_nodes_by_circle",
    "select_nodes_by_set", "nodes_at_plane",
    "extract_surface", "DirichletBC", "free_mask_from_bcs",
    "apply_volume_force", "apply_gravity", "apply_acceleration",
    "apply_variable_density_volume_force", "get_boundary_facets",
    "compute_boundary_area", "apply_surface_traction",
    "apply_uniform_surface_traction",
    "SolverConfig", "large_symmetric_config", "large_general_config",
    "memory_efficient_config",
    "MultigridPreconditioner", "build_structured_multigrid",
    "build_unstructured_multigrid",
    "StructuredStiffnessOperator",
    "print_info", "print_error", "print_warning", "print_success",
    "print_data", "set_verbosity",
]
