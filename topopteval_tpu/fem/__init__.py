from .bc import (DirichletBC, extract_surface, free_mask_from_bcs,
                 nodes_at_plane, select_nodes_by_circle,
                 select_nodes_by_plane)
from .multigrid import (MultigridPreconditioner, build_structured_multigrid,
                        build_unstructured_multigrid)
from .operator import StiffnessOperator, assemble_scipy
from .solvers import (bicgstab, block_jacobi_preconditioner, cg,
                      direct_solve, gmres, jacobi_preconditioner, minres)

__all__ = ["DirichletBC", "extract_surface", "free_mask_from_bcs",
           "nodes_at_plane", "select_nodes_by_circle",
           "select_nodes_by_plane", "MultigridPreconditioner",
           "build_structured_multigrid", "build_unstructured_multigrid",
           "StiffnessOperator",
           "assemble_scipy", "bicgstab", "block_jacobi_preconditioner",
           "cg", "direct_solve", "gmres", "jacobi_preconditioner",
           "minres"]
