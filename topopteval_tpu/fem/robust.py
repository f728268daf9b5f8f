"""Robust-solver layer: auto method selection, fallbacks, diagnostics.

TPU-native equivalent of the reference's RobustSolver module
(reference: src/FiniteElementAnalysis/RobustSolver.jl).  Filled out in
stages; see fem/solvers.py for the Krylov iterations themselves.
"""

from __future__ import annotations

import numpy as np

from ..config import SolverConfig


def solve_with_method(op, f, method: str, config: SolverConfig):
    """Dispatch to a Krylov method; returns (u, niter, rnorm, conv, hist)."""
    from .solvers import cg, minres, bicgstab, gmres
    from ..api import _build_preconditioner
    M = _build_preconditioner(op, config)
    fn = {"cg": cg, "minres": minres, "bicgstab": bicgstab}.get(method)
    if fn is not None:
        res = fn(op, f, M=M, tol=config.tolerance,
                 maxiter=config.max_iterations,
                 record_history=config.history)
    elif method == "gmres":
        res = gmres(op, f, M=M, tol=config.tolerance,
                    maxiter=config.max_iterations, restart=config.restart,
                    record_history=config.history)
    else:
        raise ValueError(f"Unknown Krylov method: {method}")
    hist = (np.asarray(res.history)[: int(res.niter) + 1]
            if res.history is not None else None)
    return (res.x, int(res.niter), float(res.residual_norm),
            bool(res.converged), hist)
