"""Backward-error verification gate covers EVERY iterative method.

Round-2 VERDICT weak #3: the miscompile-detection gate only guarded the
CG path; MINRES/BiCGSTAB/GMRES results were unverified.  These tests
inject a deliberately-wrong "converged" solution into each solver route
and assert solve_system detects it and falls back to the host direct
solve (reference posture: RobustSolver.jl:469 true-residual check).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import topopteval_tpu.api as api
import topopteval_tpu.fem.robust as robust
from topopteval_tpu.api import (apply_fixed_boundary, apply_force,
                                assemble_stiffness_matrix, setup_problem,
                                solve_system)
from topopteval_tpu.config import SolverConfig
from topopteval_tpu.fem.bc import nodes_at_plane
from topopteval_tpu.fem.solvers import KrylovResult
from topopteval_tpu.materials import lame_parameters

LAM, MU = lame_parameters(1.0, 0.3)


def _problem():
    from topopteval_tpu.models.beams import generate_grid_tet
    mesh = generate_grid_tet(4, 2, 2, (0, 0, 0), (4, 2, 2))
    problem = setup_problem(mesh)
    assemble_stiffness_matrix(problem, LAM, MU)
    apply_fixed_boundary(problem, nodes_at_plane(mesh, 0, 0.0))
    apply_force(problem, nodes_at_plane(mesh, 0, 4.0), [0, 0, -1.0])
    return problem


def test_gate_trips_on_corrupted_cg(monkeypatch):
    problem = _problem()
    real_cg = api.cg

    def bad_cg(A, b, **kw):
        res = real_cg(A, b, **kw)
        # corrupt the solution but keep the reported convergence flag
        return KrylovResult(res.x * 1.5 + 1.0, res.niter,
                            res.residual_norm, jnp.bool_(True),
                            res.history)

    monkeypatch.setattr(api, "cg", bad_cg)
    cfg = SolverConfig(method="cg", preconditioner="diagonal",
                       tolerance=1e-10, max_iterations=2000,
                       verbose=False)   # verbose=False -> the fast cg path
    res = solve_system(problem, cfg)
    assert res.method == "direct(verification-fallback)"
    assert res.converged


@pytest.mark.parametrize("method", ["minres", "bicgstab", "gmres"])
def test_gate_trips_on_corrupted_krylov(monkeypatch, method):
    problem = _problem()

    def bad_solve(op, f_dev, m, config):
        u = jnp.ones(op.n_dofs, problem.dtype) * op.free_mask
        return u, 10, 1e-12, True, None, m

    monkeypatch.setattr(robust, "solve_with_krylov", bad_solve)
    cfg = SolverConfig(method=method, preconditioner="diagonal",
                       tolerance=1e-8, max_iterations=2000, verbose=True)
    res = solve_system(problem, cfg)
    assert res.method == "direct(verification-fallback)"
    assert res.converged


@pytest.mark.parametrize("method", ["minres", "gmres"])
def test_gate_passes_honest_krylov(method):
    problem = _problem()
    cfg = SolverConfig(method=method, preconditioner="diagonal",
                       tolerance=1e-10, max_iterations=5000, verbose=True)
    res = solve_system(problem, cfg)
    assert res.converged
    assert not res.method.startswith("direct")
