"""Krylov solvers as jit-compiled ``lax.while_loop`` iterations in HBM.

TPU-native replacement for the reference's Krylov.jl dispatch
(reference: src/FiniteElementAnalysis/RobustSolver.jl:279-507) and the
CHOLMOD direct backslash (FiniteElementAnalysis.jl:547).  Stopping rule
matches Krylov.jl's ``‖r‖ ≤ atol + rtol·‖r0‖`` with
``atol = rtol = tolerance`` (RobustSolver.jl:294-300).

Operators are passed as *pytrees* with a ``.matvec`` method (e.g.
:class:`..fem.operator.StiffnessOperator`) or as dense 2D arrays, so the
whole iteration jits once and reruns for new meshes/densities without
recompilation.  Preconditioners are data, not closures: ``None``, an
inverse-diagonal vector [ndof], or inverted 3x3 node blocks [n_nodes,3,3].

The host scipy sparse direct solve is retained as (a) the small-problem
``:direct`` method and (b) the fp64 test oracle (SURVEY.md §2.3).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DenseOperator:
    """Wrap a dense [n,n] matrix as an operator pytree (tests, small cases)."""

    K: jnp.ndarray

    def matvec(self, u):
        return self.K @ u


jax.tree_util.register_pytree_node(
    DenseOperator, lambda d: ((d.K,), None),
    lambda aux, leaves: DenseOperator(leaves[0]))


def _wrap_operator(A):
    if hasattr(A, "matvec"):
        return A
    A = jnp.asarray(A)
    if A.ndim == 2:
        return DenseOperator(A)
    raise TypeError("A must expose .matvec or be a dense 2D array")


@dataclasses.dataclass(frozen=True)
class KrylovResult:
    """Solution + convergence telemetry (mirrors the Krylov.jl stats fields
    the reference reports, RobustSolver.jl:419-481)."""

    x: jnp.ndarray
    niter: jnp.ndarray            # int32 iterations performed
    residual_norm: jnp.ndarray    # final ‖r‖
    converged: jnp.ndarray        # bool
    history: Optional[jnp.ndarray] = None   # [maxiter+1] ‖r‖ per iteration


def apply_preconditioner(M, r):
    """M is None | inv-diagonal [n] | inverted node blocks [n/3, 3, 3]."""
    if M is None:
        return r
    if M.ndim == 3:
        return jnp.einsum("nab,nb->na", M, r.reshape(-1, 3)).reshape(r.shape)
    return M * r


def _dot(a, b, precise):
    if precise and a.dtype != jnp.float64:
        return jnp.vdot(a.astype(jnp.float64), b.astype(jnp.float64))
    return jnp.vdot(a, b)


# ---------------------------------------------------------------------------
# Conjugate gradients
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("maxiter", "record_history",
                                   "precise_dots"))
def _cg_impl(A, b, x0, tol, M, maxiter, record_history, precise_dots):
    r = b - A.matvec(x0)
    z = apply_preconditioner(M, r)
    p = z
    rz = _dot(r, z, precise_dots)
    rnorm0 = jnp.sqrt(_dot(r, r, precise_dots)).real
    eps = tol + tol * rnorm0   # Krylov.jl: atol + rtol*‖r0‖
    hist0 = (jnp.zeros(maxiter + 1, dtype=jnp.float64)
             .at[0].set(rnorm0.astype(jnp.float64))
             if record_history else jnp.zeros(0, dtype=jnp.float64))

    def cond(state):
        _, _, _, _, it, rnorm, _ = state
        return jnp.logical_and(it < maxiter, rnorm > eps)

    def body(state):
        x, r, p, rz, it, _, hist = state
        Ap = A.matvec(p)
        pAp = _dot(p, Ap, precise_dots)
        alpha = (rz / jnp.where(pAp == 0, 1.0, pAp)).astype(b.dtype)
        x = x + alpha * p
        r = r - alpha * Ap
        z = apply_preconditioner(M, r)
        rz_new = _dot(r, z, precise_dots)
        beta = (rz_new / jnp.where(rz == 0, 1.0, rz)).astype(b.dtype)
        p = z + beta * p
        rnorm = jnp.sqrt(_dot(r, r, precise_dots)).real
        it = it + 1
        if record_history:
            hist = hist.at[it].set(rnorm.astype(jnp.float64))
        return x, r, p, rz_new, it, rnorm, hist

    state = (x0, r, p, rz, jnp.int32(0), rnorm0, hist0)
    x, r, p, rz, it, rnorm, hist = jax.lax.while_loop(cond, body, state)
    return x, it, rnorm, rnorm <= eps, hist


def cg(A, b: jnp.ndarray, x0: Optional[jnp.ndarray] = None,
       M: Optional[jnp.ndarray] = None, tol: float = 1e-8,
       maxiter: int = 10000, record_history: bool = False,
       precise_dots: bool = True) -> KrylovResult:
    """Preconditioned conjugate gradients for SPD operators.

    Equivalent of the reference's ``Krylov.cg`` path
    (RobustSolver.jl:332-338); dots accumulate in fp64 when
    ``precise_dots`` (SURVEY.md §7 hard part 1).
    """
    A = _wrap_operator(A)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    x, it, rnorm, conv, hist = _cg_impl(
        A, b, x0, jnp.asarray(tol, jnp.float64), M, int(maxiter),
        bool(record_history), bool(precise_dots))
    return KrylovResult(x, it, rnorm, conv,
                        hist if record_history else None)


# ---------------------------------------------------------------------------
# Host direct solve (oracle / :direct method)
# ---------------------------------------------------------------------------


def direct_solve(K_csr, f: np.ndarray) -> np.ndarray:
    """Sparse LU on host — the reference's ``u = K \\ f``
    (FiniteElementAnalysis.jl:547) in role and precision (fp64)."""
    from scipy.sparse.linalg import spsolve
    return spsolve(K_csr.tocsc(), np.asarray(f, dtype=np.float64))


# ---------------------------------------------------------------------------
# Preconditioner builders
# ---------------------------------------------------------------------------


def jacobi_preconditioner(diag: jnp.ndarray,
                          guard: float = 1e-12) -> jnp.ndarray:
    """Inverse-diagonal with the reference's zero-diagonal guard
    (RobustSolver.jl:231-237: |d|<1e-12 → 1.0)."""
    safe = jnp.where(jnp.abs(diag) < guard, 1.0, diag)
    return 1.0 / safe


def block_jacobi_preconditioner(blocks: jnp.ndarray,
                                free_mask: jnp.ndarray) -> jnp.ndarray:
    """Inverted 3x3 node blocks of the *constrained* operator.

    Fixed DOFs get identity rows/cols inside their node block so the
    preconditioner agrees with the masked operator.  Much stronger than
    plain Jacobi on SIMP-contrast meshes (SURVEY.md §7 hard part 3).
    """
    m = free_mask.reshape(-1, 3)
    eye = jnp.eye(3, dtype=blocks.dtype)
    bm = blocks * (m[:, :, None] * m[:, None, :]) + (1.0 - m)[:, :, None] * eye
    # guard singular blocks (padded phantom nodes): fall back to identity
    det = jnp.linalg.det(bm)
    bm = jnp.where((jnp.abs(det) < 1e-300)[:, None, None], eye, bm)
    return jnp.linalg.inv(bm)
