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
import functools
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

# NOTE: these einsums deliberately use DEFAULT matmul precision.
# precision="highest" turns tiny-dim einsums into MXU dot_generals whose
# operand layouts pad the minor dims 3/4 up to (8,128) tiles — a 42x HBM
# blowup that OOMed the 1M-tet hierarchy build (docs/PERF_NOTES.md).  The
# bf16-pass accuracy hazard only matters on CG-path operators; those live
# in parallel/sweep.py and fem/ell.py, which keep precision="highest".
_einsum = jnp.einsum

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
    """M is None | inv-diagonal [n] | inverted node blocks [n/3, 3, 3] |
    any pytree with an ``.apply(r)`` method (e.g. the multigrid V-cycle,
    fem/multigrid.py)."""
    if M is None:
        return r
    if hasattr(M, "apply"):
        return M.apply(r)
    if M.ndim == 3:
        return _einsum("nab,nb->na", M, r.reshape(-1, 3)).reshape(r.shape)
    return M * r


def precise_dtype():
    """float64 when x64 is enabled (CPU parity runs), else float32
    (TPU throughput runs) — avoids silent-truncation warnings."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def _dot(a, b, precise):
    pd = precise_dtype()
    if precise and a.dtype != pd:
        return jnp.vdot(a.astype(pd), b.astype(pd))
    return jnp.vdot(a, b)


# ---------------------------------------------------------------------------
# Conjugate gradients
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("maxiter", "record_history",
                                   "precise_dots", "unroll"))
def _cg_impl(A, b, x0, tol, M, maxiter, record_history, precise_dots,
             unroll):
    r = b - A.matvec(x0)
    z = apply_preconditioner(M, r)
    p = z
    rz = _dot(r, z, precise_dots)
    rnorm0 = jnp.sqrt(_dot(r, r, precise_dots)).real
    eps = tol + tol * rnorm0   # Krylov.jl: atol + rtol*‖r0‖
    # NOTE: the history buffer is only part of the loop carry when actually
    # recording — a zero-sized placeholder array in the while_loop carry
    # miscompiled on the axon TPU backend (cg() diverged while an identical
    # hand-rolled loop without it matched; tools/tpu_check_struct9.py)
    hist0 = (jnp.zeros(maxiter + 1, dtype=precise_dtype())
             .at[0].set(rnorm0.astype(precise_dtype()))
             if record_history else None)

    def cond(state):
        it, rnorm = state[4], state[5]
        return jnp.logical_and(it < maxiter, rnorm > eps)

    def one_iteration(x, r, p, rz, it, hist):
        Ap = A.matvec(p)
        pAp = _dot(p, Ap, precise_dots)
        alpha = (rz / jnp.where(pAp == 0, 1.0, pAp)).astype(b.dtype)
        x = x + alpha * p
        r = r - alpha * Ap
        z = apply_preconditioner(M, r)
        rz_new = _dot(r, z, precise_dots)
        beta = (rz_new / jnp.where(rz == 0, 1.0, rz)).astype(b.dtype)
        p = z + beta * p
        it = it + 1
        if record_history:
            rn = jnp.sqrt(_dot(r, r, precise_dots)).real
            hist = hist.at[it].set(rn.astype(precise_dtype()))
        return x, r, p, rz_new, it, hist

    def body(state):
        x, r, p, rz, it = state[:5]
        hist = state[6] if record_history else None
        # `unroll` CG iterations per loop step: on backends with per-step
        # dispatch overhead (axon tunnel ~5 ms/step, tools/tpu_bisect5)
        # this amortizes the fixed cost without changing the math
        for _ in range(unroll):
            x, r, p, rz, it, hist = one_iteration(x, r, p, rz, it, hist)
        rnorm = jnp.sqrt(_dot(r, r, precise_dots)).real
        out = (x, r, p, rz, it, rnorm)
        return out + ((hist,) if record_history else ())

    state = (x0, r, p, rz, jnp.int32(0), rnorm0)
    if record_history:
        state = state + (hist0,)
    out = jax.lax.while_loop(cond, body, state)
    x, it, rnorm = out[0], out[4], out[5]
    hist = out[6] if record_history else jnp.zeros(0, dtype=precise_dtype())
    return x, it, rnorm, rnorm <= eps, hist


def cg(A, b: jnp.ndarray, x0: Optional[jnp.ndarray] = None,
       M: Optional[jnp.ndarray] = None, tol: float = 1e-8,
       maxiter: int = 10000, record_history: bool = False,
       precise_dots: bool = True, unroll: int = 1) -> KrylovResult:
    """Preconditioned conjugate gradients for SPD operators.

    Equivalent of the reference's ``Krylov.cg`` path
    (RobustSolver.jl:332-338); dots accumulate in fp64 when
    ``precise_dots`` (SURVEY.md §7 hard part 1).
    """
    A = _wrap_operator(A)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    x, it, rnorm, conv, hist = _cg_impl(
        A, b, x0, jnp.asarray(tol, precise_dtype()), M, int(maxiter),
        bool(record_history), bool(precise_dots), int(unroll))
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
    from ..ops.elements import _inv3x3
    m = free_mask.reshape(-1, 3)
    eye = jnp.eye(3, dtype=blocks.dtype)
    bm = blocks * (m[:, :, None] * m[:, None, :]) + (1.0 - m)[:, :, None] * eye
    # adjugate-based batched inverse (VPU-friendly; no LAPACK custom call)
    inv, det = _inv3x3(bm)
    # guard singular blocks (padded phantom nodes): fall back to identity
    return jnp.where((det == 0)[:, None, None], eye, inv)


# ---------------------------------------------------------------------------
# MINRES — symmetric (possibly indefinite) systems
# (reference dispatches :minres for symmetric-indefinite matrices,
#  RobustSolver.jl:210-211, 340-345)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("maxiter", "record_history",
                                   "precise_dots"))
def _minres_impl(A, b, x0, tol, M, maxiter, record_history, precise_dots):
    """Paige–Saunders MINRES with optional SPD preconditioning (textbook
    Lanczos + Givens recurrence)."""
    dtype = b.dtype
    r1 = b - A.matvec(x0)
    y = apply_preconditioner(M, r1)
    beta1 = jnp.sqrt(jnp.maximum(_dot(r1, y, precise_dots).real, 0.0))
    eps0 = tol + tol * beta1
    # NOTE: as in _cg_impl, the history buffer joins the loop carry ONLY
    # when recording — a zero-length placeholder array in the while_loop
    # carry is a known silent-miscompile trigger on the axon TPU backend
    # (tools/tpu_check_struct9.py)
    hist0 = (jnp.zeros(maxiter + 1, dtype=precise_dtype())
             .at[0].set(beta1.astype(precise_dtype()))
             if record_history else None)

    zero = jnp.zeros_like(b)
    one = jnp.asarray(1.0, precise_dtype())

    # carry: x, r1, r2, y, w, w2, oldb, beta, dbar, epsln, phibar, cs, sn,
    #        it, rnorm [, hist]
    def cond(st):
        it, rnorm = st[13], st[14]
        return jnp.logical_and(it < maxiter, rnorm > eps0)

    def body(st):
        (x, r1, r2, y, w, w2, oldb, beta, dbar, epsln, phibar, cs, sn,
         it, _) = st[:15]
        hist = st[15] if record_history else None
        s = 1.0 / beta
        pd = precise_dtype()
        v = (s * y.astype(pd)).astype(dtype)
        yv = A.matvec(v)
        yv = jnp.where(it >= 1, yv - (beta / oldb).astype(dtype) * r1, yv)
        alfa = _dot(v, yv, precise_dots).real
        yv = yv - (alfa / beta).astype(dtype) * r2
        r1n, r2n = r2, yv
        yn = apply_preconditioner(M, r2n)
        oldb_n = beta
        beta_n = jnp.sqrt(jnp.maximum(_dot(r2n, yn, precise_dots).real, 0.0))
        oldeps = epsln
        delta = cs * dbar + sn * alfa
        gbar = sn * dbar - cs * alfa
        epsln_n = sn * beta_n
        dbar_n = -cs * beta_n
        gamma = jnp.maximum(jnp.sqrt(gbar * gbar + beta_n * beta_n), 1e-300)
        cs_n = gbar / gamma
        sn_n = beta_n / gamma
        phi = cs_n * phibar
        phibar_n = sn_n * phibar
        w1 = w2
        w2n = w
        wn = ((v.astype(pd)
               - oldeps * w1.astype(pd)
               - delta * w2n.astype(pd)) / gamma).astype(dtype)
        xn = x + phi.astype(dtype) * wn
        it = it + 1
        out = (xn, r1n, r2n, yn, wn, w2n, oldb_n, beta_n, dbar_n, epsln_n,
               phibar_n, cs_n, sn_n, it, phibar_n)
        if record_history:
            hist = hist.at[it].set(phibar_n.astype(precise_dtype()))
            out = out + (hist,)
        return out

    st0 = (x0, r1, r1, y, zero, zero, one * 0.0, beta1,
           jnp.asarray(0.0, precise_dtype()), jnp.asarray(0.0, precise_dtype()),
           beta1, jnp.asarray(-1.0, precise_dtype()),
           jnp.asarray(0.0, precise_dtype()), jnp.int32(0), beta1)
    if record_history:
        st0 = st0 + (hist0,)
    st = jax.lax.while_loop(cond, body, st0)
    x, it = st[0], st[13]
    hist = st[15] if record_history else jnp.zeros(0, dtype=precise_dtype())
    # report the true residual (the reference verifies ‖Ku−f‖,
    # RobustSolver.jl:469)
    rtrue = b - A.matvec(x)
    rnorm = jnp.sqrt(_dot(rtrue, rtrue, precise_dots)).real
    return x, it, rnorm, st[14] <= eps0, hist


def minres(A, b, x0=None, M=None, tol: float = 1e-8, maxiter: int = 10000,
           record_history: bool = False, precise_dots: bool = True
           ) -> KrylovResult:
    """MINRES for symmetric (indefinite) operators; preconditioner must be
    SPD (ours are)."""
    A = _wrap_operator(A)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    x, it, rnorm, conv, hist = _minres_impl(
        A, b, x0, jnp.asarray(tol, precise_dtype()), M, int(maxiter),
        bool(record_history), bool(precise_dots))
    return KrylovResult(x, it, rnorm, conv,
                        hist if record_history else None)


# ---------------------------------------------------------------------------
# BiCGSTAB — general matrices, memory-lean
# (reference: RobustSolver.jl:370-376; preset :780-788)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("maxiter", "record_history",
                                   "precise_dots"))
def _bicgstab_impl(A, b, x0, tol, M, maxiter, record_history, precise_dots):
    """van der Vorst BiCGSTAB with right preconditioning."""
    dtype = b.dtype
    r = b - A.matvec(x0)
    rhat = r
    rnorm0 = jnp.sqrt(_dot(r, r, precise_dots)).real
    eps0 = tol + tol * rnorm0
    zero = jnp.zeros_like(b)
    # see _cg_impl NOTE: no zero-length history placeholder in the carry
    # (axon while_loop miscompile class)
    hist0 = (jnp.zeros(maxiter + 1, dtype=precise_dtype())
             .at[0].set(rnorm0.astype(precise_dtype()))
             if record_history else None)
    one64 = jnp.asarray(1.0, precise_dtype())

    def cond(st):
        it, rnorm = st[7], st[8]
        return jnp.logical_and(it < maxiter, rnorm > eps0)

    def body(st):
        x, r, p, v, rho, alpha, omega, it, _ = st[:9]
        hist = st[9] if record_history else None
        rho_n = _dot(rhat, r, precise_dots)
        beta = (rho_n / jnp.where(rho == 0, 1.0, rho)) \
            * (alpha / jnp.where(omega == 0, 1.0, omega))
        p = r + beta.astype(dtype) * (p - omega.astype(dtype) * v)
        phat = apply_preconditioner(M, p)
        v_n = A.matvec(phat)
        denom = _dot(rhat, v_n, precise_dots)
        alpha_n = rho_n / jnp.where(denom == 0, 1.0, denom)
        s = r - alpha_n.astype(dtype) * v_n
        shat = apply_preconditioner(M, s)
        t = A.matvec(shat)
        tt = _dot(t, t, precise_dots)
        omega_n = _dot(t, s, precise_dots) / jnp.where(tt == 0, 1.0, tt)
        x = x + alpha_n.astype(dtype) * phat + omega_n.astype(dtype) * shat
        r = s - omega_n.astype(dtype) * t
        rnorm = jnp.sqrt(_dot(r, r, precise_dots)).real
        it = it + 1
        out = (x, r, p, v_n, rho_n, alpha_n, omega_n, it, rnorm)
        if record_history:
            hist = hist.at[it].set(rnorm.astype(precise_dtype()))
            out = out + (hist,)
        return out

    st0 = (x0, r, zero, zero, one64, one64, one64, jnp.int32(0), rnorm0)
    if record_history:
        st0 = st0 + (hist0,)
    st = jax.lax.while_loop(cond, body, st0)
    x, it, rnorm = st[0], st[7], st[8]
    hist = st[9] if record_history else jnp.zeros(0, dtype=precise_dtype())
    return x, it, rnorm, rnorm <= eps0, hist


def bicgstab(A, b, x0=None, M=None, tol: float = 1e-8, maxiter: int = 10000,
             record_history: bool = False, precise_dots: bool = True
             ) -> KrylovResult:
    A = _wrap_operator(A)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    x, it, rnorm, conv, hist = _bicgstab_impl(
        A, b, x0, jnp.asarray(tol, precise_dtype()), M, int(maxiter),
        bool(record_history), bool(precise_dots))
    return KrylovResult(x, it, rnorm, conv,
                        hist if record_history else None)


# ---------------------------------------------------------------------------
# GMRES(restart) — left-preconditioned, Givens-rotation Arnoldi, as a
# jitted while_loop (reference: RobustSolver.jl:348-368, restart default 30;
# Krylov.jl converges on the preconditioned residual with atol+rtol·‖r0‖).
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("maxiter", "restart", "record_history",
                                   "precise_dots"))
def _gmres_impl(A, b, x0, tol, M, maxiter, restart, record_history,
                precise_dots):
    m = restart
    dtype = b.dtype
    pd = precise_dtype()
    n = b.shape[0]

    def prec(r):
        return apply_preconditioner(M, r)

    def pnorm(r):
        return jnp.sqrt(jnp.maximum(_dot(r, r, precise_dots).real, 0.0))

    r0 = prec(b - A.matvec(x0))
    beta0 = pnorm(r0)
    eps0 = (tol + tol * beta0).astype(pd)
    hist0 = (jnp.zeros(maxiter + 1, dtype=pd).at[0].set(beta0.astype(pd))
             if record_history else None)

    def inner_cond(st):
        j, res = st[0], st[1]
        it = st[2]
        return jnp.logical_and(jnp.logical_and(j < m, res > eps0),
                               it < maxiter)

    def inner_body(st):
        j, _, it, V, Hr, cs, sn, g = st[:8]
        hist = st[8] if record_history else None
        w = prec(A.matvec(V[j].astype(dtype)))
        # modified Gram-Schmidt against all rows: rows > j are still zero,
        # so the extra subtractions are exact no-ops (keeps shapes static)
        def mgs(i, wh):
            w_, h_ = wh
            hij = _dot(V[i].astype(dtype), w_, precise_dots)
            return (w_ - hij.astype(dtype) * V[i].astype(dtype),
                    h_.at[i].set(hij.astype(pd)))
        w, hcol = jax.lax.fori_loop(0, m + 1, mgs,
                                    (w, jnp.zeros(m + 1, dtype=pd)))
        hnorm = pnorm(w)
        hcol = hcol.at[j + 1].set(hnorm.astype(pd))
        V = V.at[j + 1].set(
            jnp.where(hnorm > 0, w / jnp.where(hnorm == 0, 1.0, hnorm),
                      jnp.zeros_like(w)))
        # apply stored Givens rotations; slots >= j still hold the identity
        # (cs=1, sn=0) so a static-bound loop is exact
        def rot(i, h_):
            hi, hi1 = h_[i], h_[i + 1]
            return (h_.at[i].set(cs[i] * hi + sn[i] * hi1)
                    .at[i + 1].set(-sn[i] * hi + cs[i] * hi1))
        hcol = jax.lax.fori_loop(0, m, rot, hcol)
        # new rotation eliminating hcol[j+1]
        denom = jnp.sqrt(hcol[j] ** 2 + hcol[j + 1] ** 2)
        safe = jnp.where(denom == 0, 1.0, denom)
        c_new = jnp.where(denom == 0, 1.0, hcol[j] / safe)
        s_new = jnp.where(denom == 0, 0.0, hcol[j + 1] / safe)
        cs = cs.at[j].set(c_new)
        sn = sn.at[j].set(s_new)
        hcol = hcol.at[j].set(c_new * hcol[j] + s_new * hcol[j + 1])
        hcol = hcol.at[j + 1].set(0.0)
        g_j1 = -s_new * g[j]
        g = g.at[j + 1].set(g_j1).at[j].set(c_new * g[j])
        Hr = Hr.at[:, j].set(hcol)
        res = jnp.abs(g_j1)
        it = it + 1
        out = (j + 1, res, it, V, Hr, cs, sn, g)
        if record_history:
            hist = hist.at[it].set(res)
            out = out + (hist,)
        return out

    def outer_cond(st):
        it, res = st[1], st[2]
        return jnp.logical_and(it < maxiter, res > eps0)

    def outer_body(st):
        x, it, _ = st[:3]
        hist = st[3] if record_history else None
        r = prec(b - A.matvec(x))
        beta = pnorm(r)
        safe_b = jnp.where(beta == 0, 1.0, beta)
        V = jnp.zeros((m + 1, n), dtype).at[0].set(
            (r / safe_b).astype(dtype))
        Hr = jnp.zeros((m + 1, m), dtype=pd)   # post-rotation (triangular)
        cs = jnp.ones(m, dtype=pd)
        sn = jnp.zeros(m, dtype=pd)
        g = jnp.zeros(m + 1, dtype=pd).at[0].set(beta.astype(pd))
        inner0 = (jnp.int32(0), beta.astype(pd), it, V, Hr, cs, sn, g)
        if record_history:
            inner0 = inner0 + (hist,)
        inner = jax.lax.while_loop(inner_cond, inner_body, inner0)
        j_end, res, it, V, Hr = inner[0], inner[1], inner[2], inner[3], \
            inner[4]
        g = inner[7]
        if record_history:
            hist = inner[8]
        # back substitution on the rotated (upper-triangular) H, columns
        # beyond j_end masked out
        def back(i_rev, y):
            i = m - 1 - i_rev
            num = g[i] - _dot(Hr[i], y, False)
            dii = Hr[i, i]
            yi = jnp.where(i < j_end,
                           num / jnp.where(dii == 0, 1.0, dii), 0.0)
            return y.at[i].set(yi)
        y = jax.lax.fori_loop(0, m, back, jnp.zeros(m, dtype=pd))
        x = x + (y.astype(dtype) @ V[:m])
        out = (x, it, res)
        return out + ((hist,) if record_history else ())

    st0 = (x0, jnp.int32(0), beta0.astype(pd))
    if record_history:
        st0 = st0 + (hist0,)
    out = jax.lax.while_loop(outer_cond, outer_body, st0)
    x, it, res = out[0], out[1], out[2]
    hist = out[3] if record_history else jnp.zeros(0, dtype=pd)
    # report the true (unpreconditioned) residual like the reference's
    # post-solve verification (RobustSolver.jl:469)
    rtrue = b - A.matvec(x)
    rnorm = jnp.sqrt(_dot(rtrue, rtrue, precise_dots)).real
    return x, it, rnorm, res <= eps0, hist


def gmres(A, b, x0=None, M=None, tol: float = 1e-8, maxiter: int = 10000,
          restart: int = 30, record_history: bool = False,
          precise_dots: bool = True) -> KrylovResult:
    """Restarted GMRES with left preconditioning, own implementation
    (niter/history telemetry like the other methods; the round-1 jax.scipy
    delegate reported niter=-1 and no history).

    Mirrors the reference's restart-failure retry (RobustSolver.jl:353-368,
    which retries without the restart kwarg → unrestarted GMRES): on
    non-convergence with a small restart, one retry with the Krylov space
    widened to min(maxiter, n, 200).
    """
    A = _wrap_operator(A)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    n = b.shape[0]
    restart = max(1, min(int(restart), n, int(maxiter)))
    x, it, rnorm, conv, hist = _gmres_impl(
        A, b, x0, jnp.asarray(tol, precise_dtype()), M, int(maxiter),
        restart, bool(record_history), bool(precise_dots))
    if not bool(conv):
        wide = min(int(maxiter), n, 200)
        if wide > restart:
            from ..utils.terminal import log
            log(f"GMRES(restart={restart}) did not converge; retrying "
                f"unrestarted (m={wide})")
            x, it2, rnorm, conv, hist = _gmres_impl(
                A, b, x0, jnp.asarray(tol, precise_dtype()), M,
                int(maxiter), wide, bool(record_history),
                bool(precise_dots))
            it = it + it2
    return KrylovResult(x, it, rnorm, conv,
                        hist if record_history else None)
