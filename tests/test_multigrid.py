"""Geometric multigrid tests: transfer transpose property, V-cycle SPD,
MG-PCG convergence + oracle parity, iteration-count superiority."""

import jax.numpy as jnp
import numpy as np
import pytest

from topopteval_tpu.fem.bc import (DirichletBC, free_mask_from_bcs,
                                   nodes_at_plane)
from topopteval_tpu.fem.multigrid import (Transfer, build_structured_multigrid,
                                          build_transfer_tables)
from topopteval_tpu.fem.operator import assemble_scipy
from topopteval_tpu.fem.solvers import (block_jacobi_preconditioner, cg,
                                        direct_solve)
from topopteval_tpu.materials import lame_parameters

LAM, MU = lame_parameters(1.0, 0.3)


def test_transfer_transpose_property():
    parents, weights, inc = build_transfer_tables(4, 2, 2)
    t = Transfer(jnp.asarray(parents), jnp.asarray(weights),
                 jnp.asarray(inc))
    rng = np.random.default_rng(0)
    N_f = parents.shape[0]
    N_c = 3 * 2 * 2 // 8  # placeholder; infer from incidence shape
    N_c = inc.shape[0]
    uc = jnp.asarray(rng.standard_normal((N_c, 3)))
    rf = jnp.asarray(rng.standard_normal((N_f, 3)))
    lhs = float(jnp.vdot(t.prolong(uc), rf))
    rhs = float(jnp.vdot(uc, t.restrict(rf)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_prolong_partition_of_unity():
    parents, weights, inc = build_transfer_tables(4, 4, 2)
    t = Transfer(jnp.asarray(parents), jnp.asarray(weights),
                 jnp.asarray(inc))
    ones = jnp.ones((inc.shape[0], 3))
    np.testing.assert_allclose(np.asarray(t.prolong(ones)), 1.0,
                               rtol=1e-14)


@pytest.fixture(scope="module")
def mg_problem():
    mesh, op, mg = build_structured_multigrid(
        16, 8, 4, (0, 0, 0), (16.0, 8.0, 4.0), LAM, MU,
        dtype=jnp.float64)
    rng = np.random.default_rng(1)
    tip = nodes_at_plane(mesh, 0, 16.0)
    f = np.zeros(mesh.n_dofs)
    f[tip * 3 + 2] = -1.0 / tip.size
    f_dev = jnp.asarray(f) * op.free_mask
    return mesh, op, mg, f_dev


def test_vcycle_is_symmetric(mg_problem):
    mesh, op, mg, f = mg_problem
    rng = np.random.default_rng(2)
    r1 = jnp.asarray(rng.standard_normal(op.n_dofs)) * op.free_mask
    r2 = jnp.asarray(rng.standard_normal(op.n_dofs)) * op.free_mask
    a = float(jnp.vdot(mg.apply(r1), r2))
    b = float(jnp.vdot(r1, mg.apply(r2)))
    np.testing.assert_allclose(a, b, rtol=1e-10)


def test_mg_pcg_matches_oracle_with_few_iterations(mg_problem):
    mesh, op, mg, f = mg_problem
    res = cg(op, f, M=mg, tol=1e-10, maxiter=200)
    assert bool(res.converged)
    assert int(res.niter) < 60, f"MG-PCG took {int(res.niter)} iters"

    # oracle
    mask = np.asarray(op.free_mask)
    K = assemble_scipy(mesh, LAM, MU, free_mask=mask)
    u_o = direct_solve(K, np.asarray(f))
    err = np.linalg.norm(np.asarray(res.x) - u_o) / np.linalg.norm(u_o)
    assert err < 1e-7, f"u err {err:.2e}"

    # iteration superiority vs block-Jacobi
    bj = block_jacobi_preconditioner(op.node_blocks_raw(), op.free_mask)
    res_bj = cg(op, f, M=bj, tol=1e-10, maxiter=5000)
    assert int(res.niter) * 5 < int(res_bj.niter), (
        f"MG {int(res.niter)} vs BJ {int(res_bj.niter)}")


def test_mg_f32(mg_problem):
    """fp32 hierarchy converges to fp32-floor tolerance."""
    mesh32, op32, mg32 = build_structured_multigrid(
        16, 8, 4, (0, 0, 0), (16.0, 8.0, 4.0), LAM, MU,
        dtype=jnp.float32)
    tip = nodes_at_plane(mesh32, 0, 16.0)
    f = np.zeros(mesh32.n_dofs)
    f[tip * 3 + 2] = -1.0 / tip.size
    f32 = jnp.asarray(f, jnp.float32) * op32.free_mask
    res = cg(op32, f32, M=mg32, tol=1e-5, maxiter=150,
             precise_dots=False)
    assert bool(res.converged)
    assert int(res.niter) < 60


def test_host_builders_match_device():
    """The host (NumPy) build path — node blocks, block-Jacobi inverse,
    dense coarse matrix — must match the device computations it
    replaced in build_structured_multigrid."""
    from topopteval_tpu.fem.multigrid import (
        _host_block_jacobi, _host_dense_constrained_matrix,
        _host_node_blocks_structured)
    from topopteval_tpu.fem.structured import StructuredStiffnessOperator
    from topopteval_tpu.models.beams import generate_grid_tet

    nx, ny, nz = 6, 4, 2
    lo, hi = (0.0, 0.0, 0.0), (6.0, 4.0, 2.0)
    mesh = generate_grid_tet(nx, ny, nz, lo, hi)
    fixed = nodes_at_plane(mesh, 0, 0.0)
    mask = free_mask_from_bcs(mesh.n_dofs, [DirichletBC.fixed(fixed)])
    op = StructuredStiffnessOperator.build(
        nx, ny, nz, lo, hi, LAM, MU, free_mask=mask, dtype=jnp.float64)

    # node blocks + block-Jacobi inverse
    host_blocks = _host_node_blocks_structured(op)
    np.testing.assert_allclose(host_blocks, np.asarray(op.node_blocks_raw()),
                               rtol=1e-12, atol=1e-14)
    host_binv = _host_block_jacobi(host_blocks, mask)
    dev_binv = block_jacobi_preconditioner(op.node_blocks_raw(),
                                           op.free_mask)
    np.testing.assert_allclose(host_binv, np.asarray(dev_binv),
                               rtol=1e-10, atol=1e-12)

    # dense constrained matrix vs operator columns
    K_host = _host_dense_constrained_matrix(mesh, LAM, MU, mask)
    rng = np.random.default_rng(3)
    for _ in range(5):
        v = rng.standard_normal(mesh.n_dofs)
        np.testing.assert_allclose(
            K_host @ v, np.asarray(op.matvec(jnp.asarray(v))),
            rtol=1e-10, atol=1e-12)
    # symmetric + SPD on free dofs
    np.testing.assert_allclose(K_host, K_host.T, atol=1e-12)


# ---------------------------------------------------------------------------
# coarsest-level eigencut (gap-based pseudo-inverse)
# ---------------------------------------------------------------------------


def test_coarse_pinv_weights_keeps_low_physics():
    """Slender-beam shape: junk cluster at 1e-16, bending physics at
    1e-8..1e-6 relative.  The old fixed fp32 cutoff (1e-6) zeroed the
    physics; the gap cut must keep it while still zeroing the junk."""
    from topopteval_tpu.fem.multigrid import coarse_pinv_weights
    lam_max = 1.0e4
    junk = np.full(168, 1e-16) * lam_max
    physics = np.array([2e-8, 6e-7]) * lam_max
    bulk = np.linspace(1e-3, 1.0, 50) * lam_max
    evals = np.concatenate([junk, physics, bulk])
    w = coarse_pinv_weights(evals, jnp.float32)
    assert np.all(w[:168] == 0.0)                         # junk zeroed
    np.testing.assert_allclose(w[168:170], 1.0 / physics)  # physics kept
    np.testing.assert_allclose(w[170:], 1.0 / bulk)


def test_coarse_pinv_weights_continuum_falls_back():
    """SIMP void-mode continuum (no clean gap): fall back to the legacy
    fixed ceiling — the behavior that fixed the porous-fixture stall."""
    from topopteval_tpu.fem.multigrid import coarse_pinv_weights
    lam_max = 1.0
    low = np.logspace(-14, -6.2, 40)   # dense, max ratio ~ 1.6 < 1e3
    bulk = np.linspace(1e-4, 1.0, 20)
    evals = np.concatenate([low, bulk])
    w = coarse_pinv_weights(evals, jnp.float32)
    assert np.all(w[:40] == 0.0)                    # all below 1e-6 cut
    np.testing.assert_allclose(w[40:], 1.0 / bulk)


def test_coarse_pinv_weights_full_rank_keeps_all():
    """No numerical zeros at all: the operator is honestly invertible,
    the exact inverse is the ideal coarse solve — keep every mode."""
    from topopteval_tpu.fem.multigrid import coarse_pinv_weights
    evals = np.concatenate([[3e-8, 4e-7], np.linspace(1e-4, 1.0, 20)])
    w = coarse_pinv_weights(evals, jnp.float32)
    np.testing.assert_allclose(w, 1.0 / evals)
    # fp64 ceiling branch: same outcome
    w64 = coarse_pinv_weights(evals, jnp.float64)
    np.testing.assert_allclose(w64, 1.0 / evals)


def test_coarse_pinv_weights_negative_and_zero_modes():
    from topopteval_tpu.fem.multigrid import coarse_pinv_weights
    evals = np.array([-1e-3, 0.0, 1e-16, 0.5, 1.0])
    w = coarse_pinv_weights(evals, jnp.float32)
    assert np.all(w[:3] == 0.0)
    np.testing.assert_allclose(w[3:], [2.0, 1.0])
