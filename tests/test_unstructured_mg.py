"""Unstructured (voxel-embedded Galerkin) multigrid + public-API wiring.

Round-2 VERDICT items 1+2: the fast solve path must work for ARBITRARY
imported meshes (reference: FiniteElementAnalysis.jl:547 — any-mesh solve)
and be reachable via SolverConfig(preconditioner="multigrid") through
solve_system / solve_system_adaptive.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from topopteval_tpu.api import (apply_fixed_boundary, apply_force,
                                assemble_stiffness_matrix, import_mesh,
                                setup_problem, solve_system,
                                solve_system_adaptive)
from topopteval_tpu.config import SolverConfig
from topopteval_tpu.fem.bc import (DirichletBC, free_mask_from_bcs,
                                   nodes_at_plane)
from topopteval_tpu.fem.ell import ELLBlockOperator
from topopteval_tpu.fem.multigrid import (Transfer, build_voxel_transfer,
                                          build_unstructured_multigrid,
                                          galerkin_voxel_operator,
                                          propagate_fixed)
from topopteval_tpu.fem.operator import StiffnessOperator, assemble_scipy
from topopteval_tpu.fem.solvers import cg, direct_solve
from topopteval_tpu.materials import lame_parameters
from topopteval_tpu.models.beams import generate_grid_tet

LAM, MU = lame_parameters(1.0, 0.3)


# Module-scoped fixture mesh + hierarchy: importing the 8,121-tet VTU
# and building its fp64 Galerkin hierarchy dominates this module's
# wall-clock — share one instance (round-4 VERDICT #6).


@pytest.fixture(scope="module")
def fmesh(beam_tet_path):
    return import_mesh(beam_tet_path)


@pytest.fixture(scope="module")
def fmask(fmesh):
    fixed = nodes_at_plane(fmesh, 0, 0.0, tol=1e-6)
    return free_mask_from_bcs(fmesh.n_dofs, [DirichletBC.fixed(fixed)])


@pytest.fixture(scope="module")
def fmg(fmesh, fmask):
    return build_unstructured_multigrid(fmesh, LAM, MU, free_mask=fmask,
                                        dtype=jnp.float64)


# ---------------------------------------------------------------------------
# ELL operator
# ---------------------------------------------------------------------------


def _random_block_spd(n, seed=0):
    rng = np.random.default_rng(seed)
    A = sp.random(3 * n, 3 * n, density=0.1, random_state=rng.integers(1e6))
    A = (A + A.T + sp.eye(3 * n) * 10).tocsr()
    return A


def test_ell_matvec_matches_scipy():
    n = 17
    A = _random_block_spd(n)
    mask = np.ones(3 * n)
    op = ELLBlockOperator.from_scipy_bsr(A, mask, jnp.float64)
    x = np.random.default_rng(1).standard_normal(3 * n)
    np.testing.assert_allclose(np.asarray(op.matvec(jnp.asarray(x))),
                               A @ x, rtol=1e-12, atol=1e-12)
    # roundtrip
    back = op.to_scipy_bsr()
    np.testing.assert_allclose(back.toarray(), A.toarray(), atol=1e-12)


def test_ell_constrained_and_blocks():
    n = 9
    A = _random_block_spd(n, seed=2)
    mask = np.ones(3 * n)
    mask[:6] = 0.0
    op = ELLBlockOperator.from_scipy_bsr(A, mask, jnp.float64)
    x = np.random.default_rng(3).standard_normal(3 * n)
    m = mask
    expect = m * (A @ (m * x)) + (1 - m) * x
    np.testing.assert_allclose(np.asarray(op.matvec(jnp.asarray(x))),
                               expect, rtol=1e-12, atol=1e-12)
    blocks = np.asarray(op.node_blocks_raw())
    dense = A.toarray()
    for i in range(n):
        np.testing.assert_allclose(blocks[i],
                                   dense[3 * i: 3 * i + 3,
                                         3 * i: 3 * i + 3], atol=1e-12)


# ---------------------------------------------------------------------------
# Galerkin probing exactness
# ---------------------------------------------------------------------------


def test_galerkin_probe_matches_explicit_rap(fmesh, fmask):
    mesh, mask = fmesh, fmask
    dm = mesh.device(dtype=jnp.float64)
    op = StiffnessOperator.build(
        dm, np.full(mesh.n_cells, LAM), np.full(mesh.n_cells, MU),
        free_mask=jnp.asarray(mask, jnp.float64))
    lo, hi = mesh.bounding_box()
    dims = (10, 4, 2)
    parents, weights, inc = build_voxel_transfer(mesh.coords, lo, hi, dims)
    tr = Transfer(jnp.asarray(parents), jnp.asarray(weights, jnp.float64),
                  jnp.asarray(inc))
    N_c = 11 * 5 * 3
    fixed_c = propagate_fixed(parents, weights, mask.reshape(-1, 3) == 0,
                              N_c)
    mask_c = np.where(fixed_c, 0.0, 1.0).reshape(-1)
    ell, mask_c2 = galerkin_voxel_operator(op, tr, mask_c, dims,
                                           dtype=jnp.float64)
    A_probe = ell.to_scipy_bsr().toarray()

    K = assemble_scipy(mesh, LAM, MU, free_mask=mask)
    live = weights > 0
    rows = np.repeat(np.arange(mesh.n_nodes), 8).reshape(-1, 8)[live]
    P = sp.coo_matrix((weights[live], (rows, parents[live])),
                      shape=(mesh.n_nodes, N_c)).tocsr()
    P_dof = sp.kron(P, sp.eye(3), format="csr")
    Mf = sp.diags(mask)
    Mc = sp.diags(mask_c)
    A_exact = (Mc @ P_dof.T @ Mf @ K @ Mf @ P_dof @ Mc).toarray()
    scale = np.abs(A_exact).max()
    np.testing.assert_allclose(A_probe, A_exact, atol=1e-10 * scale)


# ---------------------------------------------------------------------------
# Convergence on a genuinely unstructured imported mesh
# ---------------------------------------------------------------------------


def test_unstructured_mg_converges_on_fixture(fmesh, fmask, fmg):
    """Imported (porous, topology-optimized) tet mesh: MG-PCG must reach
    tight tolerance in a small fraction of the block-Jacobi count and
    match the fp64 direct oracle."""
    mesh, mask = fmesh, fmask
    tip = nodes_at_plane(mesh, 0, 60.0, tol=1e-6)
    f = np.zeros(mesh.n_dofs)
    f[tip * 3 + 2] = -1.0 / tip.size

    op, mg = fmg
    b = jnp.asarray(f) * op.free_mask
    res = cg(op, b, M=mg, tol=1e-10, maxiter=300)
    assert bool(res.converged), int(res.niter)
    assert int(res.niter) < 200

    K = assemble_scipy(mesh, LAM, MU, free_mask=mask)
    u_d = direct_solve(K, f)
    e_d = 0.5 * float(u_d @ (K @ u_d))
    e = float(op.energy(res.x))
    assert abs(e - e_d) / e_d < 1e-8


def test_mg_preconditioner_is_symmetric(fmg):
    """CG requires a symmetric M: verify x'My == y'Mx and x'Mx > 0 for
    the Chebyshev-smoothed V-cycle."""
    op, mg = fmg
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(op.n_dofs)) * op.free_mask
    y = jnp.asarray(rng.standard_normal(op.n_dofs)) * op.free_mask
    xMy = float(jnp.vdot(x, mg.apply(y)))
    yMx = float(jnp.vdot(y, mg.apply(x)))
    assert abs(xMy - yMx) / max(abs(xMy), 1e-30) < 1e-10
    assert float(jnp.vdot(x, mg.apply(x))) > 0


# ---------------------------------------------------------------------------
# Public API wiring
# ---------------------------------------------------------------------------


def _cantilever_problem(mesh):
    problem = setup_problem(mesh)
    assemble_stiffness_matrix(problem, LAM, MU)
    apply_fixed_boundary(problem, nodes_at_plane(mesh, 0, 0.0, tol=1e-6))
    xmax = mesh.coords[:, 0].max()
    apply_force(problem, nodes_at_plane(mesh, 0, xmax, tol=1e-6),
                [0.0, 0.0, -1.0])
    return problem


def test_solve_system_multigrid_matches_direct(fmesh):
    problem = _cantilever_problem(fmesh)
    direct = solve_system(problem, SolverConfig(
        method="direct", verbose=False))
    mg = solve_system(problem, SolverConfig(
        method="cg", preconditioner="multigrid", tolerance=1e-10,
        max_iterations=300, verbose=False))
    assert mg.converged
    assert abs(mg.energy - direct.energy) / direct.energy < 1e-8
    # V-cycle built and cached on the problem
    assert getattr(problem, "_mg_cache", None) is not None


def test_solve_system_multigrid_structured_fast_path():
    """Generated structured boxes must ride the stencil hierarchy (the
    bench headline path) through the same public config."""
    from topopteval_tpu.fem.structured import StructuredStiffnessOperator

    mesh = generate_grid_tet(8, 4, 4, (0, 0, 0), (8.0, 4.0, 4.0))
    problem = _cantilever_problem(mesh)
    res = solve_system(problem, SolverConfig(
        method="cg", preconditioner="multigrid", tolerance=1e-10,
        max_iterations=200, verbose=False))
    assert res.converged
    key, op, mg_pre = problem._mg_cache
    assert isinstance(op, StructuredStiffnessOperator)
    direct = solve_system(problem, SolverConfig(method="direct",
                                                verbose=False))
    assert abs(res.energy - direct.energy) / direct.energy < 1e-8


def test_solve_system_multigrid_cache_invalidation():
    mesh = generate_grid_tet(6, 3, 3, (0, 0, 0), (6.0, 3.0, 3.0))
    problem = _cantilever_problem(mesh)
    cfg = SolverConfig(method="cg", preconditioner="multigrid",
                       tolerance=1e-9, max_iterations=200, verbose=False)
    solve_system(problem, cfg)
    cache1 = problem._mg_cache
    solve_system(problem, cfg)
    assert problem._mg_cache is cache1            # reused
    assemble_stiffness_matrix(problem, 2 * LAM, 2 * MU)
    solve_system(problem, cfg)
    assert problem._mg_cache is not cache1        # material changed


def test_chunked_cg_matches_unchunked():
    mesh = generate_grid_tet(6, 3, 3, (0, 0, 0), (6.0, 3.0, 3.0))
    problem = _cantilever_problem(mesh)
    base = solve_system(problem, SolverConfig(
        method="cg", preconditioner="block_diagonal", tolerance=1e-10,
        max_iterations=2000, verbose=False))
    chunked = solve_system(problem, SolverConfig(
        method="cg", preconditioner="block_diagonal", tolerance=1e-10,
        max_iterations=2000, chunk_iterations=25, verbose=False))
    assert chunked.converged
    assert abs(chunked.energy - base.energy) / base.energy < 1e-9


def test_solve_system_multigrid_simp_structured_escale():
    """Per-hex SIMP material on a generated structured box rides the
    stencil hierarchy with an escale grid (fem/structured.py SIMP path)."""
    from topopteval_tpu.fem.structured import StructuredStiffnessOperator
    from topopteval_tpu.materials import SIMPMaterial
    from topopteval_tpu.api import assemble_stiffness_matrix_simp

    mesh = generate_grid_tet(8, 4, 4, (0, 0, 0), (8.0, 4.0, 4.0))
    problem = setup_problem(mesh)
    material = SIMPMaterial(E0=1.0, nu=0.3, Emin=1e-6, p=3.0)
    rng = np.random.default_rng(3)
    dens_hex = rng.uniform(0.2, 1.0, mesh.n_cells // 6)
    density = np.repeat(dens_hex, 6)          # hex-constant (6 tets/hex)
    assemble_stiffness_matrix_simp(problem, material, density)
    apply_fixed_boundary(problem, nodes_at_plane(mesh, 0, 0.0, tol=1e-6))
    apply_force(problem, nodes_at_plane(mesh, 0, 8.0, tol=1e-6),
                [0.0, 0.0, -1.0])
    res = solve_system(problem, SolverConfig(
        method="cg", preconditioner="multigrid", tolerance=1e-10,
        max_iterations=400, verbose=False))
    assert res.converged
    _, op, _ = problem._mg_cache
    assert isinstance(op, StructuredStiffnessOperator)
    assert op.escale is not None              # SIMP grid reached the op
    direct = solve_system(problem, SolverConfig(method="direct",
                                                verbose=False))
    assert abs(res.energy - direct.energy) / direct.energy < 1e-8


def test_solve_system_multigrid_hex8_fixture(beam_hex_path):
    """Imported hex8 SIMP fixture through the voxel-Galerkin MG route."""
    from topopteval_tpu.api import (assemble_stiffness_matrix_simp,
                                    extract_cell_density)
    from topopteval_tpu.materials import SIMPMaterial

    mesh = import_mesh(beam_hex_path)
    assert mesh.element_type == "hex8"
    density = extract_cell_density(beam_hex_path)
    problem = setup_problem(mesh)
    material = SIMPMaterial(E0=1.0, nu=0.3, Emin=1e-8, p=3.0)
    assemble_stiffness_matrix_simp(problem, material, density)
    apply_fixed_boundary(problem, nodes_at_plane(mesh, 0, 0.0, tol=1e-6))
    apply_force(problem, nodes_at_plane(mesh, 0, 60.0, tol=1e-6),
                [0.0, 0.0, -1.0])
    res = solve_system(problem, SolverConfig(
        method="cg", preconditioner="multigrid", tolerance=1e-8,
        max_iterations=2000, verbose=False))
    assert res.converged
    direct = solve_system(problem, SolverConfig(method="direct",
                                                verbose=False))
    assert abs(res.energy - direct.energy) / direct.energy < 1e-6


def test_adaptive_selects_multigrid_above_threshold(monkeypatch):
    """solve_system_adaptive must route meshes above the DOF threshold to
    the multigrid path (round-1 VERDICT item 2: auto-selection).  The
    threshold is lowered so the ROUTING is tested on a small mesh — MG
    correctness at scale has its own tests above."""
    import topopteval_tpu.api as api_mod
    monkeypatch.setattr(api_mod, "ADAPTIVE_DOF_THRESHOLD", 1000)
    mesh = generate_grid_tet(12, 6, 4, (0, 0, 0), (12.0, 6.0, 4.0))
    problem = _cantilever_problem(mesh)
    assert problem.n_dofs >= 1000
    res = solve_system_adaptive(problem)
    assert res.converged
    assert getattr(problem, "_mg_cache", None) is not None
    from topopteval_tpu.fem.structured import StructuredStiffnessOperator
    _, op, _ = problem._mg_cache
    assert isinstance(op, StructuredStiffnessOperator)


def test_transfer_chunked_lowerings_agree():
    """The two Transfer lowerings (vectorized / chunked) are pinned per
    hierarchy for backend-miscompile reasons; they must be algebraically
    identical."""
    from topopteval_tpu.fem.multigrid import build_transfer_tables

    p, w, inc = build_transfer_tables(6, 4, 2)
    a = Transfer(jnp.asarray(p), jnp.asarray(w, jnp.float64),
                 jnp.asarray(inc), chunked=False)
    b = Transfer(jnp.asarray(p), jnp.asarray(w, jnp.float64),
                 jnp.asarray(inc), chunked=True)
    rng = np.random.default_rng(0)
    N_f = (7 * 5 * 3)
    N_c = (4 * 3 * 2)
    uc = jnp.asarray(rng.standard_normal((N_c, 3)))
    rf = jnp.asarray(rng.standard_normal((N_f, 3)))
    np.testing.assert_allclose(np.asarray(a.prolong(uc)),
                               np.asarray(b.prolong(uc)), rtol=1e-14)
    np.testing.assert_allclose(np.asarray(a.restrict(rf)),
                               np.asarray(b.restrict(rf)), rtol=1e-13)
    # adjointness: <P uc, rf> == <uc, P^T rf>
    lhs = float(jnp.vdot(a.prolong(uc), rf))
    rhs = float(jnp.vdot(uc, a.restrict(rf)))
    assert abs(lhs - rhs) / max(abs(lhs), 1e-30) < 1e-12


def test_host_fine_operator_matches_device():
    """The host fp64 twin used by the MG build (matvec, node blocks) must
    match the device operator exactly."""
    from topopteval_tpu.fem.multigrid import (_HostFineOperator,
                                              _host_block_jacobi)
    from topopteval_tpu.fem.solvers import block_jacobi_preconditioner

    mesh = generate_grid_tet(5, 3, 2, (0, 0, 0), (2.5, 1.5, 1.0))
    fixed = nodes_at_plane(mesh, 0, 0.0)
    mask = free_mask_from_bcs(mesh.n_dofs, [DirichletBC.fixed(fixed)])
    C = mesh.n_cells
    rng = np.random.default_rng(1)
    lam_e = rng.uniform(0.2, 1.0, C)
    mu_e = rng.uniform(0.2, 1.0, C)
    dm = mesh.device(dtype=jnp.float64)
    op = StiffnessOperator.build(dm, lam_e, mu_e,
                                 free_mask=jnp.asarray(mask, jnp.float64))
    host = _HostFineOperator(mesh, lam_e, mu_e, mask, 2)
    u = rng.standard_normal(mesh.n_dofs)
    np.testing.assert_allclose(host.matvec(u),
                               np.asarray(op.matvec(jnp.asarray(u))),
                               rtol=1e-4, atol=1e-7)  # host Ke is fp32
    # (fp32-level agreement is by design: the host matvec only feeds the
    # smoother eigenvalue estimate)
    np.testing.assert_allclose(host.node_blocks(),
                               np.asarray(op.node_blocks_raw()),
                               rtol=1e-12, atol=1e-12)
    binv_h = _host_block_jacobi(host.node_blocks(), mask)
    binv_d = np.asarray(block_jacobi_preconditioner(op.node_blocks_raw(),
                                                    op.free_mask))
    np.testing.assert_allclose(binv_h, binv_d, rtol=1e-10, atol=1e-12)


def test_chunked_cg_history_concatenates():
    mesh = generate_grid_tet(6, 3, 3, (0, 0, 0), (6.0, 3.0, 3.0))
    problem = _cantilever_problem(mesh)
    res = solve_system(problem, SolverConfig(
        method="cg", preconditioner="block_diagonal", tolerance=1e-10,
        max_iterations=2000, chunk_iterations=25, history=True,
        verbose=False))
    assert res.converged
    assert res.history is not None
    assert len(res.history) == res.iterations + 1
    # monotone-ish: final residual below the initial one
    assert res.history[-1] < res.history[0]


def test_solve_system_multigrid_no_disk_cache(monkeypatch):
    """TOPOPT_MG_CACHE_DIR=off (the bench's cold-build protocol) builds
    with host_mirrors=False — no packed host planes exist, and the
    refinement oracle must run off the fp64 BSR twin.  Round-5
    regression: _finish_build KeyError 'L0_cols2' broke every no-cache
    BELL solve (tet10/imported/simp bench legs)."""
    monkeypatch.setenv("TOPOPT_MG_CACHE_DIR", "off")
    mesh = generate_grid_tet(6, 3, 3, (0, 0, 0), (6.0, 3.0, 3.0))
    mesh.structured_info = None              # force the BELL route
    problem = setup_problem(mesh, dtype=jnp.float32)
    assemble_stiffness_matrix(problem, LAM, MU)
    apply_fixed_boundary(problem, nodes_at_plane(mesh, 0, 0.0, tol=1e-6))
    apply_force(problem, nodes_at_plane(mesh, 0, 6.0, tol=1e-6),
                [0.0, 0.0, -1.0])
    res = solve_system(problem, SolverConfig(
        method="cg", preconditioner="multigrid", tolerance=1e-8,
        max_iterations=300, verbose=False))
    assert res.converged
    p64 = setup_problem(mesh, dtype=jnp.float64)
    assemble_stiffness_matrix(p64, LAM, MU)
    apply_fixed_boundary(p64, nodes_at_plane(mesh, 0, 0.0, tol=1e-6))
    apply_force(p64, nodes_at_plane(mesh, 0, 6.0, tol=1e-6),
                [0.0, 0.0, -1.0])
    direct = solve_system(p64, SolverConfig(method="direct",
                                            verbose=False))
    assert abs(res.energy - direct.energy) / abs(direct.energy) < 1e-6
