"""Block-ELL fast path: kernels, hierarchy, API wiring, persistence.

Round-3 VERDICT items 1+2: the imported-mesh solve path moves to the
explicit BELL hierarchy (Pallas lane-gather matvecs + host scipy RAP
build + disk cache).  CPU runs use the pure-jnp twins; kernel parity is
via interpret mode (tests here) and the on-chip bench integrity gates.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from topopteval_tpu.fem.bc import (DirichletBC, free_mask_from_bcs,
                                   nodes_at_plane)
from topopteval_tpu.fem.bell import (BellSystem, build_bell_multigrid,
                                     assemble_bsr_triplets,
                                     _triplets_to_scipy_bsr,
                                     load_hierarchy, rcm_order,
                                     save_hierarchy)
from topopteval_tpu.fem.operator import assemble_scipy
from topopteval_tpu.fem.solvers import cg, direct_solve
from topopteval_tpu.materials import SIMPMaterial, lame_parameters
from topopteval_tpu.models.beams import generate_grid_tet
from topopteval_tpu.ops.pallas_bsr import (LANES, bell_matvec_pallas,
                                           bell_matvec_reference,
                                           pack_ell_rows,
                                           sell_matvec_pallas,
                                           sell_matvec_reference)

LAM, MU = lame_parameters(1.0, 0.3)


def _random_bsr(N=300, nnzb=2500, band=40, seed=0):
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, N, nnzb)
    cols = np.clip(rows + rng.integers(-band, band + 1, nnzb), 0, N - 1)
    blocks = rng.standard_normal((nnzb, 3, 3))
    K = sp.coo_matrix(
        (blocks.reshape(-1),
         ((3 * rows[:, None, None] + np.arange(3)[None, :, None])
          .repeat(3, 2).reshape(-1),
          (3 * cols[:, None, None] + np.arange(3)[None, None, :])
          .repeat(3, 1).reshape(-1))),
        shape=(3 * N, 3 * N)).tocsr()
    return rows, cols, blocks, K


# ---------------------------------------------------------------------------
# Kernel parity: twin == interpret-mode Pallas == scipy
# ---------------------------------------------------------------------------


def test_bell_kernels_match_scipy():
    N = 300
    rows, cols, blocks, K = _random_bsr(N)
    pk = pack_ell_rows(rows, cols, blocks, N, N)
    Np = pk["n_rows_p"]
    rng = np.random.default_rng(1)
    u = np.zeros((3, Np))
    u[:, :N] = rng.standard_normal((3, N))
    truth = (K @ u[:, :N].T.reshape(-1)).reshape(N, 3).T
    c2 = jnp.asarray(pk["cols2"])
    v2 = jnp.asarray(pk["vals2"])
    u_d = jnp.asarray(u)
    ref = np.asarray(bell_matvec_reference(c2, v2, u_d, pk["S"]))[:, :N]
    np.testing.assert_allclose(ref, truth, rtol=1e-12, atol=1e-12)
    o1 = np.asarray(bell_matvec_pallas(
        c2, v2, jnp.asarray(pk["wblk"]), jnp.asarray(pk["gbounds"]),
        u_d, pk["S"], pk["kc"], interpret=True))[:, :N]
    np.testing.assert_allclose(o1, truth, rtol=1e-12, atol=1e-12)


def test_sell_kernels_match_scipy():
    N, Nc, nnz = 300, 150, 1200
    rng = np.random.default_rng(2)
    prow = rng.integers(0, N, nnz)
    pcol = np.clip(prow // 2 + rng.integers(-10, 11, nnz), 0, Nc - 1)
    w = rng.standard_normal(nnz)
    P = sp.coo_matrix((w, (prow, pcol)), shape=(N, Nc)).tocsr()
    pp = pack_ell_rows(prow, pcol, w, N, Nc)
    ncp = pp["n_cols_p"]
    uc = np.zeros((3, ncp))
    uc[:, :Nc] = rng.standard_normal((3, Nc))
    truth = np.stack([P @ uc[a, :Nc] for a in range(3)])
    c2, w2 = jnp.asarray(pp["cols2"]), jnp.asarray(pp["vals2"])
    uc_d = jnp.asarray(uc)
    ref = np.asarray(sell_matvec_reference(c2, w2, uc_d, pp["S"],
                                           pp["n_rows_p"]))[:, :N]
    np.testing.assert_allclose(ref, truth, rtol=1e-12, atol=1e-12)
    o1 = np.asarray(sell_matvec_pallas(
        c2, w2, jnp.asarray(pp["wblk"]), jnp.asarray(pp["gbounds"]),
        uc_d, pp["S"], pp["kc"], interpret=True))[:, :N]
    np.testing.assert_allclose(o1, truth, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("group", [8, 4])
def test_bell_aligned_kernels_match_scipy(group):
    """Chunk-aligned layout (the production fast path, round-3): packer +
    interpret-mode kernel + reference twin all equal scipy, including the
    fused hi/lo split pass.  group=4 is the low-padding layout (same
    kernels; G derived as S//ng)."""
    from topopteval_tpu.ops.pallas_bsr import (bell_matvec_aligned,
                                               pack_ell_aligned)
    N = 300
    rows, cols, blocks, K = _random_bsr(N)
    pk = pack_ell_aligned(rows, cols, blocks, N, N, group=group)
    Np = pk["n_rows_p"]
    rng = np.random.default_rng(1)
    u = np.zeros((3, Np))
    u[:, :N] = rng.standard_normal((3, N))
    truth = (K @ u[:, :N].T.reshape(-1)).reshape(N, 3).T
    c2 = jnp.asarray(pk["cols2"])
    v2 = jnp.asarray(pk["vals2"])
    cm = jnp.asarray(pk["cmeta"])
    u_d = jnp.asarray(u)
    ref = np.asarray(bell_matvec_reference(c2, v2, u_d, pk["S"]))[:, :N]
    np.testing.assert_allclose(ref, truth, rtol=1e-12, atol=1e-12)
    o1 = np.asarray(bell_matvec_aligned(c2, v2, cm, u_d, pk["S"],
                                        interpret=True))[:, :N]
    np.testing.assert_allclose(o1, truth, rtol=1e-12, atol=1e-12)
    # fused split: (hi + lo) in one pass == hi matvec + lo matvec
    lo = _random_bsr(N, seed=7)[2] * 1e-3
    pk_lo = pack_ell_aligned(rows, cols, lo, N, N, group=group)
    o2 = np.asarray(bell_matvec_aligned(
        c2, v2, cm, u_d, pk["S"],
        vals2_lo=jnp.asarray(pk_lo["vals2"]), interpret=True))[:, :N]
    truth2 = truth + np.asarray(bell_matvec_reference(
        jnp.asarray(pk_lo["cols2"]), jnp.asarray(pk_lo["vals2"]), u_d,
        pk_lo["S"]))[:, :N]
    np.testing.assert_allclose(o2, truth2, rtol=1e-12, atol=1e-12)


def test_bell_aligned_bf16_vals_upcast():
    """bf16-stored values (smoother levels) multiply at the vector dtype:
    kernel output matches the reference twin on identical bf16 arrays to
    fp32 roundoff."""
    from topopteval_tpu.ops.pallas_bsr import (bell_matvec_aligned,
                                               pack_ell_aligned)
    N = 300
    rows, cols, blocks, _ = _random_bsr(N)
    pk = pack_ell_aligned(rows, cols, blocks, N, N)
    v_bf = jnp.asarray(pk["vals2"], jnp.bfloat16)
    c2 = jnp.asarray(pk["cols2"])
    cm = jnp.asarray(pk["cmeta"])
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((3, pk["n_rows_p"])),
                    jnp.float32)
    ref = np.asarray(bell_matvec_reference(c2, v_bf, u, pk["S"]),
                     np.float64)
    out = np.asarray(bell_matvec_aligned(c2, v_bf, cm, u, pk["S"],
                                         interpret=True), np.float64)
    err = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-30)
    assert err < 1e-5
    assert out.dtype == np.float64 and u.dtype == jnp.float32


@pytest.mark.parametrize("group", [8, 4])
def test_sell_aligned_kernels_match_scipy(group):
    from topopteval_tpu.ops.pallas_bsr import (pack_ell_aligned,
                                               sell_matvec_aligned)
    N, Nc, nnz = 300, 150, 1200
    rng = np.random.default_rng(2)
    prow = rng.integers(0, N, nnz)
    pcol = np.clip(prow // 2 + rng.integers(-10, 11, nnz), 0, Nc - 1)
    w = rng.standard_normal(nnz)
    P = sp.coo_matrix((w, (prow, pcol)), shape=(N, Nc)).tocsr()
    pp = pack_ell_aligned(prow, pcol, w, N, Nc, group=group)
    ncp = pp["n_cols_p"]
    uc = np.zeros((3, ncp))
    uc[:, :Nc] = rng.standard_normal((3, Nc))
    truth = np.stack([P @ uc[a, :Nc] for a in range(3)])
    c2, w2 = jnp.asarray(pp["cols2"]), jnp.asarray(pp["vals2"])
    uc_d = jnp.asarray(uc)
    ref = np.asarray(sell_matvec_reference(c2, w2, uc_d, pp["S"],
                                           pp["n_rows_p"]))[:, :N]
    np.testing.assert_allclose(ref, truth, rtol=1e-12, atol=1e-12)
    o1 = np.asarray(sell_matvec_aligned(c2, w2, jnp.asarray(pp["cmeta"]),
                                        uc_d, pp["S"],
                                        interpret=True))[:, :N]
    np.testing.assert_allclose(o1, truth, rtol=1e-12, atol=1e-12)


# ---------------------------------------------------------------------------
# Assembly + operator parity
# ---------------------------------------------------------------------------


def test_bsr_triplets_match_assembled_matrix():
    mesh = generate_grid_tet(4, 2, 2, (0, 0, 0), (4, 2, 2))
    C = mesh.n_cells
    rows, cols, blocks = assemble_bsr_triplets(
        mesh, np.full(C, LAM), np.full(C, MU))
    A = _triplets_to_scipy_bsr(rows, cols, blocks, mesh.n_nodes)
    K = assemble_scipy(mesh, LAM, MU, order=2)
    np.testing.assert_allclose(A.toarray(), K.toarray(), atol=1e-11)


def test_bell_system_matvec_matches_scipy():
    mesh = generate_grid_tet(6, 3, 3, (0, 0, 0), (6, 3, 3))
    fixed = nodes_at_plane(mesh, 0, 0.0)
    mask = free_mask_from_bcs(mesh.n_dofs, [DirichletBC.fixed(fixed)])
    system, mg, info = build_bell_multigrid(
        mesh, LAM, MU, free_mask=mask, dtype=jnp.float64)
    K = assemble_scipy(mesh, LAM, MU, order=2, free_mask=mask)
    x = np.random.default_rng(3).standard_normal(mesh.n_dofs)
    Ax = system.to_il(np.asarray(
        system.matvec(jnp.asarray(system.to_cm(x)))))
    np.testing.assert_allclose(Ax, K @ x, rtol=1e-10, atol=1e-10)
    # layout converters round-trip
    np.testing.assert_allclose(system.to_il(system.to_cm(x)), x)


# ---------------------------------------------------------------------------
# MG-PCG convergence vs fp64 direct oracle
# ---------------------------------------------------------------------------


def _solve_bell(mesh, lam_e, mu_e, mask, f, tol=1e-10, maxiter=400):
    system, mg, info = build_bell_multigrid(
        mesh, lam_e, mu_e, free_mask=mask, dtype=jnp.float64)
    f_cm = jnp.asarray(system.to_cm(f * mask))
    res = cg(system.matrix, f_cm * system.matrix.free_mask, M=mg,
             tol=tol, maxiter=maxiter)
    return system.to_il(np.asarray(res.x)), res, info


def test_bell_mg_energy_matches_direct():
    mesh = generate_grid_tet(12, 4, 4, (0, 0, 0), (60, 20, 4))
    fixed = nodes_at_plane(mesh, 0, 0.0)
    mask = free_mask_from_bcs(mesh.n_dofs, [DirichletBC.fixed(fixed)])
    f = np.zeros(mesh.n_dofs)
    tip = np.asarray(nodes_at_plane(mesh, 0, 60.0))
    f[3 * tip + 2] = -1.0 / len(tip)
    u, res, info = _solve_bell(mesh, LAM, MU, mask, f)
    assert bool(res.converged)
    assert int(res.niter) < 40            # mesh-independent MG behavior
    K = assemble_scipy(mesh, LAM, MU, order=2, free_mask=mask)
    u_d = direct_solve(K, f * mask)
    e, e_d = 0.5 * u @ (K @ u), 0.5 * u_d @ (K @ u_d)
    assert abs(e - e_d) / abs(e_d) < 1e-8
    # parametric route reports value-pass phases; legacy reports
    # assemble_triplets — both must carry per-phase timings
    assert ("values_matvec" in info["phases"]
            or "assemble_triplets" in info["phases"])


def test_bell_mg_simp_contrast(beam_hex_path):
    """Hex fixture at real SIMP contrast (Emin/E0=1e-8): the hard
    conditioning case (SURVEY.md §7 hard part 3)."""
    from topopteval_tpu.api import extract_cell_density, import_mesh
    mesh = import_mesh(beam_hex_path)
    rho = extract_cell_density(beam_hex_path)
    lam_e, mu_e = SIMPMaterial(1.0, 0.3, 1e-8, 3.0).lame(rho)
    fixed = nodes_at_plane(mesh, 0, 0.0)
    mask = free_mask_from_bcs(mesh.n_dofs, [DirichletBC.fixed(fixed)])
    f = np.zeros(mesh.n_dofs)
    tip = np.asarray(nodes_at_plane(mesh, 0, 60.0))
    f[3 * tip + 2] = -1.0 / len(tip)
    u, res, _ = _solve_bell(mesh, lam_e, mu_e, mask, f, maxiter=200)
    assert bool(res.converged)
    K = assemble_scipy(mesh, lam_e, mu_e, order=2, free_mask=mask)
    u_d = direct_solve(K, f * mask)
    e, e_d = 0.5 * u @ (K @ u), 0.5 * u_d @ (K @ u_d)
    assert abs(e - e_d) / abs(e_d) < 1e-8


# ---------------------------------------------------------------------------
# Public API wiring + persistence
# ---------------------------------------------------------------------------


def test_solve_system_bell_path(tmp_path, monkeypatch):
    """solve_system(preconditioner='multigrid') on a mesh WITHOUT
    structured_info routes through the BELL hierarchy, matches the direct
    oracle, and round-trips the disk cache."""
    from topopteval_tpu.api import (apply_fixed_boundary, apply_force,
                                    assemble_stiffness_matrix,
                                    setup_problem, solve_system)
    from topopteval_tpu.config import SolverConfig

    monkeypatch.setenv("TOPOPT_MG_CACHE_DIR", str(tmp_path))
    mesh = generate_grid_tet(8, 4, 4, (0, 0, 0), (8, 4, 4))
    object.__setattr__(mesh, "structured_info", None)   # force general path
    problem = setup_problem(mesh)
    assemble_stiffness_matrix(problem, LAM, MU)
    apply_fixed_boundary(problem, nodes_at_plane(mesh, 0, 0.0))
    apply_force(problem, nodes_at_plane(mesh, 0, 8.0), [0, 0, -1.0])
    cfg = SolverConfig(method="cg", preconditioner="multigrid",
                       tolerance=1e-10, max_iterations=300)
    res = solve_system(problem, cfg)
    assert res.converged
    # oracle
    mask = free_mask_from_bcs(mesh.n_dofs, problem.bcs)
    K = assemble_scipy(mesh, LAM, MU, order=2, free_mask=mask)
    u_d = direct_solve(K, problem.f * mask)
    e_d = 0.5 * u_d @ (K @ u_d)
    assert abs(res.energy - e_d) / abs(e_d) < 1e-8
    assert np.isfinite(res.max_von_mises) and res.max_von_mises > 0
    info1 = problem._mg_build_info
    assert info1["cached"] is False
    # second problem, same inputs -> cache hit
    problem2 = setup_problem(mesh)
    assemble_stiffness_matrix(problem2, LAM, MU)
    apply_fixed_boundary(problem2, nodes_at_plane(mesh, 0, 0.0))
    apply_force(problem2, nodes_at_plane(mesh, 0, 8.0), [0, 0, -1.0])
    res2 = solve_system(problem2, cfg)
    assert problem2._mg_build_info.get("cached") is True
    assert abs(res2.energy - res.energy) / abs(res.energy) < 1e-12


def test_hierarchy_save_load_roundtrip(tmp_path):
    mesh = generate_grid_tet(6, 3, 3, (0, 0, 0), (6, 3, 3))
    fixed = nodes_at_plane(mesh, 0, 0.0)
    mask = free_mask_from_bcs(mesh.n_dofs, [DirichletBC.fixed(fixed)])
    system, mg, info = build_bell_multigrid(
        mesh, LAM, MU, free_mask=mask, dtype=jnp.float64)
    path = str(tmp_path / "h.npz")
    save_hierarchy(path, system, mg, info)
    system2, mg2, info2 = load_hierarchy(path, jnp.float64)
    assert info2["cached"] is True
    x = np.random.default_rng(5).standard_normal(mesh.n_dofs)
    x_cm = jnp.asarray(system.to_cm(x))
    np.testing.assert_allclose(
        np.asarray(system.matvec(x_cm)),
        np.asarray(system2.matvec(jnp.asarray(system2.to_cm(x)))),
        rtol=1e-14)
    np.testing.assert_allclose(np.asarray(mg.apply(x_cm * system.free_mask)),
                               np.asarray(mg2.apply(x_cm * system.free_mask)),
                               rtol=1e-13, atol=1e-13)
    # fp64 host twin: build-time BSR == cache-loaded BSR == packed-plane
    # reconstruction (the pre-round-4 cache fallback)
    assert getattr(system2, "host_bsr", None) is not None
    x64 = system.to_cm(x)
    y_build = system.matvec64(x64)
    y_load = system2.matvec64(x64)
    np.testing.assert_allclose(y_load, y_build, rtol=1e-14, atol=1e-14)
    system3, _, _ = load_hierarchy(path, jnp.float64)
    del system3.host_bsr              # force the packed-plane fallback
    y_fb = system3.matvec64(x64)
    scale = np.abs(y_build).max()
    np.testing.assert_allclose(y_fb, y_build, rtol=1e-12,
                               atol=1e-12 * scale)


# ---------------------------------------------------------------------------
# Density-parametric build: skeleton + value pass (round-4 VERDICT #1)
# ---------------------------------------------------------------------------


def test_parametric_build_matches_legacy():
    """The skeleton+values route must produce the IDENTICAL operator
    (fine and coarse levels) as the monolithic build — same triplet
    values, same layouts, same masks."""
    from topopteval_tpu.fem.bell import (_build_bell_multigrid_legacy,
                                         build_bell_skeleton,
                                         build_bell_values)
    mesh = generate_grid_tet(20, 8, 4, (0, 0, 0), (20, 8, 4))
    fixed = nodes_at_plane(mesh, 0, 0.0)
    mask = free_mask_from_bcs(mesh.n_dofs, [DirichletBC.fixed(fixed)])
    rng = np.random.default_rng(7)
    C = mesh.n_cells
    lam_e = LAM * rng.uniform(0.2, 1.0, C)     # per-element material
    mu_e = MU * rng.uniform(0.2, 1.0, C)
    s1, m1, _ = _build_bell_multigrid_legacy(
        mesh, lam_e, mu_e, free_mask=mask, dtype=jnp.float64,
        max_coarse_dofs=600)
    skel = build_bell_skeleton(mesh, mask, order=2, max_coarse_dofs=600)
    s2, m2, i2 = build_bell_values(skel, lam_e, mu_e, dtype=jnp.float64)
    assert len(m1.levels) == len(m2.levels) >= 2   # coarse chain tested
    # value parity is eps-level, not bitwise: the legacy build folds
    # lam*kl + mu*km per element BEFORE the dedup reduction while the
    # parametric route sums the two planes separately (both exact
    # assemblies of the same operator)
    x = rng.standard_normal(s1.n_dofs)
    xd = jnp.asarray(x)
    np.testing.assert_allclose(np.asarray(s1.matvec(xd)),
                               np.asarray(s2.matvec(xd)),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(s1.matvec64(x), s2.matvec64(x),
                               rtol=1e-10, atol=1e-12)
    for l1, l2 in zip(m1.levels[1:], m2.levels[1:]):
        assert l1.op.S == l2.op.S and l1.op.n_rows_p == l2.op.n_rows_p
        xc = jnp.asarray(rng.standard_normal(l1.op.n_dofs))
        # coarse values go through different (equally exact) RAP
        # summation orders (blockwise vs scalar csr) — eps-level only
        np.testing.assert_allclose(np.asarray(l1.op.matvec(xc)),
                                   np.asarray(l2.op.matvec(xc)),
                                   rtol=1e-9, atol=1e-9)
    assert "fine_transfer" in i2 and "host_arrays" in i2


def test_density_swap_reuses_skeleton(tmp_path, monkeypatch):
    """A SIMP density field on a mesh whose hierarchy skeleton is
    already in the RAM cache pays only the value pass — and the swapped
    hierarchy solves to the fp64 direct oracle (the reference's SIMP
    re-assembly semantics, FiniteElementAnalysis.jl:654-707)."""
    from topopteval_tpu import api
    from topopteval_tpu.api import (apply_fixed_boundary, apply_force,
                                    assemble_stiffness_matrix,
                                    assemble_stiffness_matrix_simp,
                                    setup_problem, solve_system)
    from topopteval_tpu.config import SolverConfig

    monkeypatch.setenv("TOPOPT_MG_CACHE_DIR", str(tmp_path))
    api._SKEL_RAM_CACHE.clear()
    mesh = generate_grid_tet(10, 4, 4, (0, 0, 0), (10, 4, 4))
    mesh.structured_info = None            # force the BELL route
    cfg = SolverConfig(method="cg", preconditioner="multigrid",
                       tolerance=1e-10, max_iterations=200)

    problem = setup_problem(mesh)
    assemble_stiffness_matrix(problem, LAM, MU)
    apply_fixed_boundary(problem, nodes_at_plane(mesh, 0, 0.0))
    apply_force(problem, nodes_at_plane(mesh, 0, 10.0), [0, 0, -1.0])
    solve_system(problem, cfg)
    assert problem._mg_build_info.get("skeleton_cached") is False

    # new density field, same mesh+BCs: skeleton comes from RAM
    mat = SIMPMaterial(E0=1.0, nu=0.3, Emin=1e-6, p=3.0)
    rho = np.random.default_rng(1).uniform(0.2, 1.0, mesh.n_cells)
    p2 = setup_problem(mesh)
    assemble_stiffness_matrix_simp(p2, mat, rho)
    apply_fixed_boundary(p2, nodes_at_plane(mesh, 0, 0.0))
    apply_force(p2, nodes_at_plane(mesh, 0, 10.0), [0, 0, -1.0])
    r2 = solve_system(p2, cfg)
    assert p2._mg_build_info.get("skeleton_cached") is True
    assert r2.converged
    lam_e, mu_e = mat.lame(rho)
    K = assemble_scipy(mesh, np.asarray(lam_e), np.asarray(mu_e),
                       order=2,
                       free_mask=free_mask_from_bcs(mesh.n_dofs, p2.bcs))
    u64 = direct_solve(K, p2.f * free_mask_from_bcs(mesh.n_dofs, p2.bcs))
    e64 = 0.5 * float(u64 @ p2.f)
    assert abs(r2.energy - e64) / abs(e64) < 1e-8
