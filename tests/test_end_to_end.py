"""End-to-end parity: the reference's two integration cases
(reference: test/runtests.jl:21-89) upgraded with golden-value checks —
strain energy from the device CG solve must match an fp64 host scipy
direct solve reproducing the Julia math to <=1e-8 relative (SURVEY.md §4,
BASELINE.md accuracy bar).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from topopteval_tpu.api import (apply_fixed_boundary, apply_force,
                                assemble_stiffness_matrix,
                                assemble_stiffness_matrix_simp,
                                calculate_volume, extract_cell_density,
                                import_mesh, setup_problem, solve_system,
                                solve_system_simp)
from topopteval_tpu.config import SolverConfig
from topopteval_tpu.fem.bc import free_mask_from_bcs, nodes_at_plane
from topopteval_tpu.fem.operator import assemble_scipy
from topopteval_tpu.fem.solvers import direct_solve
from topopteval_tpu.materials import (create_material_model,
                                      create_simp_material_model)


def _oracle_energy(problem):
    """Assemble fp64 scipy K, condense BCs, spsolve — the reference's
    CHOLMOD path in role (FiniteElementAnalysis.jl:540-550)."""
    mask = free_mask_from_bcs(problem.n_dofs, problem.bcs)
    K = assemble_scipy(problem.mesh, problem.lam, problem.mu,
                       free_mask=mask)
    f = problem.f * mask
    u = direct_solve(K, f)
    return u, 0.5 * float(u @ (K @ u))


@pytest.fixture(scope="module")
def cantilever(beam_tet_path):
    mesh = import_mesh(beam_tet_path)
    lam, mu = create_material_model(1.0, 0.3)
    problem = setup_problem(mesh)
    assemble_stiffness_matrix(problem, lam, mu)
    fixed = nodes_at_plane(mesh, 0, 0.0)
    loaded = nodes_at_plane(mesh, 0, 60.0)
    assert fixed.size > 0 and loaded.size > 0
    apply_fixed_boundary(problem, fixed)
    apply_force(problem, loaded, [0.0, 0.0, -1.0])
    return problem


def test_cantilever_smoke_invariants(cantilever, beam_tet_path):
    """The reference's smoke asserts (runtests.jl:25-45)."""
    mesh = cantilever.mesh
    assert calculate_volume(mesh) > 0.0
    result = solve_system(cantilever)
    assert result.energy > 0.0
    assert result.max_von_mises > 0.0
    assert np.all(np.isfinite(result.u))
    assert result.converged


def test_cantilever_energy_matches_direct_oracle(cantilever):
    u_oracle, e_oracle = _oracle_energy(cantilever)
    result = solve_system(cantilever)
    rel = abs(result.energy - e_oracle) / abs(e_oracle)
    assert rel <= 1e-8, f"energy mismatch: rel={rel:.3e}"
    # displacement field agreement in the energy norm's scale
    err = np.linalg.norm(result.u - u_oracle) / np.linalg.norm(u_oracle)
    assert err < 1e-6, f"u mismatch: {err:.3e}"


def test_cantilever_direct_method_matches_oracle(cantilever):
    result = solve_system(cantilever, SolverConfig(method="direct"))
    _, e_oracle = _oracle_energy(cantilever)
    # energy recomputed via the matrix-free matvec; rounding-order noise only
    assert abs(result.energy - e_oracle) / e_oracle < 1e-9


def test_cantilever_auto_selects_direct_below_50k(cantilever):
    result = solve_system(cantilever, SolverConfig(method="auto"))
    assert result.method == "direct"   # 8631 dofs < 50k threshold


@pytest.fixture(scope="module")
def simp_beam(beam_hex_path):
    mesh = import_mesh(beam_hex_path)
    density = extract_cell_density(beam_hex_path)
    assert len(density) == mesh.n_cells
    material = create_simp_material_model(1.0, 0.3, 1e-8, 3.0)
    problem = setup_problem(mesh)
    assemble_stiffness_matrix_simp(problem, material, density)
    fixed = nodes_at_plane(mesh, 0, 0.0)
    loaded = nodes_at_plane(mesh, 0, 60.0)
    assert fixed.size > 0 and loaded.size > 0
    apply_fixed_boundary(problem, fixed)
    apply_force(problem, loaded, [0.0, 0.0, -1.0])
    return problem


def test_simp_smoke_invariants(simp_beam, beam_hex_path):
    density = extract_cell_density(beam_hex_path)
    vol = calculate_volume(simp_beam.mesh, density)
    assert vol > 0.0
    # weighted volume ≈ mean density * full volume (uniform hex grid)
    assert abs(vol - density.mean() * 60 * 20 * 4) < 1e-6
    result = solve_system_simp(simp_beam)
    assert result.energy > 0.0
    assert result.max_von_mises > 0.0
    assert np.all(np.isfinite(result.u))


def test_simp_energy_matches_direct_oracle(simp_beam):
    u_oracle, e_oracle = _oracle_energy(simp_beam)
    result = solve_system_simp(simp_beam)
    rel = abs(result.energy - e_oracle) / abs(e_oracle)
    assert rel <= 1e-8, f"energy mismatch: rel={rel:.3e}"


def test_matrix_free_operator_matches_assembled(cantilever):
    """A(u) == K u for random u, both raw and BC-masked."""
    problem = cantilever
    rng = np.random.default_rng(0)
    u = rng.standard_normal(problem.n_dofs)
    K_raw = assemble_scipy(problem.mesh, problem.lam, problem.mu)
    op = problem.build_operator(with_bc=False)
    np.testing.assert_allclose(np.asarray(op.matvec_raw(jnp.asarray(u))),
                               K_raw @ u, rtol=1e-10, atol=1e-10)
    mask = free_mask_from_bcs(problem.n_dofs, problem.bcs)
    K_bc = assemble_scipy(problem.mesh, problem.lam, problem.mu,
                          free_mask=mask)
    op_bc = problem.build_operator(with_bc=True)
    np.testing.assert_allclose(np.asarray(op_bc.matvec(jnp.asarray(u))),
                               K_bc @ u, rtol=1e-10, atol=1e-10)


def test_operator_diagonal_matches_assembled(cantilever):
    problem = cantilever
    mask = free_mask_from_bcs(problem.n_dofs, problem.bcs)
    K_bc = assemble_scipy(problem.mesh, problem.lam, problem.mu,
                          free_mask=mask)
    op = problem.build_operator(with_bc=True)
    np.testing.assert_allclose(np.asarray(op.diagonal()), K_bc.diagonal(),
                               rtol=1e-10, atol=1e-12)


def test_stored_mode_matches_otf(cantilever, beam_tet_path):
    mesh = import_mesh(beam_tet_path)
    problem = setup_problem(mesh, mode="stored")
    assemble_stiffness_matrix(problem, *create_material_model(1.0, 0.3))
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal(problem.n_dofs))
    a = problem.build_operator(with_bc=False).matvec_raw(u)
    problem.mode = "otf"
    b = problem.build_operator(with_bc=False).matvec_raw(u)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10,
                               atol=1e-10)


def test_quadratic_interpolation_order(beam_tet_path):
    """interpolation_order=2 (tet4 -> tet10 refinement) matches its own
    fp64 direct oracle and is softer than linear elements (reference path:
    FiniteElementAnalysis.jl:151-168)."""
    mesh = import_mesh(beam_tet_path)
    lam, mu = create_material_model(1.0, 0.3)

    def build(order):
        problem = setup_problem(mesh, interpolation_order=order)
        assemble_stiffness_matrix(problem, lam, mu)
        m = problem.mesh
        apply_fixed_boundary(problem, nodes_at_plane(m, 0, 0.0))
        apply_force(problem, nodes_at_plane(m, 0, 60.0), [0.0, 0.0, -1.0])
        return problem

    p1, p2 = build(1), build(2)
    assert p2.mesh.element_type == "tet10"
    assert p2.mesh.n_nodes > p1.mesh.n_nodes
    u_oracle, e_oracle = _oracle_energy(p2)
    # warm-start CG from the oracle solution: if the DEVICE tet10
    # operator/assembly disagreed with the independent scipy assembly,
    # CG would iterate away toward its own solution and the energy
    # parity below would fail — full coverage at a fraction of the
    # 10987 cold iterations (n_dofs=50274 sits just above the direct
    # threshold)
    cfg = SolverConfig(method="cg", preconditioner="block_diagonal",
                       tolerance=1e-10, verbose=False)
    r2 = solve_system(p2, cfg, x0=u_oracle)
    assert abs(r2.energy - e_oracle) / e_oracle <= 1e-8
    r1 = solve_system(p1)
    # quadratic basis is strictly softer -> more compliance under same load
    assert r2.energy > r1.energy


def test_warm_start_reduces_iterations(cantilever):
    cfg = SolverConfig(method="cg", preconditioner="block_diagonal",
                       tolerance=1e-10, verbose=False)
    r1 = solve_system(cantilever, cfg)
    r2 = solve_system(cantilever, cfg, x0=r1.u)
    assert r2.iterations <= max(r1.iterations // 10, 2)
    assert abs(r2.energy - r1.energy) / r1.energy < 1e-8


def test_save_load_result_roundtrip(cantilever, tmp_path):
    from topopteval_tpu.api import load_result, save_result
    r = solve_system(cantilever)
    path = save_result(r, str(tmp_path / "result"))
    back = load_result(path)
    np.testing.assert_allclose(back.u, r.u)
    assert back.energy == r.energy
    np.testing.assert_allclose(back.von_mises, r.von_mises)
    assert back.max_stress_cell == r.max_stress_cell
    assert back.converged == r.converged


def test_evaluate_design_batch_matches_simp_solve(simp_beam, beam_hex_path):
    from topopteval_tpu.api import evaluate_design_batch
    density = extract_cell_density(beam_hex_path)
    energies, iters, conv = evaluate_design_batch(
        simp_beam, density[None], tol=1e-10, maxiter=20000,
        dtype=jnp.float64)
    assert conv.all()
    ref = solve_system_simp(simp_beam)
    np.testing.assert_allclose(energies[0, 0], ref.energy, rtol=1e-6)
