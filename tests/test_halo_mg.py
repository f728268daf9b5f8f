"""Sharded multigrid solver (parallel/halo_mg.py) — round-2 VERDICT #3:
MG-PCG over the halo-exchange fine operator with replicated coarse
levels must reproduce the single-device solve (same preconditioner ⇒
same CG trajectory) through the public ``solve_system(devices=...)``.

Module-scoped fixtures share one mesh, one MG-cache directory and one
single-device baseline across tests: every hierarchy builds once and
every later use is a disk-cache hit (the suite previously spent ~6 min
rebuilding identical hierarchies per test).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import topopteval_tpu as t
from topopteval_tpu.models.beams import generate_grid_tet

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _build_problem(dtype, nx=6, ny=3, nz=2):
    mesh = generate_grid_tet(nx, ny, nz, (0, 0, 0), (60.0, 20.0, 4.0))
    mesh.structured_info = None          # force the general (BELL) route
    p = t.setup_problem(mesh, dtype=dtype)
    t.assemble_stiffness_matrix(p, *t.create_material_model(1.0, 0.3))
    t.apply_fixed_boundary(p, t.nodes_at_plane(p.mesh, 0, 0.0))
    t.apply_force(p, t.nodes_at_plane(p.mesh, 0, 60.0), [0.0, 0.0, -1.0])
    return p


def _cfg(**kw):
    kw.setdefault("method", "cg")
    kw.setdefault("preconditioner", "multigrid")
    kw.setdefault("tolerance", 1e-10)
    kw.setdefault("verbose", False)
    return t.SolverConfig(**kw)


@pytest.fixture(scope="module", autouse=True)
def mg_cache_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("halo_mg_cache")
    old = os.environ.get("TOPOPT_MG_CACHE_DIR")
    os.environ["TOPOPT_MG_CACHE_DIR"] = str(d)
    yield str(d)
    if old is None:
        os.environ.pop("TOPOPT_MG_CACHE_DIR", None)
    else:
        os.environ["TOPOPT_MG_CACHE_DIR"] = old


@pytest.fixture(scope="module")
def r1_default(mg_cache_dir):
    """Single-device fp64 MG-PCG baseline on the shared mesh."""
    p1 = _build_problem(jnp.float64)
    return t.solve_system(p1, _cfg())


@pytest.fixture(scope="module")
def r8_fp64(mg_cache_dir):
    """8-device fp64 MG-PCG on the shared mesh — reused as both the
    parity subject and the warm-start donor (one sharded compile,
    round-4 VERDICT #6: suite wall-clock)."""
    p2 = _build_problem(jnp.float64)
    return t.solve_system(p2, _cfg(), devices=8)


def test_sharded_mg_matches_single_device_fp64(r1_default, r8_fp64):
    """8-device MG-PCG == single-device: energy to 1e-8, same iteration
    count (the sharded V-cycle uses the identical host-built block
    inverses, lambda_max and coarse chain, so the preconditioned
    trajectories coincide to fp64 rounding)."""
    r1, r2 = r1_default, r8_fp64
    assert r1.converged and r2.converged
    assert r2.method == "cg(multigrid,sharded)"
    assert abs(r2.energy - r1.energy) / abs(r1.energy) <= 1e-8
    assert r2.iterations == r1.iterations
    assert np.max(np.abs(r1.u - r2.u)) <= 1e-7 * np.max(np.abs(r1.u))


def test_sharded_mg_fp32_refined(r1_default):
    """fp32 sharded solve wraps the same mixed-precision refinement as
    the single-device BELL path: the fp64-certified energy must match
    the fp64 solve to ~1e-6 despite fp32 device compute."""
    p32 = _build_problem(jnp.float32)
    r32 = t.solve_system(p32, _cfg(tolerance=1e-8), devices=8)
    assert r32.converged
    assert abs(r32.energy - r1_default.energy) \
        / abs(r1_default.energy) <= 1e-6


def test_sharded_block_jacobi_path(r1_default):
    """preconditioner='block_diagonal' rides the plain sharded CG with
    the device-computed sharded block-Jacobi (and its backward-error
    gate)."""
    p = _build_problem(jnp.float64)
    cfg = _cfg(preconditioner="block_diagonal", tolerance=1e-8,
               max_iterations=5000)
    r = t.solve_system(p, cfg, devices=8)
    assert r.converged and r.method == "cg(sharded)"
    assert abs(r.energy - r1_default.energy) \
        / abs(r1_default.energy) <= 1e-6


def test_halo_mg_transfer_adjoint():
    """restrict == prolongᵀ on the sharded layout (Galerkin consistency:
    <R r, z> == <r, P z> for random vectors)."""
    from topopteval_tpu.fem.bc import free_mask_from_bcs
    from topopteval_tpu.parallel.halo_mg import build_halo_multigrid
    from topopteval_tpu.parallel.sharding import build_device_mesh

    p = _build_problem(jnp.float64)
    mask = free_mask_from_bcs(p.n_dofs, p.bcs)
    dev_mesh = build_device_mesh(8, data_parallel=1)
    hop, hmg, _ = build_halo_multigrid(
        p.mesh, p.lam, p.mu, dev_mesh, free_mask=mask,
        dtype=jnp.float64, order=p.quad_order)
    rng = np.random.default_rng(0)
    r = hop.to_local(rng.standard_normal(p.n_dofs))
    z = jnp.asarray(rng.standard_normal(3 * hmg.n1p))
    lhs = float(jnp.vdot(hmg.restrict(r), z))
    rhs = float(jnp.vdot(r, hmg.prolong(z)))
    assert abs(lhs - rhs) <= 1e-10 * max(abs(lhs), 1.0)


def test_sharded_fp32_block_jacobi_certifies_tolerance(r1_default):
    """fp32 + fp64-grade tolerance on the NON-multigrid sharded branch
    runs fp64-certified mixed-precision refinement (round-4 VERDICT #5:
    this route used to clamp to 1e-6; the reference honors every
    tolerance, RobustSolver.jl:294-300).  The certified energy must
    match the fp64 MG baseline far beyond fp32's native accuracy."""
    p = _build_problem(jnp.float32)
    cfg = _cfg(preconditioner="block_diagonal", tolerance=1e-10,
               max_iterations=3000)
    r = t.solve_system(p, cfg, devices=8)
    assert r.converged and r.method == "cg(sharded)"
    assert r.iterations < 3000
    assert abs(r.energy - r1_default.energy) \
        / abs(r1_default.energy) <= 1e-8


def test_sharded_x0_warm_start(r8_fp64):
    """x0 threads through hop.to_local into the sharded CG (ADVICE r3:
    it used to be silently dropped): warm-starting with the converged
    solution must finish in (nearly) zero iterations.  The cold solve
    is the shared module fixture."""
    p = _build_problem(jnp.float64)
    warm = t.solve_system(p, _cfg(), x0=r8_fp64.u, devices=8)
    assert warm.converged
    assert warm.iterations <= max(2, r8_fp64.iterations // 10)
