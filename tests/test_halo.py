"""Halo-exchange sharded operator (parallel/halo.py) — VERDICT round-1
item 4: node-partitioned DOFs, boundary-only collectives, sharded
block-Jacobi; comms volume per matvec must be O(boundary), not O(ndof).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topopteval_tpu.fem.bc import (DirichletBC, free_mask_from_bcs,
                                   nodes_at_plane)
from topopteval_tpu.fem.operator import StiffnessOperator
from topopteval_tpu.fem.solvers import block_jacobi_preconditioner, cg
from topopteval_tpu.materials import lame_parameters
from topopteval_tpu.models.beams import generate_grid_tet
from topopteval_tpu.parallel.halo import HaloShardedOperator
from topopteval_tpu.parallel.sharding import build_device_mesh

LAM, MU = lame_parameters(1.0, 0.3)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _setup(nx, ny, nz, dims=(6.0, 3.0, 2.0)):
    mesh = generate_grid_tet(nx, ny, nz, (0, 0, 0), dims)
    fixed = nodes_at_plane(mesh, 0, 0.0)
    mask = free_mask_from_bcs(mesh.n_dofs, [DirichletBC.fixed(fixed)])
    dev_mesh = build_device_mesh(8, data_parallel=1)
    hop = HaloShardedOperator.build(mesh, LAM, MU, dev_mesh,
                                    free_mask=mask, dtype=jnp.float64)
    dm = mesh.device(dtype=jnp.float64)
    op = StiffnessOperator.build(
        dm, np.full(mesh.n_cells, LAM), np.full(mesh.n_cells, MU),
        free_mask=jnp.asarray(mask, jnp.float64))
    return mesh, mask, hop, op


def test_halo_matvec_matches_single_device():
    mesh, mask, hop, op = _setup(12, 6, 4)
    rng = np.random.default_rng(0)
    u = rng.standard_normal(mesh.n_dofs)
    f_ref = np.asarray(op.matvec(jnp.asarray(u)))
    f_halo = hop.from_local(hop.matvec(hop.to_local(u)))
    np.testing.assert_allclose(f_halo, f_ref, rtol=1e-12, atol=1e-12)
    d_ref = np.asarray(op.diagonal())
    d_halo = hop.from_local(hop.diagonal())
    np.testing.assert_allclose(d_halo, d_ref, rtol=1e-12, atol=1e-12)


def test_halo_layout_roundtrip_and_padding():
    mesh, mask, hop, _ = _setup(9, 5, 3)
    rng = np.random.default_rng(1)
    u = rng.standard_normal(mesh.n_dofs)
    u_l = hop.to_local(u)
    np.testing.assert_allclose(hop.from_local(u_l), u)
    # padded slab slots are fixed in the mask
    mask_l = np.asarray(hop.free_mask)
    used = np.zeros(hop.n_dofs, bool)
    dofs = (hop.plan.perm[:, None] * 3 + np.arange(3)).reshape(-1)
    used[dofs] = True
    assert np.all(mask_l[~used] == 0.0)


def test_halo_cg_matches_single_device():
    mesh, mask, hop, op = _setup(12, 6, 4)
    f = np.zeros(mesh.n_dofs)
    tip = nodes_at_plane(mesh, 0, 6.0)
    f[tip * 3 + 2] = -1.0 / tip.size
    b_l = hop.to_local(f) * hop.free_mask
    res = cg(hop, b_l, M=hop.block_jacobi(), tol=1e-10, maxiter=3000)
    b = jnp.asarray(f) * op.free_mask
    M0 = block_jacobi_preconditioner(op.node_blocks_raw(), op.free_mask)
    res0 = cg(op, b, M=M0, tol=1e-10, maxiter=3000)
    assert bool(res.converged) and bool(res0.converged)
    assert int(res.niter) == int(res0.niter)   # identical math
    np.testing.assert_allclose(hop.from_local(res.x), np.asarray(res0.x),
                               rtol=1e-9, atol=1e-11)


def test_halo_at_scale_100k_dofs():
    """>=100k dofs on the 8-device virtual mesh: sharded CG trajectory
    matches single-device to fp64 tolerance (fixed iteration budget keeps
    the CPU test fast; the math is identical, so partial solutions must
    agree)."""
    mesh, mask, hop, op = _setup(36, 32, 28, dims=(9.0, 8.0, 7.0))
    assert mesh.n_dofs >= 100_000
    f = np.zeros(mesh.n_dofs)
    tip = nodes_at_plane(mesh, 0, 9.0)
    f[tip * 3 + 2] = -1.0 / tip.size
    b_l = hop.to_local(f) * hop.free_mask
    res = cg(hop, b_l, M=hop.block_jacobi(), tol=1e-10, maxiter=60)
    b = jnp.asarray(f) * op.free_mask
    M0 = block_jacobi_preconditioner(op.node_blocks_raw(), op.free_mask)
    res0 = cg(op, b, M=M0, tol=1e-10, maxiter=60)
    assert int(res.niter) == int(res0.niter)
    x = hop.from_local(res.x)
    x0 = np.asarray(res0.x)
    scale = np.abs(x0).max()
    np.testing.assert_allclose(x, x0, atol=1e-9 * scale)


def test_halo_collectives_are_boundary_sized():
    """HLO inspection: the matvec's only collectives are the two
    boundary halo exchanges — comms volume O(boundary), never O(ndof)."""
    mesh, mask, hop, _ = _setup(40, 14, 12, dims=(20.0, 7.0, 6.0))
    u = hop.to_local(np.zeros(mesh.n_dofs))
    txt = jax.jit(hop.matvec).lower(u).compile().as_text()
    budget = 8 * hop.nbs_max * 3          # elements in one halo exchange
    assert budget < mesh.n_dofs / 2       # the test is meaningful
    found = []
    for line in txt.splitlines():
        m = re.search(r"=\s*\S*?f64\[([0-9,]*)\][^=]*"
                      r"(all-gather|all-reduce|all-to-all|"
                      r"collective-permute)\(", line)
        if m:
            dims = [int(x) for x in m.group(1).split(",") if x]
            found.append((m.group(2), int(np.prod(dims)) if dims else 1))
    assert found, "expected halo collectives in the compiled matvec"
    oversized = [f for f in found if f[1] > budget]
    assert not oversized, (oversized, budget, mesh.n_dofs)
