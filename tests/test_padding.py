"""Padding inertness: padded cells/nodes must be provably inert through
assembly, diagonal/node-block extraction, BC masks, and reductions
(the contract DeviceMesh documents; SURVEY.md §7 hard part 4).

Padded cells are density-0 ghost cells wired to node 0; they are inert
because their edge matrix is singular → detJ = 0 → zero integration
weight, for BOTH the einsum and the Pallas element paths.
"""

import jax.numpy as jnp
import numpy as np

from topopteval_tpu.fem.bc import (DirichletBC, free_mask_from_bcs,
                                   nodes_at_plane)
from topopteval_tpu.fem.operator import StiffnessOperator
from topopteval_tpu.fem.solvers import block_jacobi_preconditioner, cg
from topopteval_tpu.materials import lame_parameters
from topopteval_tpu.models.beams import generate_grid_tet

LAM, MU = lame_parameters(1.0, 0.3)


def _ops(pad_cells=0, pad_nodes=0):
    mesh = generate_grid_tet(3, 2, 2, (0, 0, 0), (3.0, 2.0, 2.0))
    fixed = DirichletBC.fixed(nodes_at_plane(mesh, 0, 0.0))
    dm = mesh.device(dtype=jnp.float64,
                     pad_cells_to=mesh.n_cells + pad_cells,
                     pad_nodes_to=mesh.n_nodes + pad_nodes)
    mask = free_mask_from_bcs(mesh.n_dofs, [fixed],
                              pad_to=dm.n_padded_dofs)
    op = StiffnessOperator.build(dm, LAM, MU,
                                 free_mask=jnp.asarray(mask, jnp.float64))
    return mesh, op


def test_padded_free_mask_marks_phantom_dofs_fixed():
    mesh, op = _ops(pad_cells=7, pad_nodes=5)
    n = mesh.n_dofs
    mask = np.asarray(op.free_mask)
    assert mask.shape[0] == n + 15
    assert np.all(mask[n:] == 0.0)


def test_matvec_unchanged_by_padding():
    mesh, op0 = _ops()
    _, opp = _ops(pad_cells=7, pad_nodes=5)
    n = mesh.n_dofs
    rng = np.random.default_rng(0)
    u = rng.standard_normal(n)
    up = np.zeros(opp.n_dofs)
    up[:n] = u
    f0 = np.asarray(op0.matvec(jnp.asarray(u)))
    fp = np.asarray(opp.matvec(jnp.asarray(up)))
    # real dofs identical; CRITICALLY node 0 (the ghost-cell anchor)
    # receives zero spurious contribution from the padded cells
    np.testing.assert_allclose(fp[:n], f0, rtol=1e-12, atol=1e-12)
    # phantom dofs are fixed: A'(u)[pad] = u[pad] = 0
    np.testing.assert_array_equal(fp[n:], 0.0)


def test_matvec_raw_padded_cells_scatter_zero():
    """Unmasked matvec: ghost cells carry FULL material (scalar lam/mu is
    broadcast over pads) yet contribute exactly zero via detJ = 0."""
    mesh, op0 = _ops()
    _, opp = _ops(pad_cells=7, pad_nodes=5)
    n = mesh.n_dofs
    rng = np.random.default_rng(1)
    up = rng.standard_normal(opp.n_dofs)   # junk on phantom dofs too
    f0 = np.asarray(op0.matvec_raw(jnp.asarray(up[:n])))
    fp = np.asarray(opp.matvec_raw(jnp.asarray(up)))
    np.testing.assert_allclose(fp[:n], f0, rtol=1e-12, atol=1e-12)
    # phantom nodes are touched by no real cell
    np.testing.assert_array_equal(fp[n:], 0.0)


def test_diagonal_and_node_blocks_unchanged_by_padding():
    mesh, op0 = _ops()
    _, opp = _ops(pad_cells=7, pad_nodes=5)
    n = mesh.n_dofs
    d0 = np.asarray(op0.diagonal_raw())
    dp = np.asarray(opp.diagonal_raw())
    np.testing.assert_allclose(dp[:n], d0, rtol=1e-12, atol=1e-12)
    np.testing.assert_array_equal(dp[n:], 0.0)
    b0 = np.asarray(op0.node_blocks_raw())
    bp = np.asarray(opp.node_blocks_raw())
    np.testing.assert_allclose(bp[: mesh.n_nodes], b0, rtol=1e-12,
                               atol=1e-12)
    np.testing.assert_array_equal(bp[mesh.n_nodes:], 0.0)


def test_block_jacobi_guards_singular_phantom_blocks():
    _, opp = _ops(pad_cells=7, pad_nodes=5)
    binv = np.asarray(block_jacobi_preconditioner(opp.node_blocks_raw(),
                                                  opp.free_mask))
    assert np.all(np.isfinite(binv))


def test_volume_and_energy_unchanged_by_padding():
    mesh, op0 = _ops()
    _, opp = _ops(pad_cells=7, pad_nodes=5)
    n = mesh.n_dofs
    assert np.isclose(float(op0.volume()), float(opp.volume()),
                      rtol=1e-12)
    rng = np.random.default_rng(2)
    u = rng.standard_normal(n)
    up = np.zeros(opp.n_dofs)
    up[:n] = u
    assert np.isclose(float(op0.energy(jnp.asarray(u))),
                      float(opp.energy(jnp.asarray(up))), rtol=1e-12)


def test_padded_solve_matches_unpadded():
    mesh, op0 = _ops()
    _, opp = _ops(pad_cells=7, pad_nodes=5)
    n = mesh.n_dofs
    tip = nodes_at_plane(mesh, 0, 3.0)
    f = np.zeros(n)
    f[tip * 3 + 2] = -1.0 / tip.size
    fp = np.zeros(opp.n_dofs)
    fp[:n] = f
    r0 = cg(op0, jnp.asarray(f) * op0.free_mask, tol=1e-10, maxiter=2000)
    rp = cg(opp, jnp.asarray(fp) * opp.free_mask, tol=1e-10, maxiter=2000)
    assert bool(r0.converged) and bool(rp.converged)
    np.testing.assert_allclose(np.asarray(rp.x)[:n], np.asarray(r0.x),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_array_equal(np.asarray(rp.x)[n:], 0.0)


def test_fp32_operator_reports_symmetric():
    """ADVICE round 1: the fixed 1e-8 symmetry tolerance misclassified
    genuinely symmetric fp32 operators (fp32 dot noise ~ sqrt(n)*eps);
    the dtype-scaled tolerance must report symmetric=True."""
    from topopteval_tpu.fem.robust import check_operator_properties

    mesh = generate_grid_tet(8, 4, 4, (0, 0, 0), (8.0, 4.0, 4.0))
    fixed = DirichletBC.fixed(nodes_at_plane(mesh, 0, 0.0))
    dm = mesh.device(dtype=jnp.float32)
    mask = free_mask_from_bcs(mesh.n_dofs, [fixed])
    op = StiffnessOperator.build(dm, LAM, MU,
                                 free_mask=jnp.asarray(mask, jnp.float32))
    props = check_operator_properties(op)
    assert props.symmetric
    assert props.positive_definite
