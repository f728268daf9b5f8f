"""Gather/scatter plan equivalence: flat segment plan vs row incidence
plan (the TPU data path, see ops/scatter.py)."""

import jax.numpy as jnp
import numpy as np

from topopteval_tpu.mesh import element_dofs
from topopteval_tpu.models.beams import generate_grid_hex, generate_grid_tet
from topopteval_tpu.ops.scatter import RowScatterPlan, ScatterPlan


def _plans(mesh):
    flat = ScatterPlan.build(element_dofs(mesh.conn), mesh.n_dofs)
    row = RowScatterPlan.build(mesh.conn, mesh.n_nodes)
    return flat, row


def test_gather_equivalence():
    mesh = generate_grid_tet(4, 3, 2)
    flat, row = _plans(mesh)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(mesh.n_dofs))
    k = mesh.nodes_per_cell
    np.testing.assert_array_equal(
        np.asarray(flat.gather(u)).reshape(-1, k, 3),
        np.asarray(row.gather(u)))


def test_scatter_equivalence():
    for mesh in [generate_grid_tet(4, 3, 2), generate_grid_hex(3, 2, 2)]:
        flat, row = _plans(mesh)
        C, k = mesh.conn.shape
        rng = np.random.default_rng(1)
        fe = jnp.asarray(rng.standard_normal((C, k, 3)))
        out_flat = np.asarray(flat.scatter_add(fe.reshape(C, -1)))
        out_row = np.asarray(row.scatter_add(fe)).reshape(-1)
        np.testing.assert_allclose(out_row, out_flat, rtol=1e-12,
                                   atol=1e-14)


def test_scatter_feature_dims():
    """Row scatter handles arbitrary trailing features (3x3 blocks)."""
    mesh = generate_grid_tet(2, 2, 2)
    row = RowScatterPlan.build(mesh.conn, mesh.n_nodes)
    C, k = mesh.conn.shape
    rng = np.random.default_rng(2)
    blocks = rng.standard_normal((C, k, 3))
    out = np.asarray(row.scatter_add(jnp.asarray(blocks)))
    # oracle via np.add.at
    oracle = np.zeros((mesh.n_nodes, 3))
    np.add.at(oracle, mesh.conn.reshape(-1), blocks.reshape(-1, 3))
    np.testing.assert_allclose(out, oracle, rtol=1e-12)


def test_max_degree_structured_tet():
    mesh = generate_grid_tet(4, 4, 4)
    row = RowScatterPlan.build(mesh.conn, mesh.n_nodes)
    assert row.max_degree == 24   # 6-tet split: interior node degree
