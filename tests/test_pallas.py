"""Pallas kernel parity vs the einsum reference path (interpret mode on
CPU; the same kernels run compiled on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from topopteval_tpu.materials import lame_parameters
from topopteval_tpu.models.beams import generate_grid_tet
from topopteval_tpu.ops.elements import (apply_element_stiffness,
                                         element_stiffness)
from topopteval_tpu.ops.pallas_kernels import (tet4_apply_pallas,
                                               tet4_element_stiffness_pallas)

LAM, MU = lame_parameters(1.0, 0.3)


@pytest.fixture(scope="module")
def batch():
    mesh = generate_grid_tet(2, 2, 1, (0, 0, 0), (2.5, 1.5, 1.0))
    dmesh = mesh.device(dtype=jnp.float64)
    coords_e = dmesh.coords[dmesh.conn]
    C = coords_e.shape[0]
    lam = jnp.full(C, LAM, jnp.float64)
    mu = jnp.full(C, MU, jnp.float64)
    return coords_e, lam, mu


def test_pallas_ke_matches_einsum(batch):
    coords_e, lam, mu = batch
    ke_ref = element_stiffness(coords_e, lam, mu, "tet4", 2)
    ke_pal = tet4_element_stiffness_pallas(coords_e, lam, mu, block=8,
                                           interpret=True)
    np.testing.assert_allclose(np.asarray(ke_pal), np.asarray(ke_ref),
                               rtol=1e-12, atol=1e-12)


def test_pallas_ke_nonuniform_material(batch):
    coords_e, _, _ = batch
    C = coords_e.shape[0]
    rng = np.random.default_rng(0)
    lam = jnp.asarray(rng.uniform(0.1, 2.0, C))
    mu = jnp.asarray(rng.uniform(0.1, 2.0, C))
    ke_ref = element_stiffness(coords_e, lam, mu, "tet4", 2)
    ke_pal = tet4_element_stiffness_pallas(coords_e, lam, mu, block=8,
                                           interpret=True)
    np.testing.assert_allclose(np.asarray(ke_pal), np.asarray(ke_ref),
                               rtol=1e-12, atol=1e-12)


def test_pallas_apply_matches_einsum(batch):
    coords_e, lam, mu = batch
    C = coords_e.shape[0]
    rng = np.random.default_rng(1)
    u_e = jnp.asarray(rng.standard_normal((C, 4, 3)))
    f_ref = apply_element_stiffness(coords_e, u_e, lam, mu, "tet4", 2)
    f_pal = tet4_apply_pallas(coords_e, u_e, lam, mu, block=8,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(f_pal), np.asarray(f_ref),
                               rtol=1e-11, atol=1e-12)


def test_pallas_handles_padding_blocks(batch):
    """C not a multiple of block: padded elements are dropped."""
    coords_e, lam, mu = batch
    ke_pal = tet4_element_stiffness_pallas(coords_e, lam, mu, block=256,
                                           interpret=True)
    assert ke_pal.shape == (coords_e.shape[0], 12, 12)
    ke_ref = element_stiffness(coords_e, lam, mu, "tet4", 2)
    np.testing.assert_allclose(np.asarray(ke_pal), np.asarray(ke_ref),
                               rtol=1e-12, atol=1e-14)


def test_hex8_apply_pallas_matches_einsum():
    from topopteval_tpu.models.beams import generate_grid_hex
    from topopteval_tpu.ops.pallas_kernels import hex8_apply_pallas
    mesh = generate_grid_hex(3, 2, 2, (0, 0, 0), (1.3, 0.9, 1.1))
    # perturb to non-affine hexes
    rng = np.random.default_rng(4)
    mesh.coords += 0.03 * rng.standard_normal(mesh.coords.shape)
    dmesh = mesh.device(dtype=jnp.float64)
    coords_e = dmesh.coords[dmesh.conn]
    C = coords_e.shape[0]
    lam = jnp.asarray(rng.uniform(0.3, 2.0, C))
    mu = jnp.asarray(rng.uniform(0.3, 2.0, C))
    u_e = jnp.asarray(rng.standard_normal((C, 8, 3)))
    f_ref = apply_element_stiffness(coords_e, u_e, lam, mu, "hex8", 2)
    f_pal = hex8_apply_pallas(coords_e, u_e, lam, mu, block=8,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(f_pal), np.asarray(f_ref),
                               rtol=1e-11, atol=1e-12)


def _hex_batch(perturb=True):
    # small batch + block=8: interpret-mode emulation cost is per padded
    # element, and per-element parity needs few elements (real-hardware
    # full-block parity lives in tools/tpu_aligned_probe.py + bench)
    from topopteval_tpu.models.beams import generate_grid_hex
    mesh = generate_grid_hex(2, 2, 1, (0, 0, 0), (2.0, 1.5, 1.0))
    coords = mesh.coords.copy()
    if perturb:                      # non-affine hexes exercise the full
        rng = np.random.default_rng(7)   # isoparametric path
        coords += rng.uniform(-0.05, 0.05, coords.shape)
    dmesh_coords = jnp.asarray(coords)
    coords_e = dmesh_coords[jnp.asarray(mesh.conn)]
    C = coords_e.shape[0]
    return coords_e, jnp.full(C, LAM, jnp.float64), jnp.full(
        C, MU, jnp.float64)


def _tet10_batch():
    mesh = generate_grid_tet(2, 1, 1, (0, 0, 0), (1.5, 1.0, 1.0))
    mesh = mesh.to_quadratic()
    coords = mesh.coords.copy()
    rng = np.random.default_rng(8)   # curve the mid-edge nodes slightly
    coords[mesh.conn[:, 4:].reshape(-1)] += rng.uniform(
        -0.01, 0.01, (mesh.conn[:, 4:].size, 3))
    dmesh_coords = jnp.asarray(coords)
    coords_e = dmesh_coords[jnp.asarray(mesh.conn)]
    C = coords_e.shape[0]
    return coords_e, jnp.full(C, LAM, jnp.float64), jnp.full(
        C, MU, jnp.float64)


def test_hex8_ke_pallas_matches_einsum():
    from topopteval_tpu.ops.pallas_kernels import \
        hex8_element_stiffness_pallas
    coords_e, lam, mu = _hex_batch()
    ke_ref = element_stiffness(coords_e, lam, mu, "hex8", 2)
    ke_pal = hex8_element_stiffness_pallas(coords_e, lam, mu, block=8,
                                           interpret=True)
    np.testing.assert_allclose(np.asarray(ke_pal), np.asarray(ke_ref),
                               rtol=1e-11, atol=1e-12)


def test_tet10_apply_pallas_matches_einsum():
    from topopteval_tpu.ops.pallas_kernels import tet10_apply_pallas
    coords_e, lam, mu = _tet10_batch()
    C = coords_e.shape[0]
    rng = np.random.default_rng(2)
    u_e = jnp.asarray(rng.standard_normal((C, 10, 3)))
    f_ref = apply_element_stiffness(coords_e, u_e, lam, mu, "tet10", 2)
    f_pal = tet10_apply_pallas(coords_e, u_e, lam, mu, block=8,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(f_pal), np.asarray(f_ref),
                               rtol=1e-10, atol=1e-11)


def test_tet10_ke_pallas_matches_einsum():
    from topopteval_tpu.ops.pallas_kernels import \
        tet10_element_stiffness_pallas
    coords_e, lam, mu = _tet10_batch()
    ke_ref = element_stiffness(coords_e, lam, mu, "tet10", 2)
    ke_pal = tet10_element_stiffness_pallas(coords_e, lam, mu, block=8,
                                            interpret=True)
    np.testing.assert_allclose(np.asarray(ke_pal), np.asarray(ke_ref),
                               rtol=1e-10, atol=1e-11)


def test_tet10_ke_nonuniform_material():
    from topopteval_tpu.ops.pallas_kernels import \
        tet10_element_stiffness_pallas
    coords_e, _, _ = _tet10_batch()
    C = coords_e.shape[0]
    rng = np.random.default_rng(3)
    lam = jnp.asarray(rng.uniform(0.1, 2.0, C))
    mu = jnp.asarray(rng.uniform(0.1, 2.0, C))
    ke_ref = element_stiffness(coords_e, lam, mu, "tet10", 2)
    ke_pal = tet10_element_stiffness_pallas(coords_e, lam, mu, block=8,
                                            interpret=True)
    np.testing.assert_allclose(np.asarray(ke_pal), np.asarray(ke_ref),
                               rtol=1e-10, atol=1e-11)
