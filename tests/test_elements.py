"""Element-kernel unit tests the reference lacks (SURVEY.md §4):
single-element Ke vs a dense B^T D B oracle, closed-form Tet4 stiffness
properties, rigid-body nullity, patch consistency, volumes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from topopteval_tpu.materials import elasticity_matrix, lame_parameters
from topopteval_tpu.ops.elements import (apply_element_stiffness,
                                         element_stiffness, element_tables,
                                         element_volumes,
                                         physical_gradients,
                                         strain_displacement_matrix)

LAM, MU = lame_parameters(1.0, 0.3)

TET = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
TET_SKEW = np.array([[0.1, 0.2, -0.1], [1.3, 0.1, 0.2],
                     [0.3, 1.1, 0.05], [0.2, 0.3, 1.4]])
HEX = np.array([[0.0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]])
HEX_SKEW = HEX + 0.1 * np.array(
    [[0.3, -0.2, 0.1], [0.1, 0.2, -0.3], [-0.1, 0.3, 0.2], [0.2, 0.1, 0.3],
     [0.3, 0.2, -0.1], [-0.2, 0.1, 0.2], [0.1, -0.3, 0.1], [0.2, 0.2, -0.2]])


def _tet10_nodes(tet_corners):
    edges = [(0, 1), (1, 2), (2, 0), (0, 3), (1, 3), (2, 3)]
    mids = [(tet_corners[a] + tet_corners[b]) / 2 for a, b in edges]
    return np.vstack([tet_corners, mids])


def oracle_ke(coords, etype, lam=LAM, mu=MU, order=2):
    """Dense Voigt B^T D B assembly — independent of the einsum identity."""
    ce = jnp.asarray(coords)[None]
    g, wdet = physical_gradients(ce, etype, order)
    B = strain_displacement_matrix(g)[0]          # [nqp, 6, 3k]
    D = elasticity_matrix(lam, mu)
    Ke = sum(np.asarray(B[q]).T @ D @ np.asarray(B[q]) * float(wdet[0, q])
             for q in range(B.shape[0]))
    return Ke


CASES = [("tet4", TET), ("tet4", TET_SKEW), ("hex8", HEX), ("hex8", HEX_SKEW),
         ("tet10", _tet10_nodes(TET)), ("tet10", _tet10_nodes(TET_SKEW))]


@pytest.mark.parametrize("etype,coords", CASES)
def test_ke_matches_btdb_oracle(etype, coords):
    Ke = np.asarray(element_stiffness(jnp.asarray(coords)[None], LAM, MU,
                                      etype)[0])
    np.testing.assert_allclose(Ke, oracle_ke(coords, etype), rtol=1e-12,
                               atol=1e-12)


@pytest.mark.parametrize("etype,coords", CASES)
def test_ke_symmetric_psd_rigid_body_nullity(etype, coords):
    Ke = np.asarray(element_stiffness(jnp.asarray(coords)[None], LAM, MU,
                                      etype)[0])
    np.testing.assert_allclose(Ke, Ke.T, atol=1e-12)
    w = np.linalg.eigvalsh(Ke)
    # exactly 6 rigid-body modes (3 translations + 3 rotations)
    assert np.sum(np.abs(w) < 1e-10 * max(abs(w))) == 6
    assert w[6] > 0  # rest strictly positive


@pytest.mark.parametrize("etype,coords", CASES)
def test_rigid_translation_and_rotation_in_nullspace(etype, coords):
    Ke = np.asarray(element_stiffness(jnp.asarray(coords)[None], LAM, MU,
                                      etype)[0])
    k = coords.shape[0]
    # translation
    for a in range(3):
        u = np.zeros((k, 3))
        u[:, a] = 1.0
        np.testing.assert_allclose(Ke @ u.reshape(-1), 0, atol=1e-10)
    # infinitesimal rotation u = omega x x
    omega = np.array([0.3, -0.2, 0.7])
    u = np.cross(np.broadcast_to(omega, (k, 3)), coords)
    np.testing.assert_allclose(Ke @ u.reshape(-1), 0, atol=1e-9)


@pytest.mark.parametrize("etype,coords", CASES)
def test_matrix_free_application_matches_ke(etype, coords):
    rng = np.random.default_rng(3)
    ce = jnp.asarray(coords)[None]
    Ke = np.asarray(element_stiffness(ce, LAM, MU, etype)[0])
    u = rng.standard_normal((coords.shape[0], 3))
    fe = np.asarray(apply_element_stiffness(ce, jnp.asarray(u)[None], LAM, MU,
                                            etype)[0])
    np.testing.assert_allclose(fe.reshape(-1), Ke @ u.reshape(-1),
                               rtol=1e-12, atol=1e-12)


def test_linear_patch_consistency_tet4():
    """For u = A x (uniform strain), internal force must equal Ke u and the
    energy must equal V * eps:C:eps / 2 — a classic patch test."""
    A = np.array([[0.1, 0.02, 0.0], [0.02, -0.05, 0.01], [0.0, 0.01, 0.03]])
    coords = TET_SKEW
    u = coords @ A.T
    ce = jnp.asarray(coords)[None]
    fe = np.asarray(apply_element_stiffness(ce, jnp.asarray(u)[None], LAM, MU,
                                            "tet4")[0])
    energy = 0.5 * np.dot(u.reshape(-1), fe.reshape(-1))
    eps = 0.5 * (A + A.T)
    sigma = LAM * np.trace(eps) * np.eye(3) + 2 * MU * eps
    V = float(element_volumes(ce, "tet4")[0])
    np.testing.assert_allclose(energy, 0.5 * V * np.tensordot(sigma, eps),
                               rtol=1e-12)


def test_element_volumes():
    vols = element_volumes(jnp.asarray(np.stack([TET, TET_SKEW])), "tet4")
    # |det([v1-v0, v2-v0, v3-v0])|/6
    for i, c in enumerate([TET, TET_SKEW]):
        expect = abs(np.linalg.det(c[1:] - c[0])) / 6.0
        np.testing.assert_allclose(float(vols[i]), expect, rtol=1e-12)
    vol_hex = float(element_volumes(jnp.asarray(HEX)[None], "hex8")[0])
    np.testing.assert_allclose(vol_hex, 1.0, rtol=1e-12)
    vol_t10 = float(element_volumes(
        jnp.asarray(_tet10_nodes(TET_SKEW))[None], "tet10")[0])
    np.testing.assert_allclose(
        vol_t10, abs(np.linalg.det(TET_SKEW[1:] - TET_SKEW[0])) / 6.0,
        rtol=1e-12)


def test_quadrature_tables():
    for etype, nqp, wsum in [("tet4", 4, 1 / 6), ("hex8", 8, 8.0),
                             ("tet10", 4, 1 / 6)]:
        N, dN, w = element_tables(etype, 2)
        assert N.shape[0] == nqp and dN.shape[0] == nqp
        np.testing.assert_allclose(w.sum(), wsum, rtol=1e-15)
        # partition of unity + zero gradient sum
        np.testing.assert_allclose(N.sum(axis=1), 1.0, atol=1e-14)
        np.testing.assert_allclose(dN.sum(axis=1), 0.0, atol=1e-14)


def test_tet10_quadratic_field_exact():
    """Quadratic interpolation reproduces a quadratic scalar field's
    gradient exactly at the quadrature points."""
    coords = _tet10_nodes(TET)

    def field(p):
        x, y, z = p
        return 2 * x * x + x * y - z * z + 3 * y + 1

    def grad(p):
        x, y, z = p
        return np.array([4 * x + y, x + 3, -2 * z])

    vals = np.array([field(p) for p in coords])
    ce = jnp.asarray(coords)[None]
    g, _ = physical_gradients(ce, "tet10")   # [1, nqp, 10, 3]
    pts, _ = element_tables("tet10", 2)[0], None
    N, dN, w = element_tables("tet10", 2)
    # quadrature point physical positions == reference points here (identity map)
    from topopteval_tpu.ops.elements import QUADRATURE
    qpts = QUADRATURE[("tet", 2)][0]
    for q, xi in enumerate(qpts):
        gh = np.asarray(g[0, q]).T @ vals
        np.testing.assert_allclose(gh, grad(xi), rtol=1e-12, atol=1e-12)
