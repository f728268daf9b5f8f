"""Stress invariant + recovery tests (reference math:
FiniteElementAnalysis.jl:440-509; ResultsExport.jl:69-88)."""

import jax.numpy as jnp
import numpy as np

from topopteval_tpu.materials import lame_parameters
from topopteval_tpu.models.beams import generate_grid_tet
from topopteval_tpu.ops.stress import (principal_stresses, stress_summary,
                                       von_mises)

LAM, MU = lame_parameters(1.0, 0.3)


def test_von_mises_uniaxial_and_shear():
    s = np.zeros((2, 3, 3))
    s[0, 0, 0] = 5.0                      # uniaxial: vm = |sigma|
    s[1, 0, 1] = s[1, 1, 0] = 3.0         # pure shear: vm = sqrt(3)*tau
    vm = np.asarray(von_mises(jnp.asarray(s)))
    np.testing.assert_allclose(vm, [5.0, 3.0 * np.sqrt(3)], rtol=1e-12)


def test_von_mises_invariant_to_hydrostatic():
    rng = np.random.default_rng(5)
    a = rng.standard_normal((10, 3, 3))
    s = 0.5 * (a + np.swapaxes(a, 1, 2))
    shifted = s + 7.3 * np.eye(3)
    np.testing.assert_allclose(np.asarray(von_mises(jnp.asarray(s))),
                               np.asarray(von_mises(jnp.asarray(shifted))),
                               rtol=1e-9, atol=1e-10)


def test_principal_stresses_match_eigvalsh():
    rng = np.random.default_rng(7)
    a = rng.standard_normal((50, 3, 3)) * 10
    s = 0.5 * (a + np.swapaxes(a, 1, 2))
    # include degenerate cases
    s[0] = np.eye(3) * 2.0
    s[1] = 0.0
    s[2] = np.diag([1.0, 1.0, 5.0])
    ours = np.asarray(principal_stresses(jnp.asarray(s)))
    ref = np.linalg.eigvalsh(s)
    np.testing.assert_allclose(ours, ref, rtol=1e-8, atol=1e-8)


def test_uniform_strain_recovery():
    """u = A x on any mesh → uniform stress everywhere, vm constant."""
    mesh = generate_grid_tet(3, 2, 2)
    A = np.array([[0.01, 0.002, 0.0], [0.002, -0.005, 0.001],
                  [0.0, 0.001, 0.003]])
    u = (mesh.coords @ A.T).reshape(-1)
    dmesh = mesh.device(dtype=jnp.float64)
    sigma_qp, avg, vm, mx, cell = stress_summary(
        dmesh, jnp.asarray(u), LAM, MU)
    eps = 0.5 * (A + A.T)
    expect = LAM * np.trace(eps) * np.eye(3) + 2 * MU * eps
    np.testing.assert_allclose(
        np.asarray(avg), np.broadcast_to(expect, np.asarray(avg).shape),
        rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sigma_qp),
                               np.broadcast_to(
                                   expect, np.asarray(sigma_qp).shape),
                               rtol=1e-10, atol=1e-12)
    vmv = np.asarray(vm)
    np.testing.assert_allclose(vmv, vmv[0], rtol=1e-10)
    np.testing.assert_allclose(float(mx), vmv[0], rtol=1e-10)
