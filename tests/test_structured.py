"""Stencil operator vs general operator equivalence + MG integration."""

import jax.numpy as jnp
import numpy as np
import pytest

from topopteval_tpu.fem.bc import (DirichletBC, free_mask_from_bcs,
                                   nodes_at_plane)
from topopteval_tpu.fem.operator import StiffnessOperator
from topopteval_tpu.fem.structured import StructuredStiffnessOperator
from topopteval_tpu.materials import lame_parameters
from topopteval_tpu.models.beams import generate_grid_tet

LAM, MU = lame_parameters(1.0, 0.3)


def _pair(nx=6, ny=4, nz=2, box=(3.0, 2.4, 1.0), mask=True, escale=None):
    mesh = generate_grid_tet(nx, ny, nz, (0, 0, 0), box)
    fm = None
    if mask:
        fm = free_mask_from_bcs(
            mesh.n_dofs, [DirichletBC.fixed(nodes_at_plane(mesh, 0, 0.0))])
    dmesh = mesh.device(dtype=jnp.float64)
    lam_e = np.full(mesh.n_cells, LAM)
    mu_e = np.full(mesh.n_cells, MU)
    if escale is not None:
        # per-hex scale expanded to the 6 tets of each hex; the generator
        # flattens hexes in (ix, iy, iz) ij-order (models/beams.py)
        per_tet = np.repeat(escale.transpose(2, 1, 0).reshape(-1), 6)
        lam_e = lam_e * per_tet
        mu_e = mu_e * per_tet
    gen = StiffnessOperator.build(
        dmesh, lam_e, mu_e,
        free_mask=None if fm is None else jnp.asarray(fm, jnp.float64),
        mode="otf", order=1)
    st = StructuredStiffnessOperator.build(
        nx, ny, nz, (0, 0, 0), box, LAM, MU, free_mask=fm,
        escale=escale, dtype=jnp.float64)
    return mesh, gen, st


@pytest.mark.parametrize("mask", [False, True])
def test_structured_matvec_matches_general(mask):
    mesh, gen, st = _pair(mask=mask)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(mesh.n_dofs))
    a = np.asarray(gen.matvec(u) if mask else gen.matvec_raw(u))
    b = np.asarray(st.matvec(u) if mask else st.matvec_raw(u))
    np.testing.assert_allclose(b, a, rtol=1e-11, atol=1e-12)


def test_structured_simp_scaling():
    rng = np.random.default_rng(1)
    escale = rng.uniform(0.1, 1.0, (2, 4, 6))   # [nz, ny, nx]
    mesh, gen, st = _pair(mask=True, escale=escale)
    u = jnp.asarray(rng.standard_normal(mesh.n_dofs))
    np.testing.assert_allclose(np.asarray(st.matvec(u)),
                               np.asarray(gen.matvec(u)),
                               rtol=1e-11, atol=1e-12)


def test_structured_hex_ke_matches_matvec():
    """The assembled 24x24 hex stiffness (_hex_ke, the constant the
    fused Pallas stencil kernel bakes in) applied on a single-hex mesh
    equals the slice-formulation matvec."""
    rng = np.random.default_rng(2)
    st = StructuredStiffnessOperator.build(
        1, 1, 1, (0, 0, 0), (0.5, 0.4, 0.3), LAM, MU, dtype=jnp.float64)
    ke = st._hex_ke()                          # VTK corner-major k*3+a
    u = rng.standard_normal(24)
    ref = np.asarray(st.matvec_raw(jnp.asarray(u)))
    # lattice DOF (node (iz,iy,ix) flat = iz*4+iy*2+ix) <-> VTK corner
    from topopteval_tpu.fem.structured import _CORNER_OFFSETS
    perm = np.array([(oz * 4 + oy * 2 + ox) * 3 + a
                     for (oz, oy, ox) in _CORNER_OFFSETS
                     for a in range(3)])
    f = ke @ u[perm]
    out = np.zeros(24)
    out[perm] = f
    np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-13)


def test_structured_conv_matches_slices(monkeypatch):
    """Two-conv MXU formulation (TOPOPT_STENCIL=conv) == slice
    formulation, including SIMP scaling and Dirichlet mask — and
    boundary-exact (the gather conv is VALID over real cells only)."""
    rng = np.random.default_rng(2)
    escale = rng.uniform(0.1, 1.0, (2, 4, 6))
    for esc in (None, escale):
        mesh, _, st = _pair(mask=True, escale=esc)
        u = jnp.asarray(rng.standard_normal(mesh.n_dofs))
        monkeypatch.setenv("TOPOPT_STENCIL", "slices")
        ref = np.asarray(st.matvec(u))
        monkeypatch.setenv("TOPOPT_STENCIL", "conv")
        got = np.asarray(st.matvec(u))
        np.testing.assert_allclose(got, ref, rtol=1e-11, atol=1e-12)


def test_structured_pallas_matches_slices(monkeypatch):
    """Fused Pallas stencil kernel (interpret mode on CPU) == slice
    formulation: uniform + SIMP, masked, fp64 to machine eps.  The
    difference-first accumulation (rigid-body row-sum identity) is
    load-bearing for fp32 energy accuracy on chip — see
    ops/pallas_stencil.py."""
    rng = np.random.default_rng(3)
    escale = rng.uniform(0.1, 1.0, (2, 4, 6))
    for esc in (None, escale):
        mesh, _, st = _pair(mask=True, escale=esc)
        u = jnp.asarray(rng.standard_normal(mesh.n_dofs))
        monkeypatch.setenv("TOPOPT_STENCIL", "slices")
        ref = np.asarray(st.matvec(u))
        monkeypatch.setenv("TOPOPT_STENCIL", "pallas")
        got = np.asarray(st.matvec(u))
        np.testing.assert_allclose(got, ref, rtol=1e-11, atol=1e-12)


def test_structured_pallas_window_matches_slices(monkeypatch):
    """Opt-in z-blocked window kernel (TOPOPT_STENCIL_KERNEL=window) ==
    slice formulation at several z extents (NB/NZB block seams, front/
    back halo blocks).  Chip-validated separately (tpu_stencil_parity);
    slower than the per-plane kernel at headline scale, so opt-in."""
    rng = np.random.default_rng(7)
    # small window cap => NB=1..2 at these sizes: exercises multi-block
    monkeypatch.setenv("TOPOPT_STENCIL_WINDOW_MAX", str(64 * 1024))
    for dims in ((6, 4, 2), (4, 3, 7)):
        nx, ny, nz = dims
        escale = rng.uniform(0.1, 1.0, (nz, ny, nx))
        for esc in (None, escale):
            mesh, _, st = _pair(nx=nx, ny=ny, nz=nz, mask=True,
                                escale=esc)
            u = jnp.asarray(rng.standard_normal(mesh.n_dofs))
            monkeypatch.setenv("TOPOPT_STENCIL", "slices")
            ref = np.asarray(st.matvec(u))
            monkeypatch.setenv("TOPOPT_STENCIL", "pallas")
            monkeypatch.setenv("TOPOPT_STENCIL_KERNEL", "window")
            got = np.asarray(st.matvec(u))
            monkeypatch.delenv("TOPOPT_STENCIL_KERNEL")
            np.testing.assert_allclose(got, ref, rtol=1e-11, atol=1e-12)


def test_structured_blocks_and_diagonal():
    mesh, gen, st = _pair(mask=True)
    np.testing.assert_allclose(np.asarray(st.node_blocks_raw()),
                               np.asarray(gen.node_blocks_raw()),
                               rtol=1e-11, atol=1e-12)
    np.testing.assert_allclose(np.asarray(st.diagonal()),
                               np.asarray(gen.diagonal()),
                               rtol=1e-11, atol=1e-12)
