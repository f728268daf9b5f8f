"""Host-side full-scale validation of the BELL MG-PCG solve path.

Rebuilds the bench-scale BELL hierarchy with the current build code
(gap-based coarsest eigencut) and runs the REAL fp32 CG+V-cycle path on
the CPU backend with the bench rhs, then checks the energy against the
committed fp64 oracle table (data/oracle_energies.json).

This is the discriminator for the round-3 wrong-energy bug: the old
fixed fp32 eigencutoff zeroed the beam's two global bending modes at the
coarsest level (energy -702 vs oracle +324 while backward-stable).

Usage: python tools/host_bell_validate.py [scale=16] [tol=1e-6]
"""

import json
import os
import sys
import time

# sitecustomize pins JAX_PLATFORMS=axon — force CPU (this is a HOST
# validation; the chip run is tools/bench_unstructured.py via run_tpu.sh)
os.environ["JAX_PLATFORMS"] = "cpu"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def log(msg):
    print(msg, flush=True)


def main():
    import jax.numpy as jnp

    from topopteval_tpu.fem.bc import (DirichletBC, free_mask_from_bcs,
                                       nodes_at_plane)
    from topopteval_tpu.fem.bell import build_bell_multigrid
    from topopteval_tpu.fem.solvers import cg
    from topopteval_tpu.materials import lame_parameters
    from topopteval_tpu.models.beams import generate_grid_tet

    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    tol = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-6
    nx, ny, nz = 25 * scale // 2, 4 * scale, scale
    lam, mu = lame_parameters(1.0, 0.3)

    t0 = time.perf_counter()
    mesh = generate_grid_tet(nx, ny, nz, (0.0, 0.0, 0.0),
                             (60.0, 20.0, 4.0))
    log(f"mesh: {mesh.n_cells} tets, {mesh.n_dofs} dofs "
        f"({time.perf_counter() - t0:.1f}s)")

    fixed = nodes_at_plane(mesh, 0, 0.0)
    mask = free_mask_from_bcs(mesh.n_dofs, [DirichletBC.fixed(fixed)])
    f = np.zeros(mesh.n_dofs)
    tip = np.asarray(nodes_at_plane(mesh, 0, 60.0))
    f[3 * tip + 2] = -1.0 / len(tip)

    t0 = time.perf_counter()
    system, mg, info = build_bell_multigrid(
        mesh, lam, mu, free_mask=mask, dtype=jnp.float32,
        use_pallas=False, verbose=True)
    log(f"build: {time.perf_counter() - t0:.1f}s, phases={info['phases']}")

    from topopteval_tpu.api import _refined_cg
    mask64 = np.asarray(system.matrix.free_mask, np.float64)
    f64 = system.to_cm(f * mask) * mask64
    f_cm = jnp.asarray(f64, jnp.float32)
    t0 = time.perf_counter()
    u_cm, niter, tr_ir, conv, _ = _refined_cg(
        system, system.matrix, mg, f64, tol, 600, chunk=50)
    log(f"refined cg: {niter} iters, converged={conv}, "
        f"true_r={tr_ir:.3e} ({time.perf_counter() - t0:.1f}s)")

    # energy = 1/2 u.f — the shipped formula (api op.energy/bench.py).
    # NOT 1/2 u'Ku: that form's error is +1/2 r'K^-1 r, first-order
    # large at the fp32 attainable-residual floor, while 1/2 u.f only
    # sees -1/2 r'u*, suppressed by CG's r-orthogonality.
    energy = 0.5 * float(u_cm @ np.asarray(f_cm, np.float64))
    tr = float(np.linalg.norm(f64 - system.matvec64(u_cm)))

    table = os.path.join(REPO, "data", "oracle_energies.json")
    e_oracle = None
    if os.path.exists(table):
        with open(table) as fh:
            e_oracle = json.load(fh).get(f"tet_beam_scale_{scale}")
    log(f"energy {energy:.6e}, true_r {tr:.3e}")
    if e_oracle is not None:
        rel = abs(energy - e_oracle) / abs(e_oracle)
        verdict = "PASS" if rel < 1e-4 else "FAIL"
        log(f"oracle {e_oracle:.6e}, rel err {rel:.2e}  [{verdict}]")
        sys.exit(0 if rel < 1e-4 else 1)
    log("no oracle entry for this scale")


if __name__ == "__main__":
    main()
