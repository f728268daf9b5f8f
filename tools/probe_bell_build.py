"""Phase-level timing probe for the BELL skeleton/value build at bench
scale (round-5 work on round-4 VERDICT #1: cold build <= 120 s,
density swap <= 30 s).  Prints one line per phase so the stall watchdog
sees progress.  Run on the real chip via tools/run_tpu.sh."""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax.numpy as jnp  # noqa: E402

from topopteval_tpu.fem.bc import free_mask_from_bcs, nodes_at_plane  # noqa: E402
from topopteval_tpu.fem.bell import (build_bell_skeleton,  # noqa: E402
                                     build_bell_values)
from topopteval_tpu.fem.bc import DirichletBC  # noqa: E402
from topopteval_tpu.materials import (SIMPMaterial,  # noqa: E402
                                      lame_parameters)
from topopteval_tpu.models.beams import generate_grid_tet  # noqa: E402
from topopteval_tpu.models.density import bench_simp_density  # noqa: E402


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    nx, ny, nz = 25 * scale // 2, 4 * scale, scale
    t0 = time.perf_counter()
    mesh = generate_grid_tet(nx, ny, nz, (0.0, 0.0, 0.0),
                             (60.0, 20.0, 4.0))
    mesh.structured_info = None
    print(f"mesh gen: {time.perf_counter() - t0:.1f}s "
          f"({mesh.n_cells} tets)", flush=True)
    fixed = nodes_at_plane(mesh, 0, 0.0)
    mask = free_mask_from_bcs(mesh.n_dofs, [DirichletBC.fixed(fixed)])

    t0 = time.perf_counter()
    skel = build_bell_skeleton(mesh, free_mask=mask, verbose=True)
    print(f"SKELETON total: {time.perf_counter() - t0:.1f}s", flush=True)

    lam0, mu0 = lame_parameters(1.0, 0.3)
    lam = np.full(mesh.n_cells, lam0)
    mu = np.full(mesh.n_cells, mu0)
    t0 = time.perf_counter()
    sys_u, mg_u, info_u = build_bell_values(skel, lam, mu,
                                            dtype=jnp.float32,
                                            verbose=True)
    print(f"VALUES (uniform) total: {time.perf_counter() - t0:.1f}s "
          f"phases={info_u['phases']}", flush=True)

    t0 = time.perf_counter()
    rho = bench_simp_density(nx, ny, nz)
    print(f"density resample: {time.perf_counter() - t0:.1f}s", flush=True)
    mat = SIMPMaterial(E0=1.0, nu=0.3, Emin=1e-8, p=3.0)
    lam_s, mu_s = mat.lame(rho)
    t0 = time.perf_counter()
    sys_s, mg_s, info_s = build_bell_values(skel, np.asarray(lam_s),
                                            np.asarray(mu_s),
                                            dtype=jnp.float32,
                                            verbose=True)
    print(f"VALUES (simp swap) total: {time.perf_counter() - t0:.1f}s "
          f"phases={info_s['phases']}", flush=True)


if __name__ == "__main__":
    main()
