"""Sweep MG-PCG (nu, unroll) configs at the bench problem under the
correct integrity criterion (backward error), timing each.

The earlier 'unroll=2 miscompiles' diagnosis was judged by the broken
absolute-residual gate; retest it properly here.
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax.numpy as jnp

    from topopteval_tpu.fem.bc import nodes_at_plane
    from topopteval_tpu.fem.multigrid import build_structured_multigrid
    from topopteval_tpu.fem.solvers import cg
    from topopteval_tpu.materials import lame_parameters
    from topopteval_tpu.utils import set_verbosity

    set_verbosity(False)
    dtype = jnp.float32
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    nx, ny, nz = 25 * scale // 2, 4 * scale, scale
    lam, mu = lame_parameters(1.0, 0.3)

    t0 = time.perf_counter()
    mesh, op, mg = build_structured_multigrid(
        nx, ny, nz, (0.0, 0.0, 0.0), (60.0, 20.0, 4.0), lam, mu,
        dtype=dtype, omega=0.7, nu=2)
    print(f"mesh: {mesh.n_cells} tets, {mesh.n_dofs} dofs "
          f"({time.perf_counter() - t0:.1f}s build)", flush=True)

    tip = nodes_at_plane(mesh, 0, 60.0)
    f = np.zeros(mesh.n_dofs)
    f[tip * 3 + 2] = -1.0 / tip.size
    f_dev = jnp.asarray(f, dtype) * op.free_mask
    rnorm0 = float(jnp.linalg.norm(f_dev))
    tol = 1e-6
    oracle_energy = 324.121241 if scale == 16 else None
    if oracle_energy is None:
        print("WARNING: no fp64 oracle energy at this scale — 'OK' means "
              "backward-error only, which known miscompiles pass",
              flush=True)

    # ||A||_2 once, from a solution-independent random start (a wrong
    # first solve must not poison the judgment of later configs)
    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.standard_normal(mesh.n_dofs), dtype)
    v = v / jnp.linalg.norm(v)
    lam_max = 0.0
    for _ in range(20):
        w = op.matvec(v)
        lam_max = float(jnp.linalg.norm(w))
        v = w / lam_max

    def run(nu, unroll):
        mgv = dataclasses.replace(mg, nu=nu)

        def solve():
            x, total = None, 0
            for _ in range(8):
                res = cg(op, f_dev, x0=x, M=mgv, tol=tol, maxiter=50,
                         precise_dots=False, unroll=unroll)
                x = res.x
                total += int(res.niter)
                if bool(res.converged):
                    break
            return res, total

        res, iters = solve()
        res.x.block_until_ready()
        t0 = time.perf_counter()
        res, iters = solve()
        res.x.block_until_ready()
        dt = time.perf_counter() - t0

        xnorm = float(jnp.linalg.norm(res.x))
        true_r = float(jnp.linalg.norm(f_dev - op.matvec(res.x)))
        eta = true_r / (lam_max * xnorm + rnorm0)
        energy = float(0.5 * jnp.vdot(res.x, f_dev))
        erel = (abs(energy - oracle_energy) / oracle_energy
                if oracle_energy else float("nan"))
        ok = eta <= 2e-6 and (oracle_energy is None or erel <= 1e-4)
        print(f"nu={nu} unroll={unroll}: {dt:.3f}s {iters:3d} iters "
              f"({dt / max(iters, 1) * 1e3:.1f} ms/it) eta={eta:.2e} "
              f"erel={erel:.1e} {'OK' if ok else 'FAIL'}", flush=True)

    for nu, unroll in [(2, 1), (2, 2), (1, 1), (1, 2), (3, 1), (2, 4)]:
        run(nu, unroll)


if __name__ == "__main__":
    main()
