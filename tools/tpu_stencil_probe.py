"""Probe: why does bench.py's 20-matvec stencil chain report ~450 ms per
matvec when the full MG-PCG solve runs 36.6 ms/iter (~5 stencil
applications each)?  Times the structured stencil matvec three ways:

  a) chains of length 1/5/20 (one program each, jit-unrolled)
  b) 20 separate single-matvec calls, host-forced each time
  c) the V-cycle preconditioner apply for comparison

Usage: python tools/tpu_stencil_probe.py [scale]
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from topopteval_tpu.api import (apply_fixed_boundary, apply_force,
                                    assemble_stiffness_matrix,
                                    setup_problem, _get_multigrid)
    from topopteval_tpu.fem.bc import nodes_at_plane
    from topopteval_tpu.materials import lame_parameters
    from topopteval_tpu.models.beams import generate_grid_tet
    from topopteval_tpu.utils import set_verbosity

    set_verbosity(False)
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    nx, ny, nz = 25 * scale // 2, 4 * scale, scale
    lam, mu = lame_parameters(1.0, 0.3)
    mesh = generate_grid_tet(nx, ny, nz, (0.0, 0.0, 0.0),
                             (60.0, 20.0, 4.0))
    problem = setup_problem(mesh, dtype=jnp.float32)
    assemble_stiffness_matrix(problem, lam, mu)
    apply_fixed_boundary(problem, nodes_at_plane(mesh, 0, 0.0))
    apply_force(problem, nodes_at_plane(mesh, 0, 60.0), [0, 0, -1.0])
    op, mg = _get_multigrid(problem)
    log(f"operator: {type(op).__name__}, n_dofs={op.n_dofs}")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(op.n_dofs), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def _chain(y, reps):
        for _ in range(reps):
            y = op.matvec(y) * (1.0 / jnp.float32(1000.0))
        return y

    for reps in (1, 5, 20):
        r = _chain(x, reps)
        r.block_until_ready()
        _ = float(r[0])                       # force warm exec fully
        t0 = time.perf_counter()
        r = _chain(x, reps)
        r.block_until_ready()
        _ = float(r[0])
        dt = time.perf_counter() - t0
        log(f"chain reps={reps:2d}: {dt * 1e3:8.2f} ms total, "
            f"{dt / reps * 1e3:7.2f} ms/matvec")

    mv = jax.jit(op.matvec)
    r = mv(x)
    r.block_until_ready()
    _ = float(r[0])
    t0 = time.perf_counter()
    for _ in range(20):
        r = mv(r)
    r.block_until_ready()
    _ = float(r[0])
    dt = time.perf_counter() - t0
    log(f"20 single calls (1 sync): {dt * 1e3:8.2f} ms total, "
        f"{dt / 20 * 1e3:7.2f} ms/matvec")

    mgap = jax.jit(mg.apply) if hasattr(mg, "apply") else None
    if mgap is not None:
        z = mgap(x)
        z.block_until_ready()
        _ = float(np.asarray(z).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(5):
            z = mgap(x)
        z.block_until_ready()
        _ = float(np.asarray(z).ravel()[0])
        dt = time.perf_counter() - t0
        log(f"V-cycle apply: {dt / 5 * 1e3:7.2f} ms/apply")


if __name__ == "__main__":
    main()
