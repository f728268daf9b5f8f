"""Isolate the stencil-matvec timing pathology (round 4).

All three stencil formulations measured ~546 ms/matvec in the
tpu_stencil_probe chain harness, yet the e2e solve does ~66 fine
matvecs + full V-cycles in ~0.45 s — the chain harness is measuring a
fixed overhead, not the matvec.  Time the same operator four ways:

  A  jit(op.matvec), 20 dispatches, block each
  B  20-deep unrolled chain with a scalar multiply between (the
     bench.py roofline harness)
  C  20-deep unrolled chain, no multiply
  D  lax.fori_loop(20) chain

    python tools/tpu_matvec_micro.py [scale]
"""

import functools
import json
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
    import jax
    import jax.numpy as jnp
    from jax import lax

    from topopteval_tpu.fem.bc import (DirichletBC, free_mask_from_bcs,
                                       nodes_at_plane)
    from topopteval_tpu.fem.structured import StructuredStiffnessOperator
    from topopteval_tpu.materials import lame_parameters
    from topopteval_tpu.models.beams import generate_grid_tet

    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    nx, ny, nz = 25 * scale // 2, 4 * scale, scale
    lam, mu = lame_parameters(1.0, 0.3)
    mesh = generate_grid_tet(nx, ny, nz, (0.0, 0.0, 0.0),
                             (60.0, 20.0, 4.0))
    fm = free_mask_from_bcs(
        mesh.n_dofs, [DirichletBC.fixed(nodes_at_plane(mesh, 0, 0.0))])
    op = StructuredStiffnessOperator.build(
        nx, ny, nz, (0, 0, 0), (60.0, 20.0, 4.0), lam, mu,
        free_mask=fm, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(mesh.n_dofs), jnp.float32)
    reps = 20
    out = {"scale": scale, "n_dofs": mesh.n_dofs}

    def timeit(name, fn, force=True):
        r = fn()
        r.block_until_ready()
        t0 = time.perf_counter()
        r = fn()
        r.block_until_ready()
        if force:
            _ = float(r.reshape(-1)[0])
        dt = (time.perf_counter() - t0) / reps * 1e3
        out[name] = round(dt, 3)
        log(f"{name}: {dt:.3f} ms/matvec")

    mv = jax.jit(op.matvec)

    def run_a():
        y = x
        for _ in range(reps):
            y = mv(y)
        return y
    timeit("A_dispatch_each", run_a)

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain_mul(y, n):
        for _ in range(n):
            y = op.matvec(y) * (1.0 / jnp.float32(1000.0))
        return y
    timeit("B_chain_mul", lambda: chain_mul(x, reps))

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain_pure(y, n):
        for _ in range(n):
            y = op.matvec(y)
        return y
    timeit("C_chain_pure", lambda: chain_pure(x, reps))

    @jax.jit
    def chain_loop(y):
        return lax.fori_loop(0, reps, lambda i, v: op.matvec(v), y)
    timeit("D_fori_loop", lambda: chain_loop(x))

    # E: the operator bench.py's roofline block actually uses — via the
    # public problem + _get_multigrid.  The stencil-probe chain measured
    # ~546 ms/matvec on THIS op (vs ~3.5 ms direct) for every
    # formulation; find out what differs.
    from topopteval_tpu.api import (_get_multigrid, apply_fixed_boundary,
                                    apply_force, assemble_stiffness_matrix,
                                    setup_problem)
    from topopteval_tpu.utils import set_verbosity
    set_verbosity(False)
    problem = setup_problem(mesh, dtype=jnp.float32)
    assemble_stiffness_matrix(problem, lam, mu)
    apply_fixed_boundary(problem, nodes_at_plane(mesh, 0, 0.0))
    apply_force(problem, nodes_at_plane(mesh, 0, 60.0), [0.0, 0.0, -1.0])
    gop, _ = _get_multigrid(problem)
    log(f"E op type: {type(gop).__name__}; "
        f"mask dtype {gop.free_mask.dtype}; "
        f"escale {None if gop.escale is None else gop.escale.dtype}; "
        f"dims {gop.dims}")

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain_g(y, n):
        for _ in range(n):
            y = gop.matvec(y) * (1.0 / jnp.float32(1000.0))
        return y
    timeit("E_mg_op_chain", lambda: chain_g(x, reps))

    # F: same chain but the operator passed as a jit ARGUMENT (pytree),
    # the way the solvers receive it
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain_arg(o, y, n):
        for _ in range(n):
            y = o.matvec(y) * (1.0 / jnp.float32(1000.0))
        return y
    timeit("F_mg_op_as_arg", lambda: chain_arg(gop, x, reps))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
