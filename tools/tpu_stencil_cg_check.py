"""On-chip: pallas stencil INSIDE a while_loop CG vs slices.

matvec_raw parity passes on chip in isolation (all sizes, uniform and
SIMP), yet the e2e MG-PCG solve returns energy 522.45 instead of 324.12
with the pallas formulation.  The remaining structural difference is
the known axon miscompile class: op applications traced INSIDE a
lax.while_loop body.  Run a fixed-iteration plain-CG while_loop with
both formulations and diff the trajectories.

    python tools/tpu_stencil_cg_check.py [nx ny nz iters]
"""

import functools
import os
import sys

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

    args = [int(a) for a in sys.argv[1:] if a != "asarg"]
    nx, ny, nz, iters = args if len(args) == 4 else (50, 16, 4, 40)
    lam, mu = lame_parameters(1.0, 0.3)
    mesh = generate_grid_tet(nx, ny, nz, (0, 0, 0), (60.0, 20.0, 4.0))
    fm = free_mask_from_bcs(
        mesh.n_dofs, [DirichletBC.fixed(nodes_at_plane(mesh, 0, 0.0))])
    st = StructuredStiffnessOperator.build(
        nx, ny, nz, (0, 0, 0), (60.0, 20.0, 4.0), lam, mu,
        free_mask=fm, dtype=jnp.float32)
    tip = nodes_at_plane(mesh, 0, 60.0)
    f = np.zeros(mesh.n_dofs)
    f[tip * 3 + 2] = -1.0 / tip.size
    b = jnp.asarray(f * fm, jnp.float32)

    as_arg = "asarg" in sys.argv

    def run(mode):
        os.environ["TOPOPT_STENCIL"] = mode

        @functools.partial(jax.jit, static_argnames=("n",))
        def cg_arg(op, b_in, n):
            x0 = jnp.zeros_like(b_in)

            def body(c):
                x, r, p, rs, i = c
                ap = op.matvec(p)
                alpha = rs / jnp.vdot(p, ap)
                x = x + alpha * p
                r = r - alpha * ap
                rs_new = jnp.vdot(r, r)
                p = r + (rs_new / rs) * p
                return (x, r, p, rs_new, i + 1)

            def cond(c):
                return c[4] < n

            x, r, _, rs, _ = lax.while_loop(
                cond, body, (x0, b_in, b_in, jnp.vdot(b_in, b_in), 0))
            return x, rs

        @functools.partial(jax.jit, static_argnames=("n",))
        def cg(b_in, n):
            x0 = jnp.zeros_like(b_in)

            def body(c):
                x, r, p, rs, i = c
                ap = st.matvec(p)
                alpha = rs / jnp.vdot(p, ap)
                x = x + alpha * p
                r = r - alpha * ap
                rs_new = jnp.vdot(r, r)
                p = r + (rs_new / rs) * p
                return (x, r, p, rs_new, i + 1)

            def cond(c):
                return c[4] < n

            x, r, _, rs, _ = lax.while_loop(
                cond, body, (x0, b_in, b_in, jnp.vdot(b_in, b_in), 0))
            return x, rs

        if as_arg:
            x, rs = cg_arg(st, b, iters)
        else:
            x, rs = cg(b, iters)
        x.block_until_ready()
        x = np.asarray(x, np.float64)
        energy = 0.5 * float(np.asarray(b, np.float64) @ x)
        # fresh out-of-loop matvec for the true residual
        os.environ["TOPOPT_STENCIL"] = "slices"
        true_r = float(np.linalg.norm(
            np.asarray(b, np.float64)
            - np.asarray(st.matvec(jnp.asarray(x, jnp.float32)),
                         np.float64)))
        log(f"[{mode}] {iters} CG iters: energy={energy:.8e} "
            f"loop_rs={float(rs):.3e} true_r={true_r:.3e}")
        return x

    xs = run("slices")
    xp = run("pallas")
    d = np.abs(xp - xs)
    log(f"solution diff: max={d.max():.3e} rel="
        f"{d.max() / max(np.abs(xs).max(), 1e-30):.3e}")


if __name__ == "__main__":
    main()
