"""Bisect which device program fails on the axon TPU: single matvec,
preconditioner build, short CG, full CG.  Run exclusively (no other TPU
process)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from topopteval_tpu.fem.bc import DirichletBC, free_mask_from_bcs, \
    nodes_at_plane
from topopteval_tpu.fem.operator import StiffnessOperator
from topopteval_tpu.fem.solvers import (block_jacobi_preconditioner, cg,
                                        jacobi_preconditioner)
from topopteval_tpu.materials import lame_parameters
from topopteval_tpu.models.beams import refined_beam
from topopteval_tpu.utils import set_verbosity


def step(name, fn):
    t0 = time.perf_counter()
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"[OK]   {name}: {time.perf_counter() - t0:.1f}s", flush=True)
        return out
    except Exception as e:
        print(f"[FAIL] {name}: {type(e).__name__}: {e}", flush=True)
        raise SystemExit(1)


def main():
    set_verbosity(False)
    dtype = jnp.float32
    mesh = refined_beam(20000)
    print(f"mesh {mesh.n_cells} tets {mesh.n_dofs} dofs", flush=True)
    mask = free_mask_from_bcs(
        mesh.n_dofs, [DirichletBC.fixed(nodes_at_plane(mesh, 0, 0.0))])
    dmesh = mesh.device(dtype=dtype)
    op = StiffnessOperator.build(dmesh, *lame_parameters(1.0, 0.3),
                                 free_mask=jnp.asarray(mask, dtype),
                                 mode="otf", order=1)
    f = np.zeros(mesh.n_dofs)
    tip = nodes_at_plane(mesh, 0, 60.0)
    f[tip * 3 + 2] = -1.0
    f_dev = jnp.asarray(f, dtype) * op.free_mask

    u = step("matvec jit", lambda: jax.jit(lambda o, x: o.matvec(x))(
        op, f_dev))
    diag = step("diagonal", lambda: jax.jit(
        lambda o: o.diagonal())(op))
    Mj = jacobi_preconditioner(diag)
    blocks = step("node_blocks", lambda: jax.jit(
        lambda o: o.node_blocks_raw())(op))
    Mb = step("block_jacobi build", lambda: block_jacobi_preconditioner(
        blocks, op.free_mask))
    step("cg 5 iters jacobi", lambda: cg(op, f_dev, M=Mj, tol=1e-30,
                                         maxiter=5,
                                         precise_dots=False).x)
    step("cg 5 iters block", lambda: cg(op, f_dev, M=Mb, tol=1e-30,
                                        maxiter=5,
                                        precise_dots=False).x)
    res = step("cg full block", lambda: cg(op, f_dev, M=Mb, tol=1e-6,
                                           maxiter=20000,
                                           precise_dots=False))
    print("iters", int(res.niter), "rnorm", float(res.residual_norm),
          "conv", bool(res.converged), flush=True)


if __name__ == "__main__":
    main()
