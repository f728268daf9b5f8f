import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
from topopteval_tpu.fem.bc import DirichletBC, free_mask_from_bcs, nodes_at_plane
from topopteval_tpu.fem.operator import StiffnessOperator
from topopteval_tpu.fem.solvers import block_jacobi_preconditioner, cg
from topopteval_tpu.materials import lame_parameters
from topopteval_tpu.models.beams import refined_beam
from topopteval_tpu.utils import set_verbosity

set_verbosity(False)
dtype = jnp.float32
mesh = refined_beam(20000)
mask = free_mask_from_bcs(mesh.n_dofs, [DirichletBC.fixed(nodes_at_plane(mesh, 0, 0.0))])
dmesh = mesh.device(dtype=dtype)
op = StiffnessOperator.build(dmesh, *lame_parameters(1.0, 0.3),
                             free_mask=jnp.asarray(mask, dtype), mode="otf", order=1)
f = np.zeros(mesh.n_dofs); tip = nodes_at_plane(mesh, 0, 60.0); f[tip*3+2] = -1.0
f_dev = jnp.asarray(f, dtype) * op.free_mask

with jax.default_matmul_precision("highest"):
    M = block_jacobi_preconditioner(op.node_blocks_raw(), op.free_mask)
    jax.block_until_ready(M)
    print("setup done", flush=True)

    # matvec throughput: chain 100 matvecs
    @jax.jit
    def chain(u):
        def body(i, v):
            return op.matvec(v)
        return jax.lax.fori_loop(0, 100, body, u)
    r = chain(f_dev); jax.block_until_ready(r)
    t0 = time.perf_counter(); r = chain(f_dev); jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    print(f"matvec: {dt/100*1e3:.3f} ms/iter at {mesh.n_cells} tets", flush=True)

    t0 = time.perf_counter()
    res = cg(op, f_dev, M=M, tol=1e-6, maxiter=5000, precise_dots=False)
    it = int(res.niter)
    print(f"cg highest: iters={it} rnorm={float(res.residual_norm):.3e} "
          f"conv={bool(res.converged)} {time.perf_counter()-t0:.1f}s", flush=True)
