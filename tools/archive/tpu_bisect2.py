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
f = np.zeros(mesh.n_dofs)
tip = nodes_at_plane(mesh, 0, 60.0)
f[tip * 3 + 2] = -1.0
f_dev = jnp.asarray(f, dtype) * op.free_mask
M = block_jacobi_preconditioner(op.node_blocks_raw(), op.free_mask)
jax.block_until_ready(M)
print("setup done", flush=True)

for maxiter in [50, 200, 1000, 5000, 20000]:
    t0 = time.perf_counter()
    try:
        res = cg(op, f_dev, M=M, tol=1e-6, maxiter=maxiter, precise_dots=False)
        it = int(res.niter); rn = float(res.residual_norm)
        print(f"[OK] maxiter={maxiter}: iters={it} rnorm={rn:.3e} "
              f"conv={bool(res.converged)} {time.perf_counter()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"[FAIL] maxiter={maxiter}: {type(e).__name__} {e}", flush=True)
        break
