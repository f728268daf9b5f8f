import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from topopteval_tpu.fem.multigrid import build_structured_multigrid
from topopteval_tpu.fem.bc import nodes_at_plane
from topopteval_tpu.fem.solvers import cg
from topopteval_tpu.materials import lame_parameters
from topopteval_tpu.utils import set_verbosity

set_verbosity(False)
dtype = jnp.float32
lam, mu = lame_parameters(1.0, 0.3)
mesh, op, mg = build_structured_multigrid(
    200, 64, 16, (0, 0, 0), (60.0, 20.0, 4.0), lam, mu, dtype=dtype,
    operator="structured")
print("built", flush=True)
f = np.zeros(mesh.n_dofs)
tip = nodes_at_plane(mesh, 0, 60.0)
f[tip * 3 + 2] = -1.0 / tip.size
b = jnp.asarray(f, dtype) * op.free_mask
res = cg(op, b, M=mg, tol=1e-6, maxiter=100, precise_dots=False)
print("warmup: iters", int(res.niter), "rnorm", float(res.residual_norm),
      "conv", bool(res.converged), flush=True)
t0 = time.perf_counter()
res = cg(op, b, M=mg, tol=1e-6, maxiter=100, precise_dots=False)
jax.block_until_ready(res.x)
dt = time.perf_counter() - t0
print(f"solve {dt:.3f}s {int(res.niter)} iters "
      f"({dt/max(int(res.niter),1)*1e3:.1f} ms/iter) energy "
      f"{float(0.5*jnp.vdot(res.x, b)):.6e}", flush=True)
