import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from topopteval_tpu.fem.multigrid import build_structured_multigrid
from topopteval_tpu.fem.bc import nodes_at_plane
from topopteval_tpu.materials import lame_parameters
from topopteval_tpu.utils import set_verbosity

set_verbosity(False)
dtype = jnp.float32
lam, mu = lame_parameters(1.0, 0.3)
nx, ny, nz = 200, 64, 16
box = (60.0, 20.0, 4.0)
kind = sys.argv[1] if len(sys.argv) > 1 else "structured"
mesh, op, mg = build_structured_multigrid(
    nx, ny, nz, (0, 0, 0), box, lam, mu, dtype=dtype, operator=kind)
print(kind, "built", flush=True)

f = np.zeros(mesh.n_dofs)
tip = nodes_at_plane(mesh, 0, 60.0)
f[tip * 3 + 2] = -1.0 / tip.size
b = jnp.asarray(f, dtype) * op.free_mask

mv = jax.jit(op.matvec)
ma = jax.jit(mg.apply)

x = jnp.zeros_like(b)
r = b - mv(x)
z = ma(r)
p = z
rz = float(jnp.vdot(r, z))
for it in range(16):
    Ap = mv(p)
    pAp = float(jnp.vdot(p, Ap))
    alpha = rz / pAp
    x = x + alpha * p
    r = r - alpha * Ap
    z = ma(r)
    rz_new = float(jnp.vdot(r, z))
    beta = rz_new / rz
    rn = float(jnp.linalg.norm(r))
    print(f"it {it}: pAp={pAp:.4e} alpha={alpha:.4e} rz={rz:.4e} "
          f"beta={beta:.4e} rnorm={rn:.4e}", flush=True)
    rz = rz_new
    p = z + beta * p
