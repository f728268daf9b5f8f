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

rng = np.random.default_rng(0)
r0 = jnp.asarray(rng.standard_normal(op.n_dofs), dtype) * op.free_mask

single = np.asarray(jax.jit(mg.apply)(r0))

@jax.jit
def fixed_scan(x):
    def body(c, _):
        return c + 0.0, mg.apply(x)
    _, ys = jax.lax.scan(body, jnp.float32(0.0), None, length=3)
    return ys

ys = np.asarray(fixed_scan(r0))
sc = np.abs(single).max()
for i in range(3):
    print(f"mg.apply scan iter {i} vs single rel diff:",
          np.abs(ys[i] - single).max() / sc, flush=True)

# bisect pieces in-loop: smoother only, coarse solve only, transfers only
L = mg.levels[0]

def smooth_once(x):
    dz = jnp.einsum("nab,nb->na", L.binv, x.reshape(-1, 3))
    return (mg.omega * dz).reshape(-1)

def coarse_only(x):
    # restrict down all levels, dense solve, prolong back up
    r2 = x.reshape(-1, 3)
    rs = [r2]
    for lv in mg.levels:
        r2 = lv.transfer.restrict(r2)
        rs.append(r2)
    z = (mg.coarse_inv @ r2.reshape(-1)).reshape(-1, 3)
    for lv in reversed(mg.levels):
        z = lv.transfer.prolong(z)
    return z.reshape(-1)

for name, fn in [("smoother", smooth_once), ("coarse chain", coarse_only)]:
    s1 = np.asarray(jax.jit(fn)(r0))

    @jax.jit
    def fsc(x, fn=fn):
        def body(c, _):
            return c + 0.0, fn(x)
        return jax.lax.scan(body, jnp.float32(0.0), None, length=2)[1]

    ys = np.asarray(fsc(r0))
    print(f"{name} scan vs single rel diff:",
          np.abs(ys[0] - s1).max() / max(np.abs(s1).max(), 1e-30),
          flush=True)
