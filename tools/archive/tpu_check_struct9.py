import os, sys
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
nx, ny, nz = 200, 64, 16
mesh, op, mg = build_structured_multigrid(
    nx, ny, nz, (0, 0, 0), (60.0, 20.0, 4.0), lam, mu, dtype=dtype,
    operator="structured")
print("built", flush=True)

f = np.zeros(mesh.n_dofs)
tip = nodes_at_plane(mesh, 0, 60.0)
f[tip * 3 + 2] = -1.0 / tip.size
b = jnp.asarray(f, dtype) * op.free_mask

# host-driven oracle (8 iterations)
mv = jax.jit(op.matvec)
ma = jax.jit(mg.apply)
x = jnp.zeros_like(b)
r = b
z = ma(r)
p = z
rz = jnp.vdot(r, z)
for _ in range(8):
    Ap = mv(p)
    alpha = rz / jnp.vdot(p, Ap)
    x = x + alpha * p
    r = r - alpha * Ap
    z = ma(r)
    rz_n = jnp.vdot(r, z)
    p = z + (rz_n / rz) * p
    rz = rz_n
x_host = np.asarray(x)
print("host rnorm:", float(jnp.linalg.norm(b - mv(jnp.asarray(x_host)))),
      flush=True)


def body_fn(st, _=None):
    x, r, p, rz = st
    Ap = op.matvec(p)
    alpha = rz / jnp.vdot(p, Ap)
    x = x + alpha * p
    r = r - alpha * Ap
    z = mg.apply(r)
    rz_n = jnp.vdot(r, z)
    p = z + (rz_n / rz) * p
    return (x, r, p, rz_n)


def init():
    z0 = mg.apply(b)
    return (jnp.zeros_like(b), b, z0, jnp.vdot(b, z0))


@jax.jit
def via_fori():
    st = init()
    return jax.lax.fori_loop(0, 8, lambda i, s: body_fn(s), st)[0]


@jax.jit
def via_scan():
    st = init()
    return jax.lax.scan(lambda s, _: (body_fn(s), None), st, None,
                        length=8)[0][0]


@jax.jit
def via_while():
    st = init() + (jnp.int32(0),)

    def cond(s):
        return s[4] < 8

    def bd(s):
        return body_fn(s[:4]) + (s[4] + 1,)
    return jax.lax.while_loop(cond, bd, st)[0]


sc = np.abs(x_host).max()
for name, fn in [("fori", via_fori), ("scan", via_scan),
                 ("while", via_while)]:
    xx = np.asarray(fn())
    print(f"{name} vs host rel diff:", np.abs(xx - x_host).max() / sc,
          flush=True)

res = cg(op, b, M=mg, tol=1e-30, maxiter=8, precise_dots=False)
print("cg() vs host rel diff:",
      np.abs(np.asarray(res.x) - x_host).max() / sc, flush=True)
