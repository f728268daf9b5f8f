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
mesh, op, mg = build_structured_multigrid(
    200, 64, 16, (0, 0, 0), (60.0, 20.0, 4.0), lam, mu, dtype=dtype,
    operator="structured")
print("built", flush=True)
f = np.zeros(mesh.n_dofs)
tip = nodes_at_plane(mesh, 0, 60.0)
f[tip * 3 + 2] = -1.0 / tip.size
b = jnp.asarray(f, dtype) * op.free_mask


def cg8(A, M, bb):
    z0 = M.apply(bb)
    st = (jnp.zeros_like(bb), bb, z0, jnp.vdot(bb, z0), jnp.int32(0))

    def cond(s):
        return s[4] < 8

    def body(s):
        x, r, p, rz, it = s
        Ap = A.matvec(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M.apply(r)
        rz_n = jnp.vdot(r, z)
        p = z + (rz_n / rz) * p
        return (x, r, p, rz_n, it + 1)

    return jax.lax.while_loop(cond, body, st)[0]


x_closed = np.asarray(jax.jit(lambda bb: cg8(op, mg, bb))(b))
x_args = np.asarray(jax.jit(cg8)(op, mg, b))
sc = np.abs(x_closed).max()
print("args-vs-closure rel diff:", np.abs(x_args - x_closed).max() / sc,
      flush=True)

r_closed = float(jnp.linalg.norm(b - jax.jit(op.matvec)(
    jnp.asarray(x_closed))))
r_args = float(jnp.linalg.norm(b - jax.jit(op.matvec)(jnp.asarray(x_args))))
print(f"rnorm closed={r_closed:.3e} args={r_args:.3e}", flush=True)
