import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
from topopteval_tpu.materials import lame_parameters
from topopteval_tpu.models.beams import refined_beam
from topopteval_tpu.ops.elements import (apply_element_stiffness,
                                         physical_gradients)
from topopteval_tpu.utils import set_verbosity

set_verbosity(False)
dtype = jnp.float32
N_TETS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
CH = 8
mesh = refined_beam(N_TETS)
N, C = mesh.n_nodes, mesh.n_cells
print(f"mesh {C} tets {N} nodes", flush=True)
coords = jnp.asarray(mesh.coords, dtype)
conn = jnp.asarray(mesh.conn)
coords_e = coords[conn]
lam, mu = lame_parameters(1.0, 0.3)
lam_a = jnp.full(C, lam, dtype)
mu_a = jnp.full(C, mu, dtype)
rng = np.random.default_rng(0)
u0 = jnp.asarray(rng.standard_normal((N, 3)), dtype)

g_pre, wdet_pre = physical_gradients(coords_e, "tet4", 1)
g_pre = jax.block_until_ready(g_pre)


def chain(name, step):
    try:
        @jax.jit
        def run(x):
            return jax.lax.scan(lambda c, _: (step(c), None), x, None,
                                length=CH)[0]
        out = run(u0); jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = run(u0); jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / CH
        print(f"[OK] {name}: {dt*1e3:.3f} ms/op", flush=True)
    except Exception as e:
        print(f"[FAIL] {name}: {type(e).__name__}: {str(e)[:160]}",
              flush=True)


# (a) einsum apply, geometry recomputed (current otf)
chain("apply otf", lambda u: 0.999 * u + jnp.mean(
    apply_element_stiffness(coords_e, u[conn], lam_a, mu_a, "tet4", 1)))


# (b) einsum apply with precomputed gradients
def apply_pre(u_e):
    grad_u = jnp.einsum("cqkb,cka->cqab", g_pre, u_e)
    eps = 0.5 * (grad_u + jnp.swapaxes(grad_u, -1, -2))
    tr = eps[..., 0, 0] + eps[..., 1, 1] + eps[..., 2, 2]
    eye = jnp.eye(3, dtype=dtype)
    sigma = (lam_a[:, None, None, None] * tr[..., None, None] * eye
             + 2.0 * mu_a[:, None, None, None] * eps)
    return jnp.einsum("cq,cqab,cqkb->cka", wdet_pre, sigma, g_pre)


chain("apply pre-g", lambda u: 0.999 * u + jnp.mean(apply_pre(u[conn])))

# (c) pallas fused apply (includes [C,4,3]<->[12,C] transposes)
from topopteval_tpu.ops.pallas_kernels import tet4_apply_pallas
chain("apply pallas", lambda u: 0.999 * u + jnp.mean(
    tet4_apply_pallas(coords_e, u[conn], lam_a, mu_a)))

# (d) transpose cost alone
chain("transpose [C,12]->[12,C]", lambda u: 0.999 * u + jnp.mean(
    jnp.swapaxes(u[conn].reshape(C, 12), 0, 1)))

# (e) stored-Ke matvec: f_e = einsum(cij,cj->ci)
from topopteval_tpu.ops.elements import element_stiffness
ke = element_stiffness(coords_e, lam_a, mu_a, "tet4", 1)
ke = jax.block_until_ready(ke)
chain("apply stored-Ke", lambda u: 0.999 * u + jnp.mean(
    jnp.einsum("cij,cj->ci", ke, u[conn].reshape(C, 12))))

# (f) stored-Ke via MXU batched matmul layout [C,12]x[C,12,12]
chain("apply stored-Ke matmul", lambda u: 0.999 * u + jnp.mean(
    jax.lax.dot_general(u[conn].reshape(C, 12), ke,
                        (((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=dtype)))
