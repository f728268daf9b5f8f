import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
from topopteval_tpu.fem.bc import DirichletBC, free_mask_from_bcs, nodes_at_plane
from topopteval_tpu.materials import lame_parameters
from topopteval_tpu.models.beams import refined_beam
from topopteval_tpu.ops.elements import apply_element_stiffness
from topopteval_tpu.utils import set_verbosity

set_verbosity(False)
dtype = jnp.float32
N_TETS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
CH = 8
mesh = refined_beam(N_TETS)
N = mesh.n_nodes
C = mesh.n_cells
print(f"mesh {C} tets {N} nodes", flush=True)
mask = free_mask_from_bcs(mesh.n_dofs,
                          [DirichletBC.fixed(nodes_at_plane(mesh, 0, 0.0))])
mask2d = jnp.asarray(mask.reshape(N, 3), dtype)
coords = jnp.asarray(mesh.coords, dtype)
conn = jnp.asarray(mesh.conn)
coords_e = coords[conn]
lam, mu = lame_parameters(1.0, 0.3)
lam_a = jnp.full(C, lam, dtype)
mu_a = jnp.full(C, mu, dtype)
rng = np.random.default_rng(0)
u0 = jnp.asarray(rng.standard_normal((N, 3)), dtype)

# node-sorted contribution plan (host): flatten conn [C,4] -> sort by node
flat_nodes = np.asarray(mesh.conn).reshape(-1)
perm_np = np.argsort(flat_nodes, kind="stable")
starts = np.searchsorted(flat_nodes[perm_np], np.arange(N), side="left")
ends = np.searchsorted(flat_nodes[perm_np], np.arange(N), side="right")
perm_j = jnp.asarray(perm_np.astype(np.int32))
starts_j = jnp.asarray(starts.astype(np.int32))
ends_j = jnp.asarray(ends.astype(np.int32))


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
        print(f"[FAIL] {name}: {type(e).__name__}: {str(e)[:200]}",
              flush=True)


def eapply(u2d):
    u_e = u2d[conn]                                    # [C,4,3] row gather
    return apply_element_stiffness(coords_e, u_e, lam_a, mu_a, "tet4", 1)


def scatter_rows(f_e):
    return jnp.zeros((N, 3), dtype).at[conn.reshape(-1)].add(
        f_e.reshape(-1, 3))


def scatter_cumsum(f_e):
    vals = f_e.reshape(-1, 3)[perm_j]                  # [M,3] node-sorted
    s = jnp.concatenate([jnp.zeros((1, 3), dtype),
                         jnp.cumsum(vals, axis=0)])
    return s[ends_j] - s[starts_j]


def matvec_rows(u2d):
    um = u2d * mask2d
    f = scatter_rows(eapply(um))
    return f * mask2d + (1.0 - mask2d) * u2d


def matvec_cumsum(u2d):
    um = u2d * mask2d
    f = scatter_cumsum(eapply(um))
    return f * mask2d + (1.0 - mask2d) * u2d


chain("row scatter .at[conn].add", lambda u: 0.999 * u
      + jnp.mean(scatter_rows(eapply(u))))
chain("cumsum row scatter", lambda u: 0.999 * u
      + jnp.mean(scatter_cumsum(eapply(u))))
chain("matvec rows full", matvec_rows)
chain("matvec cumsum full", matvec_cumsum)

# unrolled CG: UNROLL iterations per while step, jacobi precond
diag_e = jnp.einsum("cka->cka", jnp.zeros((C, 4, 3), dtype))  # placeholder


def diag_rows():
    from topopteval_tpu.ops.elements import physical_gradients
    g, wdet = physical_gradients(coords_e, "tet4", 1)
    g2 = g * g
    norm2 = jnp.sum(g2, axis=-1, keepdims=True)
    d = (jnp.einsum("cq,cqka->cka", wdet * (lam + mu), g2)
         + jnp.einsum("cq,cqka->cka", wdet * mu,
                      jnp.broadcast_to(norm2, g2.shape)))
    dg = scatter_cumsum(d)
    return mask2d * mask2d * dg + (1.0 - mask2d)


def cg_unrolled(b2d, tol, max_steps, unroll):
    Minv = 1.0 / diag_rows()
    r = b2d
    z = Minv * r
    p = z
    rz = jnp.vdot(r, z)
    rn0 = jnp.sqrt(jnp.vdot(r, r))
    eps = tol + tol * rn0

    def one(x, r, p, rz):
        Ap = matvec_cumsum(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = Minv * r
        rz_n = jnp.vdot(r, z)
        p = z + (rz_n / rz) * p
        return x, r, p, rz_n

    def body(st):
        x, r, p, rz, it, _ = st
        for _ in range(unroll):
            x, r, p, rz = one(x, r, p, rz)
        return x, r, p, rz, it + unroll, jnp.sqrt(jnp.vdot(r, r))

    def cond(st):
        return jnp.logical_and(st[4] < max_steps * unroll, st[5] > eps)

    st = (jnp.zeros_like(b2d), r, p, rz, jnp.int32(0), rn0)
    st = jax.lax.while_loop(cond, body, st)
    return st[0], st[4], st[5]


b = np.zeros((N, 3))
tip = nodes_at_plane(mesh, 0, 60.0)
b[tip, 2] = -1.0
b2d = jnp.asarray(b, dtype) * mask2d

for unroll in [8]:
    t0 = time.perf_counter()
    try:
        fn = jax.jit(lambda bb: cg_unrolled(bb, 1e-6, 4000 // unroll,
                                            unroll))
        x, it, rn = fn(b2d)
        jax.block_until_ready(x)
        t1 = time.perf_counter()
        x, it, rn = fn(b2d)
        jax.block_until_ready(x)
        dt = time.perf_counter() - t1
        print(f"[OK] cg unroll={unroll}: iters={int(it)} "
              f"rnorm={float(rn):.3e} {dt:.2f}s "
              f"({dt/max(int(it),1)*1e3:.2f} ms/iter, compile "
              f"{t1-t0-dt:.0f}s)", flush=True)
    except Exception as e:
        print(f"[FAIL] cg unroll={unroll}: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
