import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from topopteval_tpu.fem.bc import DirichletBC, free_mask_from_bcs, nodes_at_plane
from topopteval_tpu.models.beams import refined_beam
from topopteval_tpu.utils import set_verbosity

set_verbosity(False)
dtype = jnp.float32
mesh = refined_beam(int(sys.argv[1]) if len(sys.argv) > 1 else 200_000)
N, C = mesh.n_nodes, mesh.n_cells
print(f"mesh {C} tets {N} nodes", flush=True)
conn_np = mesh.conn
flat = conn_np.reshape(-1).astype(np.int64)
M_ = flat.size
perm_np = np.argsort(flat, kind="stable")
sorted_nodes = flat[perm_np]
starts = np.searchsorted(sorted_nodes, np.arange(N), "left")
degree = np.searchsorted(sorted_nodes, np.arange(N), "right") - starts
D = int(degree.max())
print("max degree", D, flush=True)

perm = jnp.asarray(perm_np.astype(np.int32))
starts_j = jnp.asarray(starts.astype(np.int32))
deg_j = jnp.asarray(degree.astype(np.int32))
seg_j = jnp.asarray(sorted_nodes.astype(np.int32))
dmask = (jnp.arange(D)[None, :] < deg_j[:, None]).astype(dtype)  # [N,D]

rng = np.random.default_rng(0)
fe0 = jnp.asarray(rng.standard_normal((C, 4, 3)), dtype)
u0 = jnp.asarray(rng.standard_normal((N, 3)), dtype)

# reference result
oracle = np.zeros((N, 3))
np.add.at(oracle, conn_np.reshape(-1), np.asarray(fe0).reshape(-1, 3))

CH = 16


def chain(name, step, check=None):
    try:
        @jax.jit
        def run(x):
            return jax.lax.scan(lambda c, _: (step(c), None), x, None,
                                length=CH)[0]
        out = run(u0); jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = run(u0); jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / CH
        ok = ""
        if check is not None:
            ok = " CORRECT" if check() else " WRONG!"
        print(f"[OK] {name}: {dt*1e3:.3f} ms/op{ok}", flush=True)
    except Exception as e:
        print(f"[FAIL] {name}: {type(e).__name__}: {str(e)[:160]}",
              flush=True)


# current: incidence gather
inc_np = np.full((N, D), M_, dtype=np.int64)
col = np.concatenate([np.arange(d) for d in degree])
rows = np.repeat(np.arange(N), degree)
inc_np[rows, col] = perm_np
inc = jnp.asarray(inc_np.astype(np.int32))


def scat_incidence(fe):
    vals = jnp.concatenate([fe.reshape(-1, 3),
                            jnp.zeros((1, 3), dtype)], 0)
    return jnp.sum(vals[inc], axis=1)


def _verify(fn):
    return lambda: np.allclose(np.asarray(fn(fe0)), oracle, rtol=1e-4,
                               atol=1e-4)


chain("scatter incidence", lambda u: 0.999 * u
      + jnp.mean(scat_incidence(fe0 * u[0, 0])),
      _verify(scat_incidence))


# windowed dynamic-slice over sorted runs
def scat_window(fe):
    vals = fe.reshape(-1, 3)[perm]                      # [M,3] sorted
    vals = jnp.concatenate([vals, jnp.zeros((D, 3), dtype)], 0)
    win = jax.vmap(lambda s: jax.lax.dynamic_slice(vals, (s, 0),
                                                   (D, 3)))(starts_j)
    return jnp.sum(win * dmask[:, :, None], axis=1)


chain("scatter windowed", lambda u: 0.999 * u
      + jnp.mean(scat_window(fe0 * u[0, 0])), _verify(scat_window))


# row segment_sum (sorted)
def scat_segrow(fe):
    vals = fe.reshape(-1, 3)[perm]
    return jax.ops.segment_sum(vals, seg_j, num_segments=N,
                               indices_are_sorted=True)


chain("scatter row segsum", lambda u: 0.999 * u
      + jnp.mean(scat_segrow(fe0 * u[0, 0])), _verify(scat_segrow))


# gather variants for u2d[conn]
chain("gather u2d[conn]", lambda u: 0.999 * u
      + jnp.mean(u[jnp.asarray(conn_np)]))
chain("gather perm rows", lambda u: 0.999 * u
      + jnp.mean(jnp.broadcast_to(u.reshape(-1, 3), (N, 3)).reshape(N, 3)[
          jnp.asarray((conn_np[:, 0]).astype(np.int32))]))
# take with clip mode
chain("gather take", lambda u: 0.999 * u
      + jnp.mean(jnp.take(u, jnp.asarray(conn_np), axis=0)))
