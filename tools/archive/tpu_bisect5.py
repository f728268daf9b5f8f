import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
from topopteval_tpu.fem.bc import DirichletBC, free_mask_from_bcs, nodes_at_plane
from topopteval_tpu.fem.operator import StiffnessOperator
from topopteval_tpu.materials import lame_parameters
from topopteval_tpu.models.beams import refined_beam
from topopteval_tpu.utils import set_verbosity

set_verbosity(False)
dtype = jnp.float32
N_TETS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
CH = 8
mesh = refined_beam(N_TETS)
print(f"mesh {mesh.n_cells} tets {mesh.n_dofs} dofs", flush=True)
mask = free_mask_from_bcs(mesh.n_dofs, [DirichletBC.fixed(nodes_at_plane(mesh, 0, 0.0))])
dmesh = mesh.device(dtype=dtype)
op = StiffnessOperator.build(dmesh, *lame_parameters(1.0, 0.3),
                             free_mask=jnp.asarray(mask, dtype), mode="otf", order=1)
rng = np.random.default_rng(0)
u0 = jnp.asarray(rng.standard_normal(op.n_dofs), dtype)
plan = op.plan
edofs = plan.edofs            # [C, 12]
C = edofs.shape[0]
n = op.n_dofs


def chain(name, step):
    """step: u -> u (same shape), chained CH times in one program."""
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
        print(f"[FAIL] {name}: {type(e).__name__}: {e}", flush=True)


# 0) elementwise baseline (pure bandwidth, no gather)
chain("elementwise u*1.0001", lambda u: u * 1.0001)

# 1) plain dof gather, fold back via mean to keep shape
chain("gather u[edofs]", lambda u: u * 0.999 + jnp.mean(u[edofs]))

# 2) row gather u2d[conn] ([1,3] slices)
conn = dmesh.conn
chain("gather u2d[conn]", lambda u: u * 0.999
      + jnp.mean(u.reshape(-1, 3)[conn]))

# 3) one-hot row-gather: pad u to rows of 128; gather rows; select lane
npad = ((n + 127) // 128) * 128
rows_idx = jnp.asarray(np.asarray(edofs) // 128)
lane_idx = jnp.asarray(np.asarray(edofs) % 128)
lane_oh = jax.nn.one_hot(lane_idx, 128, dtype=dtype)      # [C,12,128]


def onehot_gather(u):
    up = jnp.zeros(npad, dtype).at[:n].set(u).reshape(-1, 128)
    rows = up[rows_idx]                                   # [C,12,128]
    return jnp.sum(rows * lane_oh, axis=-1)               # [C,12]


chain("one-hot row gather", lambda u: u * 0.999 + jnp.mean(onehot_gather(u)))

# 4) segment_sum sorted scatter (current path)
vals0 = plan.gather(u0)
chain("segsum scatter", lambda u: 0.999 * u + plan.scatter_add(
    vals0 * u[0]))

# 5) cumsum-based sorted scatter: out[d] = csum[end[d]] - csum[start[d]]
seg_np = np.asarray(plan.segments)
starts = np.searchsorted(seg_np, np.arange(n), side="left")
ends = np.searchsorted(seg_np, np.arange(n), side="right")
starts_j = jnp.asarray(starts)
ends_j = jnp.asarray(ends)
perm = plan.perm


def cumsum_scatter(v):
    s = jnp.cumsum(v.reshape(-1)[perm])
    s = jnp.concatenate([jnp.zeros(1, v.dtype), s])
    return s[ends_j] - s[starts_j]


chain("cumsum scatter", lambda u: 0.999 * u + cumsum_scatter(vals0 * u[0]))

# 6) element apply chained (geometry recompute, no gather/scatter)
from topopteval_tpu.ops.elements import apply_element_stiffness
coords_e = dmesh.coords[dmesh.conn]
ue0 = vals0.reshape(-1, 4, 3)


def eapply(u):
    fe = apply_element_stiffness(coords_e, ue0 * u[0], op.lam, op.mu,
                                 "tet4", 1)
    return 0.999 * u + jnp.mean(fe)


chain("element apply", eapply)

# 7) vdot chained
chain("vdot", lambda u: u * 0.999 + jnp.vdot(u, u) * 1e-12)
