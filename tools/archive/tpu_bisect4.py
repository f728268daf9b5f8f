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
mesh = refined_beam(N_TETS)
print(f"mesh {mesh.n_cells} tets {mesh.n_dofs} dofs", flush=True)
mask = free_mask_from_bcs(mesh.n_dofs, [DirichletBC.fixed(nodes_at_plane(mesh, 0, 0.0))])
dmesh = mesh.device(dtype=dtype)
op = StiffnessOperator.build(dmesh, *lame_parameters(1.0, 0.3),
                             free_mask=jnp.asarray(mask, dtype), mode="otf", order=1)
u0 = jnp.asarray(np.random.default_rng(0).standard_normal(op.n_dofs), dtype)

def timeit(name, fn, *args, chain=None):
    try:
        if chain:
            @jax.jit
            def run(x):
                return jax.lax.scan(lambda c, _: (fn(c), None), x,
                                    None, length=chain)[0]
        else:
            run = jax.jit(fn)
        out = run(*args); jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = run(*args); jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (chain or 1)
        print(f"[OK] {name}: {dt*1e3:.3f} ms", flush=True)
        return out
    except Exception as e:
        print(f"[FAIL] {name}: {type(e).__name__}: {e}", flush=True)


# full matvec chained (amortizes dispatch)
timeit("matvec x16", op.matvec, u0, chain=16)

# pieces
plan = op.plan
vals = plan.gather(u0)                       # [C, 12]
timeit("gather only", lambda u: plan.gather(u), u0)
timeit("segment_sum only", lambda v: plan.scatter_add(v), vals)
timeit("scatter .at.add", lambda v: jnp.zeros(op.n_dofs, dtype).at[
    plan.edofs.reshape(-1)].add(v.reshape(-1)), vals)

from topopteval_tpu.ops.elements import apply_element_stiffness
coords_e = dmesh.coords[dmesh.conn]
u_e = vals.reshape(-1, 4, 3)
timeit("element apply only", lambda ue: apply_element_stiffness(
    coords_e, ue, op.lam, op.mu, "tet4", 1), u_e)
timeit("vdot", lambda u: jnp.vdot(u, u), u0)
