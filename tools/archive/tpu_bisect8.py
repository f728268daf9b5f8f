import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from topopteval_tpu.fem.bc import DirichletBC, free_mask_from_bcs, nodes_at_plane
from topopteval_tpu.fem.operator import StiffnessOperator
from topopteval_tpu.fem.solvers import block_jacobi_preconditioner
from topopteval_tpu.materials import lame_parameters
from topopteval_tpu.models.beams import refined_beam
from topopteval_tpu.utils import set_verbosity

set_verbosity(False)
dtype = jnp.float32
mesh = refined_beam(int(sys.argv[1]) if len(sys.argv) > 1 else 200_000)
print(f"mesh {mesh.n_cells} tets {mesh.n_dofs} dofs", flush=True)
mask = free_mask_from_bcs(mesh.n_dofs,
                          [DirichletBC.fixed(nodes_at_plane(mesh, 0, 0.0))])
dmesh = mesh.device(dtype=dtype)
op = StiffnessOperator.build(dmesh, *lame_parameters(1.0, 0.3),
                             free_mask=jnp.asarray(mask, dtype),
                             mode="otf", order=1)
print("use_pallas:", op.use_pallas, "plan:", type(op.plan).__name__,
      flush=True)
M = block_jacobi_preconditioner(op.node_blocks_raw(), op.free_mask)
M = jax.block_until_ready(M)
rng = np.random.default_rng(0)
u0 = jnp.asarray(rng.standard_normal(op.n_dofs), dtype)
CH = 16


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


chain("matvec (pallas+row)", op.matvec)
chain("gather rows", lambda u: 0.999 * u + jnp.mean(op._gather_rows(u)))
u_e0 = op._gather_rows(u0)
chain("scatter incidence", lambda u: 0.999 * u + jnp.mean(
    op._scatter_rows(u_e0 * u[0])))
from topopteval_tpu.ops.pallas_kernels import tet4_apply_pallas
coords_e = dmesh.coords[dmesh.conn]
chain("pallas apply", lambda u: 0.999 * u + jnp.mean(
    tet4_apply_pallas(coords_e, u_e0 * u[0], op.lam, op.mu)))
chain("precond apply", lambda u: (M * u.reshape(-1, 3)[:, None, :]
                                  ).sum(-1).reshape(-1) * 0.001 + u)
chain("precond einsum", lambda u: jnp.einsum(
    "nab,nb->na", M, u.reshape(-1, 3)).reshape(-1) * 0.001 + u)
chain("2x vdot", lambda u: u * 0.999 + (jnp.vdot(u, u)
                                        + jnp.vdot(u, u * 2)) * 1e-12)
