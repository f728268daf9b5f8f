import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from topopteval_tpu.fem.bc import DirichletBC, free_mask_from_bcs, nodes_at_plane
from topopteval_tpu.fem.operator import StiffnessOperator
from topopteval_tpu.fem.structured import StructuredStiffnessOperator
from topopteval_tpu.fem.solvers import cg, block_jacobi_preconditioner
from topopteval_tpu.materials import lame_parameters
from topopteval_tpu.models.beams import generate_grid_tet
from topopteval_tpu.utils import set_verbosity

set_verbosity(False)
dtype = jnp.float32
lam, mu = lame_parameters(1.0, 0.3)
nx, ny, nz = 200, 64, 16
box = (60.0, 20.0, 4.0)
mesh = generate_grid_tet(nx, ny, nz, (0, 0, 0), box)
mask = free_mask_from_bcs(mesh.n_dofs,
                          [DirichletBC.fixed(nodes_at_plane(mesh, 0, 0.0))])
st = StructuredStiffnessOperator.build(nx, ny, nz, (0, 0, 0), box, lam, mu,
                                       free_mask=mask, dtype=dtype)
rng = np.random.default_rng(0)
u0 = jnp.asarray(rng.standard_normal(mesh.n_dofs), dtype)
u0 = u0 / jnp.linalg.norm(u0)

# chained matvec in scan vs repeated single dispatch
@jax.jit
def chain(x):
    def body(c, _):
        c = st.matvec(c)
        return c / jnp.linalg.norm(c), None
    return jax.lax.scan(body, x, None, length=8)[0]

x_scan = np.asarray(chain(u0))
single = jax.jit(st.matvec)
x_seq = u0
for _ in range(8):
    x_seq = single(x_seq)
    x_seq = x_seq / jnp.linalg.norm(x_seq)
x_seq = np.asarray(x_seq)
print("scan vs sequential matvec rel diff:",
      np.abs(x_scan - x_seq).max() / np.abs(x_seq).max(), flush=True)

# plain block-jacobi CG at bench size: structured op
M = block_jacobi_preconditioner(st.node_blocks_raw(), st.free_mask)
f = np.zeros(mesh.n_dofs)
tip = nodes_at_plane(mesh, 0, 60.0)
f[tip * 3 + 2] = -1.0 / tip.size
fd = jnp.asarray(f, dtype) * st.free_mask
res = cg(st, fd, M=M, tol=1e-6, maxiter=600, precise_dots=False, unroll=8)
print("BJ-CG structured 600 iters: rnorm",
      float(res.residual_norm), flush=True)
