import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from topopteval_tpu.fem.bc import DirichletBC, free_mask_from_bcs, nodes_at_plane
from topopteval_tpu.fem.operator import StiffnessOperator
from topopteval_tpu.fem.structured import StructuredStiffnessOperator
from topopteval_tpu.fem.multigrid import build_structured_multigrid
from topopteval_tpu.fem.solvers import cg
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

# determinism probe: same input every scan iteration -> outputs identical?
@jax.jit
def fixed_scan(x):
    def body(c, _):
        y = st.matvec(x)
        return c + 0.0, y
    _, ys = jax.lax.scan(body, jnp.float32(0.0), None, length=4)
    return ys

ys = np.asarray(fixed_scan(u0))
single = np.asarray(jax.jit(st.matvec)(u0))
sc = np.abs(single).max()
for i in range(4):
    print(f"scan iter {i} vs single rel diff:",
          np.abs(ys[i] - single).max() / sc, flush=True)
print("scan iter0 vs iter1 identical:",
      float(np.abs(ys[0] - ys[1]).max()), flush=True)

# the real test: MG-PCG at bench size with structured op, small chunks
mesh2, op2, mg2 = build_structured_multigrid(
    nx, ny, nz, (0, 0, 0), box, lam, mu, dtype=dtype,
    operator="structured")
f = np.zeros(mesh2.n_dofs)
tip = nodes_at_plane(mesh2, 0, 60.0)
f[tip * 3 + 2] = -1.0 / tip.size
fd = jnp.asarray(f, dtype) * op2.free_mask
x = None
for ci in range(4):
    res = cg(op2, fd, x0=x, M=mg2, tol=1e-6, maxiter=10,
             precise_dots=False)
    x = res.x
    print(f"MG chunk {ci}: rnorm={float(res.residual_norm):.3e}",
          flush=True)
