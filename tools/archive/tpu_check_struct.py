import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from topopteval_tpu.fem.bc import DirichletBC, free_mask_from_bcs, nodes_at_plane
from topopteval_tpu.fem.operator import StiffnessOperator
from topopteval_tpu.fem.structured import StructuredStiffnessOperator
from topopteval_tpu.materials import lame_parameters
from topopteval_tpu.models.beams import generate_grid_tet
from topopteval_tpu.utils import set_verbosity

set_verbosity(False)
dtype = jnp.float32
nx, ny, nz = 48, 16, 8
box = (60.0, 20.0, 4.0)
lam, mu = lame_parameters(1.0, 0.3)
mesh = generate_grid_tet(nx, ny, nz, (0, 0, 0), box)
mask = free_mask_from_bcs(mesh.n_dofs,
                          [DirichletBC.fixed(nodes_at_plane(mesh, 0, 0.0))])
dmesh = mesh.device(dtype=dtype)
gen = StiffnessOperator.build(dmesh, lam, mu,
                              free_mask=jnp.asarray(mask, dtype),
                              mode="otf", order=1)
st = StructuredStiffnessOperator.build(nx, ny, nz, (0, 0, 0), box, lam, mu,
                                       free_mask=mask, dtype=dtype)
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal(mesh.n_dofs), dtype)

a = np.asarray(jax.jit(gen.matvec)(u))
b = np.asarray(jax.jit(st.matvec)(u))
scale = np.abs(a).max()
print("matvec max rel diff:", np.abs(a - b).max() / scale, flush=True)

ba = np.asarray(jax.jit(gen.node_blocks_raw)())
bb = np.asarray(jax.jit(st.node_blocks_raw)())
print("blocks max rel diff:",
      np.abs(ba - bb).max() / np.abs(ba).max(), flush=True)

# MG solve with the structured hierarchy
from topopteval_tpu.fem.multigrid import build_structured_multigrid
from topopteval_tpu.fem.solvers import cg
mesh2, op2, mg2 = build_structured_multigrid(
    nx, ny, nz, (0, 0, 0), box, lam, mu, dtype=dtype,
    operator="structured")
tip = nodes_at_plane(mesh2, 0, 60.0)
f = np.zeros(mesh2.n_dofs)
f[tip * 3 + 2] = -1.0 / tip.size
fd = jnp.asarray(f, dtype) * op2.free_mask
res = cg(op2, fd, M=mg2, tol=1e-6, maxiter=100, precise_dots=False)
print("MG structured:", int(res.niter), float(res.residual_norm),
      bool(res.converged),
      "energy", float(0.5 * jnp.vdot(res.x, fd)), flush=True)
