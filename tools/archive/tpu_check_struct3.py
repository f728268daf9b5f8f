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
lam, mu = lame_parameters(1.0, 0.3)
nx, ny, nz = 25, 8, 2            # the bench hierarchy's coarsest level
box = (60.0, 20.0, 4.0)
mesh = generate_grid_tet(nx, ny, nz, (0, 0, 0), box)
mask = free_mask_from_bcs(mesh.n_dofs,
                          [DirichletBC.fixed(nodes_at_plane(mesh, 0, 0.0))])
dmesh = mesh.device(dtype=dtype)
gen = StiffnessOperator.build(dmesh, lam, mu,
                              free_mask=jnp.asarray(mask, dtype),
                              mode="otf", order=1)
st = StructuredStiffnessOperator.build(nx, ny, nz, (0, 0, 0), box, lam, mu,
                                       free_mask=mask, dtype=dtype)
n = mesh.n_dofs
eye = np.eye(n, dtype=np.float32)
mvg = jax.jit(jax.vmap(gen.matvec, in_axes=1, out_axes=1))
mvs = jax.jit(jax.vmap(st.matvec, in_axes=1, out_axes=1))
bs = 256
Kg, Ks = [], []
for j0 in range(0, n, bs):
    blk = jnp.asarray(eye[:, j0:j0+bs])
    if blk.shape[1] < bs:
        blk = jnp.pad(blk, ((0, 0), (0, bs - blk.shape[1])))
    Kg.append(np.asarray(mvg(blk)))
    Ks.append(np.asarray(mvs(blk)))
Kg = np.concatenate(Kg, 1)[:, :n]
Ks = np.concatenate(Ks, 1)[:, :n]
print("K_c (coarsest) rel diff:",
      np.abs(Kg - Ks).max() / np.abs(Kg).max(), flush=True)
print("K_c struct symmetric?", np.abs(Ks - Ks.T).max() / np.abs(Ks).max(),
      flush=True)
