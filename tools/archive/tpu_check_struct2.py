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

for (nx, ny, nz) in [(100, 32, 8), (200, 64, 16)]:
    box = (60.0, 20.0, 4.0)
    mesh = generate_grid_tet(nx, ny, nz, (0, 0, 0), box)
    mask = free_mask_from_bcs(
        mesh.n_dofs, [DirichletBC.fixed(nodes_at_plane(mesh, 0, 0.0))])
    dmesh = mesh.device(dtype=dtype)
    gen = StiffnessOperator.build(dmesh, lam, mu,
                                  free_mask=jnp.asarray(mask, dtype),
                                  mode="otf", order=1)
    st = StructuredStiffnessOperator.build(nx, ny, nz, (0, 0, 0), box,
                                           lam, mu, free_mask=mask,
                                           dtype=dtype)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(mesh.n_dofs), dtype)
    a = np.asarray(jax.jit(gen.matvec)(u))
    b = np.asarray(jax.jit(st.matvec)(u))
    print(f"({nx},{ny},{nz}) matvec rel diff:",
          np.abs(a - b).max() / np.abs(a).max(), flush=True)
    ba = np.asarray(jax.jit(gen.node_blocks_raw)())
    bb = np.asarray(jax.jit(st.node_blocks_raw)())
    print(f"({nx},{ny},{nz}) blocks rel diff:",
          np.abs(ba - bb).max() / np.abs(ba).max(), flush=True)
    del gen, st, dmesh
