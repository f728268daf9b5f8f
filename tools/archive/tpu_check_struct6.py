import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from topopteval_tpu.fem.multigrid import build_structured_multigrid
from topopteval_tpu.materials import lame_parameters
from topopteval_tpu.utils import set_verbosity

set_verbosity(False)
dtype = jnp.float32
lam, mu = lame_parameters(1.0, 0.3)
nx, ny, nz = int(sys.argv[1]) if len(sys.argv) > 1 else 200, \
    int(sys.argv[2]) if len(sys.argv) > 2 else 64, \
    int(sys.argv[3]) if len(sys.argv) > 3 else 16
box = (60.0, 20.0, 4.0)

mg = {}
op = {}
for kind in ["general", "structured"]:
    mesh, o, m = build_structured_multigrid(
        nx, ny, nz, (0, 0, 0), box, lam, mu, dtype=dtype, operator=kind)
    mg[kind] = m
    op[kind] = o
    print(kind, "built", flush=True)

rng = np.random.default_rng(0)
r = jnp.asarray(rng.standard_normal(op["general"].n_dofs), dtype)
r = r * op["general"].free_mask
zg = np.asarray(jax.jit(mg["general"].apply)(r))
zs = np.asarray(jax.jit(mg["structured"].apply)(r))
print("vcycle g vs s rel diff:",
      np.abs(zg - zs).max() / np.abs(zg).max(), flush=True)

r2 = jnp.asarray(rng.standard_normal(op["general"].n_dofs), dtype)
r2 = r2 * op["general"].free_mask
for kind in ["general", "structured"]:
    m = mg[kind]
    a = float(jnp.vdot(jax.jit(m.apply)(r), r2))
    b = float(jnp.vdot(r, jax.jit(m.apply)(r2)))
    pos = float(jnp.vdot(r, jax.jit(m.apply)(r)))
    print(f"{kind}: sym rel {abs(a-b)/max(abs(a),abs(b)):.3e} "
          f"posdef <r,Mr>={pos:.4e}", flush=True)

# per-level comparisons
for li, (Lg, Ls) in enumerate(zip(mg["general"].levels,
                                  mg["structured"].levels)):
    n = Lg.op.n_dofs
    u = jnp.asarray(rng.standard_normal(n), dtype)
    ag = np.asarray(jax.jit(Lg.op.matvec)(u))
    as_ = np.asarray(jax.jit(Ls.op.matvec)(u))
    bd = np.abs(np.asarray(Lg.binv) - np.asarray(Ls.binv)).max() \
        / np.abs(np.asarray(Lg.binv)).max()
    md = np.abs(np.asarray(Lg.op.free_mask)
                - np.asarray(Ls.op.free_mask)).max()
    print(f"level {li}: matvec rel "
          f"{np.abs(ag - as_).max() / np.abs(ag).max():.3e} binv rel "
          f"{bd:.3e} mask diff {md}", flush=True)
ci = np.abs(np.asarray(mg['general'].coarse_inv)
            - np.asarray(mg['structured'].coarse_inv)).max() \
    / np.abs(np.asarray(mg['general'].coarse_inv)).max()
print("coarse_inv rel diff:", ci, flush=True)
