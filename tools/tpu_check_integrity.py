"""Diagnose the bench integrity failure: is the structured-op MG-PCG
solution wrong, or is the *out-of-loop* fresh matvec the thing that
miscompiles on axon?

Cross-checks, at the bench size (or a CLI-set scale):
  1. TPU eager structured matvec residual   (what bench.py computes)
  2. TPU jitted  structured matvec residual (single program)
  3. host fp64 NumPy matvec residual        (fully independent oracle)
plus the energy from each side.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def numpy_tet4_matvec(coords, conn, lam, mu, u, free_mask):
    """fp64 reference r = m*A(m*u) + (1-m)*u, independent of JAX."""
    coords = np.asarray(coords, np.float64)
    u = np.asarray(u, np.float64)
    m = np.asarray(free_mask, np.float64)
    um = (m * u).reshape(-1, 3)
    X = coords[conn]                           # [C,4,3]
    E = X[:, 1:] - X[:, :1]                    # [C,3,3]
    vol = np.linalg.det(E) / 6.0
    invE = np.linalg.inv(E)
    g = np.empty((conn.shape[0], 4, 3))
    g[:, 1:, :] = np.transpose(invE, (0, 2, 1))
    g[:, 0, :] = -g[:, 1:, :].sum(axis=1)
    ue = um[conn]                              # [C,4,3]
    gu = np.einsum("cka,ckb->cab", ue, g)      # grad u
    tr = np.trace(gu, axis1=1, axis2=2)
    sig = mu * (gu + np.transpose(gu, (0, 2, 1)))
    sig[:, 0, 0] += lam * tr
    sig[:, 1, 1] += lam * tr
    sig[:, 2, 2] += lam * tr
    fe = vol[:, None, None] * np.einsum("cab,ckb->cka", sig, g)
    r = np.zeros_like(um)
    np.add.at(r, conn, fe)
    r = (m * r.reshape(-1)) + (1.0 - m) * u
    return r


def main():
    import jax
    import jax.numpy as jnp

    from topopteval_tpu.fem.bc import nodes_at_plane
    from topopteval_tpu.fem.multigrid import build_structured_multigrid
    from topopteval_tpu.fem.solvers import cg
    from topopteval_tpu.materials import lame_parameters
    from topopteval_tpu.utils import set_verbosity

    set_verbosity(False)
    dtype = jnp.float32
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    nx, ny, nz = 25 * scale // 2, 4 * scale, scale
    lam, mu = lame_parameters(1.0, 0.3)

    t0 = time.perf_counter()
    mesh, op, mg = build_structured_multigrid(
        nx, ny, nz, (0.0, 0.0, 0.0), (60.0, 20.0, 4.0), lam, mu,
        dtype=dtype, omega=0.7, nu=2)
    print(f"mesh: {mesh.n_cells} tets, {mesh.n_dofs} dofs "
          f"({time.perf_counter() - t0:.1f}s build)", flush=True)

    tip = nodes_at_plane(mesh, 0, 60.0)
    f = np.zeros(mesh.n_dofs)
    f[tip * 3 + 2] = -1.0 / tip.size
    f_dev = jnp.asarray(f, dtype) * op.free_mask

    tol = 1e-6
    res = cg(op, f_dev, M=mg, tol=tol, maxiter=50,
             precise_dots=False, unroll=1)
    x = res.x
    x.block_until_ready()
    print(f"solve: {int(res.niter)} iters, converged={bool(res.converged)}, "
          f"recurrence rnorm={float(res.residual_norm):.3e}", flush=True)

    # 1. eager fresh matvec (bench's integrity path)
    r_eager = float(jnp.linalg.norm(f_dev - op.matvec(x)))
    # 2. jitted fresh matvec
    rnorm_jit = jax.jit(lambda u: jnp.linalg.norm(f_dev - op.matvec(u)))
    r_jit = float(rnorm_jit(x))
    # 3. host fp64 oracle
    x_host = np.asarray(x, np.float64)
    f_host = np.asarray(f_dev, np.float64)
    mask_host = np.asarray(op.free_mask, np.float64)
    r_np = numpy_tet4_matvec(mesh.coords, mesh.conn, lam, mu,
                             x_host, mask_host)
    r_oracle = float(np.linalg.norm(f_host - r_np))

    energy = float(0.5 * np.dot(x_host, f_host))
    print(f"energy          : {energy:.6e}")
    print(f"eager  TPU rnorm: {r_eager:.3e}   (fresh-matvec path)")
    print(f"jitted TPU rnorm: {r_jit:.3e}")
    print(f"numpy fp64 rnorm: {r_oracle:.3e}   (ground truth)")
    rnorm0 = float(np.linalg.norm(f_host))
    print(f"||f||           : {rnorm0:.3e}")
    # judge by normwise backward error, NOT an absolute threshold: the
    # fp32 attainable floor is eps*||A||*||x|| (docs/PERF_NOTES.md) and a
    # correct backward-stable solve sits exactly there.  ||A||_2 via
    # power iteration on the host fp64 oracle matvec (solution-independent
    # start vector).
    rng = np.random.default_rng(1)
    v = rng.standard_normal(mesh.n_dofs)
    v /= np.linalg.norm(v)
    lam_max = 0.0
    for _ in range(30):
        w = numpy_tet4_matvec(mesh.coords, mesh.conn, lam, mu, v, mask_host)
        lam_max = np.linalg.norm(w)
        v = w / lam_max
    xnorm = float(np.linalg.norm(x_host))
    eta = r_oracle / (lam_max * xnorm + rnorm0)
    print(f"||A||_2 ~ {lam_max:.3f}, ||x|| = {xnorm:.3e}, "
          f"backward error eta = {eta:.2e}")
    verdict = ("SOLUTION BACKWARD-STABLE (fp32 floor)" if eta <= 2e-6
               else "SOLUTION WRONG")
    if r_eager > 10 * r_oracle or r_eager < 0.1 * r_oracle:
        verdict += "; FRESH-MATVEC MISCOMPILE (device != host oracle)"
    print(f"verdict: {verdict}")


if __name__ == "__main__":
    main()
