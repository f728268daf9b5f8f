"""On-chip elementwise parity: pallas stencil vs slices formulation.

Interpret mode matches slices to machine eps, compiled axon does not
(e2e energy 522.45 vs 324.12, deterministic).  Localize: run both
matvecs on the REAL chip at small sizes, diff elementwise, print where
the error lives (z plane / y row / lane pattern).

    python tools/tpu_stencil_parity.py [nx ny nz]
"""

import os
import sys

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax.numpy as jnp

    from topopteval_tpu.fem.structured import StructuredStiffnessOperator
    from topopteval_tpu.materials import lame_parameters

    argv = [a for a in sys.argv[1:]]
    uniform = "uniform" in argv
    args = [int(a) for a in argv if a != "uniform"]
    nx, ny, nz = args if len(args) == 3 else (6, 4, 2)
    lam, mu = lame_parameters(1.0, 0.3)
    rng = np.random.default_rng(0)
    esc = None if uniform else rng.uniform(0.1, 1.0, (nz, ny, nx))
    st = StructuredStiffnessOperator.build(
        nx, ny, nz, (0, 0, 0), (3.0, 2.4, 1.0), lam, mu, escale=esc,
        dtype=jnp.float32)
    u = jnp.asarray(rng.standard_normal(st.n_dofs), jnp.float32)

    os.environ["TOPOPT_STENCIL"] = "slices"
    ref = np.asarray(st.matvec_raw(u)).astype(np.float64)
    os.environ["TOPOPT_STENCIL"] = "pallas"
    got = np.asarray(st.matvec_raw(u)).astype(np.float64)

    NZ, NY, NX = nz + 1, ny + 1, nx + 1
    d = np.abs(got - ref).reshape(NZ, NY, NX, 3)
    scale = np.abs(ref).max()
    log(f"dims cells=({nx},{ny},{nz}); max |ref|={scale:.3e}; "
        f"max abs diff={d.max():.3e}; rel={d.max() / scale:.3e}")
    if d.max() / scale < 1e-5:
        log("PARITY OK")
        return
    bad = d / scale > 1e-5
    zs = np.unique(np.argwhere(bad)[:, 0])
    log(f"bad z planes: {zs.tolist()}")
    for z in zs[:3]:
        ys = np.unique(np.argwhere(bad[z])[:, 0])
        log(f"  z={z}: bad y rows {ys.tolist()[:20]}")
        y = ys[0]
        xs = np.argwhere(bad[z, y])
        log(f"    z={z} y={y}: bad (x, comp) {xs.tolist()[:20]}")
        x, a = xs[0]
        log(f"    sample ref={ref.reshape(NZ, NY, NX, 3)[z, y, x, a]:.6e} "
            f"got={got.reshape(NZ, NY, NX, 3)[z, y, x, a]:.6e}")


if __name__ == "__main__":
    main()
