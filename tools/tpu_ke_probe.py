"""Probe Tet4 Ke-kernel variants for assembly throughput headroom.

Variants:
  base      — current production kernel (ops/pallas_kernels.py)
  cse       — precompute lam_v*g and mu_v*g vectors (halves multiplies)
  stack     — same compute, single stacked [144, block] store
  blockN    — block-size sweep of the best variant
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from topopteval_tpu.ops.pallas_kernels import (_cdiv, _tet4_geometry,
                                               tet4_element_stiffness_pallas)


def _tet4_ke_kernel_cse(coords_ref, lam_ref, mu_ref, out_ref):
    x = [coords_ref[i, :] for i in range(12)]
    lam = lam_ref[0, :]
    mu = mu_ref[0, :]
    g, vol = _tet4_geometry(x)
    lam_v = lam * vol
    mu_v = mu * vol
    lg = [[lam_v * g[i][a] for a in range(3)] for i in range(4)]
    mg = [[mu_v * g[i][a] for a in range(3)] for i in range(4)]
    mdots = [[mg[i][0] * g[j][0] + mg[i][1] * g[j][1] + mg[i][2] * g[j][2]
              for j in range(4)] for i in range(4)]
    for i in range(4):
        for a in range(3):
            for j in range(4):
                for b in range(3):
                    val = lg[i][a] * g[j][b] + mg[i][b] * g[j][a]
                    if a == b:
                        val = val + mdots[i][j]
                    out_ref[(3 * i + a) * 12 + (3 * j + b), :] = val


def _tet4_ke_kernel_stack(coords_ref, lam_ref, mu_ref, out_ref):
    x = [coords_ref[i, :] for i in range(12)]
    lam = lam_ref[0, :]
    mu = mu_ref[0, :]
    g, vol = _tet4_geometry(x)
    lam_v = lam * vol
    mu_v = mu * vol
    lg = [[lam_v * g[i][a] for a in range(3)] for i in range(4)]
    mg = [[mu_v * g[i][a] for a in range(3)] for i in range(4)]
    mdots = [[mg[i][0] * g[j][0] + mg[i][1] * g[j][1] + mg[i][2] * g[j][2]
              for j in range(4)] for i in range(4)]
    rows = []
    for i in range(4):
        for a in range(3):
            for j in range(4):
                for b in range(3):
                    val = lg[i][a] * g[j][b] + mg[i][b] * g[j][a]
                    if a == b:
                        val = val + mdots[i][j]
                    rows.append(val)
    out_ref[:, :] = jnp.stack(rows, axis=0)


def make_variant(kernel, block):
    @functools.partial(jax.jit, static_argnames=())
    def fn(ct, lam2, mu2):
        Cp = ct.shape[1]
        return pl.pallas_call(
            kernel,
            grid=(Cp // block,),
            in_specs=[
                pl.BlockSpec((12, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((144, block), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((144, Cp), ct.dtype),
        )(ct, lam2, mu2)
    return fn


def main():
    from topopteval_tpu.models.beams import generate_grid_tet
    from topopteval_tpu.materials import lame_parameters
    from topopteval_tpu.utils import set_verbosity
    set_verbosity(False)

    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    nx, ny, nz = 25 * scale // 2, 4 * scale, scale
    mesh = generate_grid_tet(nx, ny, nz, (0, 0, 0), (60.0, 20.0, 4.0))
    lam, mu = lame_parameters(1.0, 0.3)
    dtype = jnp.float32
    dmesh = mesh.device(dtype=dtype)
    coords_e = dmesh.coords[dmesh.conn]
    C = mesh.n_cells
    lam_e = jnp.full(C, lam, dtype)
    mu_e = jnp.full(C, mu, dtype)
    print(f"C = {C}", flush=True)

    # reference output for parity (einsum-free: production pallas kernel)
    ref = np.asarray(tet4_element_stiffness_pallas(
        coords_e, lam_e, mu_e, transpose_out=False)[:, :100])

    def bench(name, kernel, block, reps=5):
        Cp = _cdiv(C, block) * block
        ct = jnp.pad(jnp.swapaxes(coords_e.reshape(C, 12), 0, 1),
                     ((0, 0), (0, Cp - C)))
        lam2 = jnp.pad(lam_e.reshape(1, C), ((0, 0), (0, Cp - C)))
        mu2 = jnp.pad(mu_e.reshape(1, C), ((0, 0), (0, Cp - C)))
        fn = make_variant(kernel, block)
        out = fn(ct, lam2, mu2)
        out.block_until_ready()
        err = float(np.abs(np.asarray(out[:, :100]) - ref).max())
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(ct, lam2, mu2)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:18s} block={block:5d}: {dt * 1e3:6.2f} ms "
              f"-> {C / dt:.3e} tets/s   maxerr={err:.2e}", flush=True)

    # production baseline through its public wrapper
    kfn = jax.jit(lambda ce: tet4_element_stiffness_pallas(
        ce, lam_e, mu_e, transpose_out=False))
    out = kfn(coords_e); out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        out = kfn(coords_e)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / 5
    import inspect
    prod_block = inspect.signature(
        tet4_element_stiffness_pallas).parameters["block"].default
    print(f"{'production':18s} block={prod_block:5d}: {dt * 1e3:6.2f} ms "
          f"-> {C / dt:.3e} tets/s", flush=True)

    from topopteval_tpu.ops.pallas_kernels import _tet4_ke_kernel
    for blk in (512, 1024, 2048):
        bench("base", _tet4_ke_kernel, blk)
    for blk in (512, 1024, 2048):
        bench("cse", _tet4_ke_kernel_cse, blk)
    for blk in (512, 1024, 2048):
        bench("stack", _tet4_ke_kernel_stack, blk)


if __name__ == "__main__":
    main()
