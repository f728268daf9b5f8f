"""A/B the quadratic Ke kernels' lane-block size on chip (VERDICT r4 #7).

The stream kernels' cost model is vreg-op ISSUE bound: every op is a
[block]-shaped vector, so block=256 (hex8) / 128 (tet10) fills 2 / 1 of
the vreg's 8 sublanes and wastes 4x / 8x of VPU issue.  This probe
times hex8/tet10 Ke at block in {256, 512, 1024, 2048} to pick the
default.  Run on the real chip (axon); ~1 min.

    python tools/tpu_ke_block_ab.py
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from topopteval_tpu.models.beams import generate_grid_tet  # noqa: E402
from topopteval_tpu.ops.pallas_kernels import (  # noqa: E402
    hex8_element_stiffness_pallas, tet10_element_stiffness_pallas)
from topopteval_tpu.materials import lame_parameters  # noqa: E402


import functools  # noqa: E402


def time_ke(fn, coords_e, lam, mu, block, reps=10, passes=3):
    """Chained-in-one-jit + scalar host-force protocol (the axon
    backend elides / defers un-consumed dispatches: a naive
    loop+block_until_ready probe read 0.01 ms for a 0.6 ms-minimum
    kernel — see docs/PERF_NOTES.md timing-protocol section)."""

    @functools.partial(jax.jit, static_argnames=("reps", "block"))
    def chain(ce, l2, m2, reps, block):
        acc = jnp.float32(0.0)
        for _ in range(reps):
            out = fn(ce, l2, m2, block=block, transpose_out=False)
            acc = acc + out[0, 0]
            # thread the scalar back in so no iteration can be elided
            l2 = l2 * (1.0 + acc * jnp.float32(1e-30))
        return acc

    r = chain(coords_e, lam, mu, reps, block)     # compile
    _ = float(r)                                  # host-force warm
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        _ = float(chain(coords_e, lam, mu, reps, block))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    lam, mu = lame_parameters(200e9, 0.3)
    print(f"devices: {jax.devices()}")

    # hex8 / tet10 at the BENCH leg sizes (204,800 / 153,600 elems) —
    # a first cut at 20k elems fit in cache and measured dispatch noise
    from topopteval_tpu.models.beams import generate_grid_hex
    hmesh = generate_grid_hex(200, 64, 16, (0.0, 0.0, 0.0),
                              (60.0, 20.0, 4.0))
    C = hmesh.n_cells
    hcoords = jnp.asarray(hmesh.coords[hmesh.conn], jnp.float32)
    l2 = jnp.full((C,), lam, jnp.float32)
    m2 = jnp.full((C,), mu, jnp.float32)
    print(f"hex8: {C} elems")
    for blk in (256, 512, 1024, 2048):
        try:
            dt = time_ke(hex8_element_stiffness_pallas, hcoords, l2, m2,
                         blk)
        except Exception as e:
            print(f"  block={blk:5d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}")
            continue
        print(f"  block={blk:5d}: {dt * 1e3:7.2f} ms  "
              f"{C / dt:.3e} hexes/s")

    qmesh = generate_grid_tet(100, 32, 8, (0, 0, 0),
                              (60.0, 20.0, 4.0)).to_quadratic()
    Cq = qmesh.n_cells
    qcoords = jnp.asarray(qmesh.coords[qmesh.conn], jnp.float32)
    lq = jnp.full((Cq,), lam, jnp.float32)
    mq = jnp.full((Cq,), mu, jnp.float32)
    print(f"tet10: {Cq} elems")
    for blk in (128, 256, 512, 1024):
        try:
            dt = time_ke(tet10_element_stiffness_pallas, qcoords, lq, mq,
                         blk)
        except Exception as e:
            print(f"  block={blk:5d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}")
            continue
        print(f"  block={blk:5d}: {dt * 1e3:7.2f} ms  "
              f"{Cq / dt:.3e} tet10/s")


if __name__ == "__main__":
    main()
