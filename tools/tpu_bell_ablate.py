"""Ablation microbenchmark for the BELL kernel on chip: where do the
cycles go?  Variants of the grouped resident-u kernel:

  full     — production kernel (gather + mask + skip)
  nogather — replace take_along_axis with a plain chunk read
  noskip   — full work on every (group, chunk) pair (no pl.when)
  nofinal  — full gather stage, skip the vals FMA/reduction stage
  empty    — only the final stage (gacc zeros)

Usage: python tools/tpu_bell_ablate.py [scale]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np


def log(msg):
    print(msg, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from topopteval_tpu.fem.bell import (assemble_bsr_triplets,
                                         _permute_triplets, rcm_order)
    from topopteval_tpu.materials import lame_parameters
    from topopteval_tpu.models.beams import generate_grid_tet
    from topopteval_tpu.ops.pallas_bsr import GROUP, LANES, pack_ell_rows

    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    log(f"devices: {jax.devices()}")
    nx, ny, nz = 25 * scale // 2, 4 * scale, scale
    mesh = generate_grid_tet(nx, ny, nz, (0, 0, 0), (60, 20, 4))
    lam, mu = lame_parameters(1.0, 0.3)
    C = mesh.n_cells
    r3, c3, b3 = assemble_bsr_triplets(mesh, np.full(C, lam),
                                       np.full(C, mu))
    perm = rcm_order(r3, c3, mesh.n_nodes)
    r3, c3, b3 = _permute_triplets(r3, c3, b3, perm)
    pk = pack_ell_rows(r3, c3, b3.astype(np.float32), mesh.n_nodes,
                       mesh.n_nodes)
    S, kc, Np = pk["S"], pk["kc"], pk["n_rows_p"]
    Nt = Np // LANES
    log(f"mesh {mesh.n_cells} tets; S={S} kc={kc} Nt={Nt}")

    def make_kernel(mode):
        def kernel(wblk_ref, gb_ref, cols_ref, vals_ref, u_ref, out_ref,
                   gacc_ref):
            i = pl.program_id(0)
            gacc_ref[:] = jnp.zeros_like(gacc_ref)
            ng = S // GROUP
            if mode != "empty":
                for g in range(ng):
                    lo = gb_ref[0, 0, 2 * g]
                    hi = gb_ref[0, 0, 2 * g + 1]
                    col8 = cols_ref[0, g * GROUP:(g + 1) * GROUP, :]
                    for c in range(kc):
                        def body(g=g, c=c, col8=col8):
                            off = (wblk_ref[i] + c) * LANES
                            chunk = u_ref[:, pl.ds(
                                pl.multiple_of(off, LANES), LANES)]
                            rows = [jnp.broadcast_to(
                                chunk[a:a + 1, :], (GROUP, LANES))
                                for a in range(3)]
                            ug = jnp.concatenate(rows, axis=0)
                            idx8 = col8 - off
                            inb8 = (jnp.clip(idx8 + 1, 0, 1)
                                    * jnp.clip(LANES - idx8, 0, 1)) \
                                .astype(ug.dtype)
                            idxc8 = jnp.clip(idx8, 0, LANES - 1)
                            idx24 = jnp.concatenate(
                                [idxc8, idxc8, idxc8], axis=0)
                            if mode == "nogather":
                                g24 = ug
                            else:
                                g24 = jnp.take_along_axis(
                                    ug, idx24, axis=1,
                                    mode="promise_in_bounds")
                            m24 = jnp.concatenate([inb8, inb8, inb8],
                                                  axis=0)
                            t24 = g24 * m24
                            for a in range(3):
                                gacc_ref[a * S + g * GROUP:
                                         a * S + (g + 1) * GROUP, :] += \
                                    t24[a * GROUP:(a + 1) * GROUP, :]
                        if mode == "noskip":
                            body()
                        else:
                            pl.when((c >= lo) & (c <= hi))(body)
            if mode == "nofinal":
                out_ref[:] = gacc_ref[0:3, :]
            else:
                outs = []
                for a in range(3):
                    acc = None
                    for b in range(3):
                        v = vals_ref[0, (3 * a + b) * S:
                                     (3 * a + b + 1) * S, :]
                        gb_ = gacc_ref[b * S:(b + 1) * S, :]
                        term = v * gb_
                        acc = term if acc is None else acc + term
                    outs.append(jnp.sum(acc, axis=0, keepdims=True))
                out_ref[:] = jnp.concatenate(outs, axis=0)

        return kernel

    @functools.partial(jax.jit, static_argnames=("mode", "reps"))
    def run(c2, v2, wb, gb, u, mode, reps):
        # on-device fori_loop: one dispatch, reps sequential kernel calls
        # (call-level chaining measured BELOW the tunnel dispatch floor —
        # the axon layer appears to serve repeated identical dispatches
        # from a cache, docs/PERF_NOTES.md round 3)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Nt,),
            in_specs=[
                pl.BlockSpec((1, 1, gb.shape[-1]), lambda i, w: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, S, LANES), lambda i, w: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 9 * S, LANES), lambda i, w: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, Np), lambda i, w: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((3, LANES), lambda i, w: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((3 * S, LANES), u.dtype)],
        )
        call = pl.pallas_call(
            make_kernel(mode), grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((3, Np), u.dtype))
        c3r = c2.reshape(Nt, S, LANES)
        v3r = v2.reshape(Nt, 9 * S, LANES)

        def body(_, y):
            y = call(wb, gb, c3r, v3r, y)
            return y * (1.0 / jnp.float32(1000.0))

        # scalar output: forcing it on host guarantees execution finished
        # (block_until_ready does NOT block on the axon backend)
        return jnp.sum(jax.lax.fori_loop(0, reps, body, u))

    rng = np.random.default_rng(0)
    u = np.zeros((3, Np), np.float32)
    u[:, :mesh.n_nodes] = rng.standard_normal((3, mesh.n_nodes))
    c2 = jnp.asarray(pk["cols2"])
    v2 = jnp.asarray(pk["vals2"])
    wb, gb = jnp.asarray(pk["wblk"]), jnp.asarray(pk["gbounds"])
    u_d = jnp.asarray(u)
    reps = 200
    for mode in ("full", "nogather", "noskip", "nofinal", "empty"):
        float(np.asarray(run(c2, v2, wb, gb, u_d, mode, reps)))  # warmup
        times = []
        for it in range(3):
            u_v = jnp.asarray(u * (1.0 + 0.1 * it))   # fresh input buffer
            t0 = time.time()
            s = float(np.asarray(run(c2, v2, wb, gb, u_v, mode, reps)))
            times.append(time.time() - t0)
        dt = min(times) / reps
        log(f"{mode:9s}: {dt*1e3:.3f} ms/matvec (totals "
            f"{['%.3f' % t for t in times]}, sum={s:.3e})")
    log("ABLATE OK")


if __name__ == "__main__":
    main()
