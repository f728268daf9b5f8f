"""On-chip validation of EVERY BELL hierarchy component against numpy.

Loads a saved hierarchy .npz, runs each level's Pallas matvec and each
transfer's prolong/restrict on random vectors, and compares against a
pure-numpy evaluation of the packed arrays.  Pinpoints which component
miscomputes on the real chip.

Usage: python tools/tpu_hier_check.py <hierarchy.npz>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np


def log(msg):
    print(msg, flush=True)


def np_bell(cols2, vals2, u, S):
    """numpy twin of the plane-major block-ELL matvec."""
    Np = u.shape[1]
    Nt = Np // 128
    cols = cols2.reshape(Nt, S, 128).transpose(1, 0, 2).reshape(S, Np)
    vals = vals2.reshape(Nt, 9, S, 128).transpose(1, 2, 0, 3) \
        .reshape(9, S, Np)
    out = np.zeros((3, Np), u.dtype)
    for s in range(S):
        g = u[:, cols[s]]
        for a in range(3):
            out[a] += (vals[3 * a + 0, s] * g[0]
                       + vals[3 * a + 1, s] * g[1]
                       + vals[3 * a + 2, s] * g[2])
    return out


def np_sell(cols2, w2, u, S, n_rows_p):
    Nt = n_rows_p // 128
    cols = cols2.reshape(Nt, S, 128).transpose(1, 0, 2).reshape(
        S, n_rows_p)
    w = w2.reshape(Nt, S, 128).transpose(1, 0, 2).reshape(S, n_rows_p)
    out = np.zeros((3, n_rows_p), u.dtype)
    for s in range(S):
        out += w[s][None, :] * u[:, cols[s]]
    return out


def rel(a, b):
    d = np.abs(a - b).max()
    s = max(np.abs(b).max(), 1e-30)
    return d / s


def main():
    import jax
    import jax.numpy as jnp

    from topopteval_tpu.ops.pallas_bsr import (bell_matvec_pallas,
                                               sell_matvec_pallas)

    path = sys.argv[1]
    z = np.load(path)
    log(f"devices: {jax.devices()}; hierarchy {path}")
    rng = np.random.default_rng(0)
    n_levels = int(z["n_levels"])
    for i in range(n_levels):
        S, kc, nrp = (int(x) for x in z[f"L{i}_meta"])
        c2 = z[f"L{i}_cols2"]
        v2 = z[f"L{i}_vals2"].astype(np.float32)
        wb = z[f"L{i}_wblk"]
        gb = z[f"L{i}_gb"]
        u = rng.standard_normal((3, nrp)).astype(np.float32)
        want = np_bell(c2, v2, u, S)
        got = np.asarray(bell_matvec_pallas(
            jnp.asarray(c2), jnp.asarray(v2), jnp.asarray(wb),
            jnp.asarray(gb), jnp.asarray(u), S, kc))
        log(f"L{i} op (S={S} kc={kc} Np={nrp}): rel err {rel(got, want):.2e}")
        if f"L{i}_t_meta" in z:
            pS, pkc, rS, rkc, nf_p, nc_p = (int(x)
                                            for x in z[f"L{i}_t_meta"])
            uc = rng.standard_normal((3, nc_p)).astype(np.float32)
            want = np_sell(z[f"L{i}_t_pcols"],
                           z[f"L{i}_t_pw"].astype(np.float32), uc, pS,
                           nf_p)
            got = np.asarray(sell_matvec_pallas(
                jnp.asarray(z[f"L{i}_t_pcols"]),
                jnp.asarray(z[f"L{i}_t_pw"].astype(np.float32)),
                jnp.asarray(z[f"L{i}_t_pwblk"]),
                jnp.asarray(z[f"L{i}_t_pgb"]), jnp.asarray(uc), pS, pkc))
            log(f"L{i} prolong (S={pS} kc={pkc}): rel err "
                f"{rel(got, want):.2e}")
            uf = rng.standard_normal((3, nf_p)).astype(np.float32)
            want = np_sell(z[f"L{i}_t_rcols"],
                           z[f"L{i}_t_rw"].astype(np.float32), uf, rS,
                           nc_p)
            got = np.asarray(sell_matvec_pallas(
                jnp.asarray(z[f"L{i}_t_rcols"]),
                jnp.asarray(z[f"L{i}_t_rw"].astype(np.float32)),
                jnp.asarray(z[f"L{i}_t_rwblk"]),
                jnp.asarray(z[f"L{i}_t_rgb"]), jnp.asarray(uf), rS, rkc))
            log(f"L{i} restrict (S={rS} kc={rkc}): rel err "
                f"{rel(got, want):.2e}")
    log("HIERCHECK DONE")


if __name__ == "__main__":
    main()
