"""Pinpoint the wrong-energy failure of the BELL MG-PCG solve on chip.

tools/tpu_hier_check.py proved every Pallas kernel correct at full scale,
yet the 1.23M-tet solve returns energy -702 vs oracle +324 while looking
backward-stable.  Remaining suspects:

  (a) the straight-line V-cycle program (composition of proven kernels),
  (b) the lax.while_loop CG program wrapping it (the documented axon
      miscompile class, docs/PERF_NOTES.md).

This probe runs, on the real chip, with the saved full-scale hierarchy:
  1. one jitted V-cycle apply vs a pure-numpy twin,
  2. N iterations of the jitted while_loop CG vs a host-driven eager CG
     using the SAME jitted matvec/V-cycle per step,
and prints per-stage verdicts.

Usage: python tools/tpu_bell_cg_probe.py <hierarchy.npz> [iters]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np

from tools.tpu_hier_check import np_bell, np_sell, rel


def log(msg):
    print(msg, flush=True)


# ---------------------------------------------------------------------------
# numpy twin of BellMG.apply (mirrors fem/bell.py line for line)
# ---------------------------------------------------------------------------


class NpLevel:
    def __init__(self, z, i):
        S, nrp = (int(x) for x in z[f"L{i}_meta"])      # v6 aligned meta
        self.S, self.nrp = S, nrp
        self.cols2 = z[f"L{i}_cols2"]
        self.vals2 = z[f"L{i}_vals2"].astype(np.float32)
        self.mask = z[f"L{i}_mask"].astype(np.float32)
        self.binv9 = z[f"L{i}_binv9"].astype(np.float32)
        self.lam_max = float(z[f"L{i}_lam_max"])
        self.t = None
        if f"L{i}_t_meta" in z:
            (self.pS, self.rS, self.nf_p,
             self.nc_p) = (int(x) for x in z[f"L{i}_t_meta"])
            self.pcols = z[f"L{i}_t_pcols"]
            self.pw = z[f"L{i}_t_pw"].astype(np.float32)
            self.rcols = z[f"L{i}_t_rcols"]
            self.rw = z[f"L{i}_t_rw"].astype(np.float32)
            self.t = True

    def matvec(self, u_flat):
        u = u_flat.reshape(3, self.nrp)
        m = self.mask.reshape(3, self.nrp)
        out = np_bell(self.cols2, self.vals2, (m * u).astype(np.float32),
                      self.S)
        return (m * out + (1.0 - m) * u).reshape(-1)

    def binv(self, v):
        b = self.binv9
        return np.stack([
            b[0] * v[0] + b[1] * v[1] + b[2] * v[2],
            b[3] * v[0] + b[4] * v[1] + b[5] * v[2],
            b[6] * v[0] + b[7] * v[1] + b[8] * v[2]])


def np_cheb(L, r, z, sweeps):
    b = 1.1 * L.lam_max
    a = L.lam_max / 4.0
    theta = 0.5 * (b + a)
    delta = 0.5 * (b - a)
    s1 = theta / delta
    if z is None:
        rr = r
        d = L.binv(rr) * np.float32(1.0 / theta)
        z = d
    else:
        rr = r - L.matvec(z.reshape(-1)).reshape(3, -1)
        d = L.binv(rr) * np.float32(1.0 / theta)
        z = z + d
    rho_old = 1.0 / s1
    for _ in range(sweeps - 1):
        rho = 1.0 / (2.0 * s1 - rho_old)
        rr = r - L.matvec(z.reshape(-1)).reshape(3, -1)
        d = np.float32(rho * rho_old) * d \
            + np.float32(2.0 * rho / delta) * L.binv(rr)
        z = z + d
        rho_old = rho
    return z


def np_vcycle(levels, coarse_inv, nu, lvl, r):
    if lvl == len(levels):
        return (coarse_inv @ r.reshape(-1)).reshape(3, -1)
    L = levels[lvl]
    z = np_cheb(L, r, None, nu)
    res = r - L.matvec(z.reshape(-1)).reshape(3, -1)
    m_f = L.mask.reshape(3, -1)
    rc = np_sell(L.rcols, L.rw, (res * m_f).astype(np.float32), L.rS,
                 L.nc_p)
    if lvl + 1 < len(levels):
        m_c = levels[lvl + 1].mask.reshape(3, -1)
    else:
        m_c = 1.0
    zc = np_vcycle(levels, coarse_inv, nu, lvl + 1,
                   (rc * m_c).astype(np.float32))
    zf = np_sell(L.pcols, L.pw, zc.astype(np.float32), L.pS, L.nf_p)
    z = z + zf * m_f
    z = np_cheb(L, r, z, nu)
    return z


def main():
    import jax
    import jax.numpy as jnp

    from topopteval_tpu.fem.bell import load_hierarchy
    from topopteval_tpu.fem.solvers import cg

    path = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    system, mg, _ = load_hierarchy(path, jnp.float32)
    log(f"devices: {jax.devices()}; levels {len(mg.levels)}, "
        f"nu={mg.nu}, smoother={mg.smoother}")

    z = np.load(path)
    levels = [NpLevel(z, i) for i in range(int(z["n_levels"]))]
    coarse_inv = z["coarse_inv"].astype(np.float32)
    A = system.matrix
    Np0 = A.n_rows_p
    mask = np.asarray(A.free_mask, np.float32)

    rng = np.random.default_rng(1)
    r0 = (rng.standard_normal(3 * Np0).astype(np.float32) * mask)

    # --- stage 1: one V-cycle apply, chip vs numpy ---------------------------
    apply_jit = jax.jit(lambda m, r: m.apply(r))
    got = np.asarray(apply_jit(mg, jnp.asarray(r0)))
    want = np_vcycle(levels, coarse_inv, mg.nu, 0,
                     r0.reshape(3, Np0)).reshape(-1)
    e = rel(got, want)
    log(f"stage1 V-cycle apply: rel err {e:.2e} "
        f"({'OK' if e < 3e-4 else 'MISMATCH'})")

    # --- stage 2: while_loop CG vs host-driven eager CG ----------------------
    f = r0
    f_dev = jnp.asarray(f)

    res = cg(A, f_dev, M=mg, tol=1e-6, maxiter=iters)
    x_wl = np.asarray(res.x)
    log(f"while_loop CG: {int(res.niter)} iters, rnorm "
        f"{float(res.residual_norm):.3e}")

    mv = jax.jit(lambda a, u: a.matvec(u))
    x = jnp.zeros_like(f_dev)
    r = f_dev - mv(A, x)
    zz = apply_jit(mg, r)
    p = zz
    rz = float(jnp.vdot(r, zz))
    traj = []
    for k in range(iters):
        Ap = mv(A, p)
        pAp = float(jnp.vdot(p, Ap))
        alpha = rz / pAp
        x = x + alpha * p
        r = r - alpha * Ap
        zz = apply_jit(mg, r)
        rz_new = float(jnp.vdot(r, zz))
        beta = rz_new / rz
        p = zz + beta * p
        rz = rz_new
        rn = float(jnp.linalg.norm(r))
        traj.append(rn)
        log(f"  eager it {k + 1}: alpha={alpha:.6e} beta={beta:.6e} "
            f"rnorm={rn:.6e} pAp={pAp:.6e}"
            + ("  WARNING pAp<=0 (indefinite!)" if pAp <= 0 else ""))
    x_e = np.asarray(x)
    d = rel(x_wl, x_e)
    log(f"stage2 while_loop vs eager solution: rel err {d:.2e} "
        f"({'OK' if d < 1e-4 else 'MISMATCH'})")

    # --- energies against the hierarchy's own fp32 operator ------------------
    for tag, u in (("while_loop", x_wl), ("eager", x_e)):
        Ku = np.asarray(mv(A, jnp.asarray(u)))
        en = 0.5 * float(np.vdot(np.float64(1.0) * u, Ku))
        tr = float(np.linalg.norm(f - Ku))
        log(f"{tag}: energy {en:.6e}, true_r {tr:.3e}")
    log("CGPROBE DONE")


if __name__ == "__main__":
    main()
