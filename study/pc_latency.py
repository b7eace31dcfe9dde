"""Decompose the p16 coupled-preconditioner cost on the TPU (ROADMAP r4+ #1).

Round-3 profiling attributed ~2.3 ms of the 10.2 ms/it p16 f32 coupled
iteration to the block preconditioner "chain of ~12 sequential matmuls".
study/op_latency.py then measured the marginal cost of a DEPENDENT
(1025,1025) f32 matmul inside one program at ~8-60 us — ten of those is
<0.6 ms, so either the glue (masks, edge slices, elementwise) or the
measurement attribution carries the rest.  This harness settles it on the
real operators:

  * chain-k marginal cost (fori_loop of k dependent applies inside ONE
    jitted program — exactly how the pc runs inside the Krylov megakernel)
    for each pc component at p16 f32:
        schur   spectral-Schur apply (4 big matmuls + ring elimination)
        grads   pressure-gradient pair (2 big matmuls)
        fdm2    batched 2-field velocity FDM (4 batched matmuls)
  * the same for two fusion candidates:
        schur_grads       unfused back-transform + separate gradients
        schur_grads_fused [Zx;G1xZx] x M x [Zy|G1yZy]^T stacked back-
                          transform: dp, gx, gy from TWO matmuls (4x FLOPs
                          on the second) instead of four
  * host-dispatched full `ns._pc32_jit` per-call time and a trivial-program
    dispatch probe, to separate in-program cost from tunnel dispatch.

The replicated Schur apply is parity-checked against the production
``_pc32_jit`` output before timing (rel < 1e-5), so the timings are of the
real algorithm, not a drifted copy.

Usage: python study/pc_latency.py [-reps 30]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

if os.environ.get("JAX_PLATFORM_NAME"):
    # honor the env override before any backend touch (CLAUDE.md lesson 17)
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORM_NAME"])

import jax.numpy as jnp
from jax import lax

from sem_tpu.models.navier_stokes import NavierStokesSolver
from sem_tpu import operators as ops


def timeit(fn, *args, reps=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def chain_marginal(make_body, args, reps=30, k_lo=2, k_hi=10):
    """Marginal in-program cost (ms) of one more dependent apply.

    ``make_body(*args)`` must return a shape-preserving ``body(x)``;
    the probe jits ``fori_loop(0, k, body, x)`` at two depths and
    differences them.  All constants are passed as runtime args (never
    closed over) to keep tunnel executables small.
    """
    def run(k):
        @jax.jit
        def f(*a):
            body = make_body(*a[:-1])
            return lax.fori_loop(0, k, lambda i, v: body(v), a[-1])
        return timeit(f, *args, reps=reps)

    lo, hi = run(k_lo), run(k_hi)
    return (hi - lo) / (k_hi - k_lo), lo, hi


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-reps", type=int, default=30)
    ap.add_argument("-P", type=int, default=16)
    ap.add_argument("-Ne", type=int, default=64)
    args = ap.parse_args()

    t0 = time.perf_counter()
    ns = NavierStokesSolver(1.0, 1.0, Re=1e3, Gr=1e6, P=args.P,
                            N_ex=args.Ne, N_ey=args.Ne, iprint=[])
    print(f"build P={args.P} Ne={args.Ne}: {time.perf_counter() - t0:.1f}s",
          flush=True)
    grid = ns.grid
    N = ns.N
    Ngx, Ngy = grid.Ngx, grid.Ngy
    dt = jnp.float32
    hi = ops.mm_precision(dt)

    spec = ns._spec
    Zx = jnp.asarray(spec["Zx"].astype(dt))
    Zy = jnp.asarray(spec["Zy"].astype(dt))
    esum = spec["esum"]
    scale = float(np.max(np.abs(esum)))
    nz = np.abs(esum) > 1e-14 * scale
    ginv0 = jnp.asarray(
        np.where(nz, spec["ksum"] / np.where(nz, esum, 1.0), 0.0).astype(dt))
    Kbb_inv = jnp.asarray(spec["Kbb_inv"].astype(dt))
    K1e = jnp.asarray(grid.K1x[[0, -1], :].astype(dt))
    K1yTe = jnp.asarray(grid.K1y[[0, -1], :].T.astype(dt))
    m1y = jnp.asarray(grid.m1y.astype(dt))
    m1x = jnp.asarray(grid.m1x.astype(dt))
    m1x_in = m1x[1:-1]
    G1x = jnp.asarray(grid.G1x.astype(dt))
    G1y = jnp.asarray(grid.G1y.astype(dt))
    mb_or_pin = jnp.asarray(ns._mask_bound_np | ns._mask_pin_np)
    pin = jnp.asarray(ns._mask_pin_np)

    def edges_set(Rg, vb):
        Rg = Rg.at[0, :].set(vb[:Ngy]).at[-1, :].set(vb[Ngy:2 * Ngy])
        Rg = Rg.at[1:-1, 0].set(vb[2 * Ngy:2 * Ngy + Ngx - 2])
        return Rg.at[1:-1, -1].set(vb[2 * Ngy + Ngx - 2:])

    def edges_get(Rg):
        return jnp.concatenate([Rg[0, :], Rg[-1, :], Rg[1:-1, 0],
                                Rg[1:-1, -1]])

    zeros_b = jnp.zeros(2 * Ngy + 2 * (Ngx - 2), dt)

    # --- replicated production Schur apply (sigma=0), for parity + timing
    def make_schur(Zx, Zy, ginv0, Kbb_inv, K1e, K1yTe, m1y, m1x_in,
                   mb_or_pin, pin):
        def schur(rp):
            r_int = jnp.where(mb_or_pin, 0.0, rp).reshape(Ngx, Ngy)
            W = jnp.matmul(Zx.T, jnp.matmul(r_int, Zy, precision=hi),
                           precision=hi)
            dp_g = jnp.matmul(Zx, jnp.matmul(ginv0 * W, Zy.T, precision=hi),
                              precision=hi)
            dp_z = edges_set(dp_g, zeros_b)
            zrows = jnp.matmul(K1e, dp_z, precision=hi) * m1y[None, :]
            zcols = jnp.matmul(dp_z[1:-1, :], K1yTe, precision=hi) \
                * m1x_in[:, None]
            zb = jnp.concatenate([zrows[0], zrows[1], zcols[:, 0],
                                  zcols[:, 1]])
            rb = edges_get(rp.reshape(Ngx, Ngy))
            dp_b = jnp.matmul(Kbb_inv, rb - zb, precision=hi)
            dp = edges_set(dp_z, dp_b).reshape(-1)
            return jnp.where(pin, rp, dp)
        return schur

    schur_args = (Zx, Zy, ginv0, Kbb_inv, K1e, K1yTe, m1y, m1x_in,
                  mb_or_pin, pin)

    # --- parity check against the production pc (dp block of pc32) --------
    key = jax.random.PRNGKey(0)
    r3 = jax.random.normal(key, (3 * N,), dt)
    ul = jnp.zeros(N, dt)
    dp_prod = ns._pc32_jit(r3, ul, ul, jnp.asarray(0.0, dt))[2 * N:]
    dp_rep = jax.jit(lambda *a: make_schur(*a[:-1])(a[-1]))(
        *schur_args, r3[2 * N:])
    rel = float(jnp.linalg.norm(dp_rep - dp_prod)
                / jnp.linalg.norm(dp_prod))
    print(f"schur replica parity vs _pc32_jit dp block: rel={rel:.2e}",
          flush=True)
    assert rel < 1e-5, "replicated Schur drifted from production"

    # --- gradient pair -----------------------------------------------------
    def make_grads(G1x, G1y, m1x, m1y, mb_or_pin):
        def grads(dp):
            U = dp.reshape(Ngx, Ngy)
            gx = jnp.matmul(G1x, U, precision=hi) * m1y[None, :]
            gy = jnp.matmul(U, G1y.T, precision=hi) * m1x[:, None]
            out = jnp.where(mb_or_pin.reshape(Ngx, Ngy), 0.0, gx + gy)
            return out.reshape(-1)  # combine: keep shape for chaining
        return grads

    grads_args = (G1x, G1y, m1x, m1y, mb_or_pin)

    # --- batched velocity FDM (sigma traced) -------------------------------
    fdm = ns._fdm
    Zxv = jnp.asarray(fdm._Zx.astype(dt))
    Zyv = jnp.asarray(fdm._Zy.astype(dt))
    lxv = jnp.asarray(fdm._lx.astype(dt))
    lyv = jnp.asarray(fdm._ly.astype(dt))
    x0, x1, y0, y1 = fdm._x0, fdm._x1, fdm._y0, fdm._y1

    def make_fdm2(Zxv, Zyv, lxv, lyv, sigma):
        ginv = 1.0 / (lxv[:, None] + lyv[None, :] + sigma)

        def fdm2(rr):  # (2, N)
            R = rr.reshape(2, Ngx, Ngy)[:, x0:x1, y0:y1]
            W = jnp.einsum("ij,fjk,kl->fil", Zxv.T, R, Zyv, precision=hi)
            U = jnp.einsum("ij,fjk,kl->fil", Zxv, ginv * W, Zyv.T,
                           precision=hi)
            out = jnp.zeros((2, Ngx, Ngy), dt)
            out = out.at[:, x0:x1, y0:y1].set(U)
            return out.reshape(2, N)
        return fdm2

    fdm_args = (Zxv, Zyv, lxv, lyv, jnp.asarray(0.0, dt))

    # --- fusion candidate: stacked back-transform + gradients --------------
    ZxS = jnp.concatenate([Zx, jnp.matmul(G1x, Zx, precision=hi)], axis=0)
    # right side stacked along the OUTPUT axis: M @ [Zy^T | (G1y Zy)^T]
    ZyS = jnp.concatenate([Zy.T, jnp.matmul(G1y, Zy, precision=hi).T],
                          axis=1)  # (ky, 2Ngy)

    def make_sg_unfused(Zx, Zy, ginv0, G1x, G1y, m1x, m1y, mb_or_pin):
        def f(rp):
            r_int = jnp.where(mb_or_pin, 0.0, rp).reshape(Ngx, Ngy)
            W = jnp.matmul(Zx.T, jnp.matmul(r_int, Zy, precision=hi),
                           precision=hi)
            DP = jnp.matmul(Zx, jnp.matmul(ginv0 * W, Zy.T, precision=hi),
                            precision=hi)
            gx = jnp.matmul(G1x, DP, precision=hi) * m1y[None, :]
            gy = jnp.matmul(DP, G1y.T, precision=hi) * m1x[:, None]
            return (DP + gx + gy).reshape(-1)
        return f

    def make_sg_fused(Zx, Zy, ZxS, ZyS, ginv0, m1x, m1y, mb_or_pin):
        def f(rp):
            r_int = jnp.where(mb_or_pin, 0.0, rp).reshape(Ngx, Ngy)
            W = jnp.matmul(Zx.T, jnp.matmul(r_int, Zy, precision=hi),
                           precision=hi)
            B = jnp.matmul(ZxS, jnp.matmul(ginv0 * W, ZyS, precision=hi),
                           precision=hi)  # (2Ngx, 2Ngy): [dp gy; gx .]
            DP = B[:Ngx, :Ngy]
            gy = B[:Ngx, Ngy:] * m1x[:, None]
            gx = B[Ngx:, :Ngy] * m1y[None, :]
            return (DP + gx + gy).reshape(-1)
        return f

    sgu_args = (Zx, Zy, ginv0, G1x, G1y, m1x, m1y, mb_or_pin)
    sgf_args = (Zx, Zy, ZxS, ZyS, ginv0, m1x, m1y, mb_or_pin)

    rp = r3[2 * N:]
    r2 = jnp.stack([r3[:N], r3[N:2 * N]])

    probes = [
        ("schur", make_schur, schur_args, rp),
        ("grads", make_grads, grads_args, rp),
        ("fdm2", make_fdm2, fdm_args, r2),
        ("schur+grads unfused", make_sg_unfused, sgu_args, rp),
        ("schur+grads fused", make_sg_fused, sgf_args, rp),
    ]
    total = 0.0
    for name, mk, cargs, x in probes:
        marg, lo, hi_t = chain_marginal(mk, (*cargs, x), reps=args.reps)
        print(f"{name:24s} marginal {marg * 1e3:7.1f} us/apply "
              f"(chain2 {lo:.3f} ms, chain10 {hi_t:.3f} ms)", flush=True)
        if name in ("schur", "grads", "fdm2"):
            total += marg

    print(f"component sum (schur+grads+fdm2): {total * 1e3:.1f} us/apply",
          flush=True)

    # --- dispatch-included probes ------------------------------------------
    sig = jnp.asarray(0.0, dt)
    t_pc = timeit(lambda: ns._pc32_jit(r3, ul, ul, sig), reps=args.reps)
    triv = jax.jit(lambda x: x + 1.0)
    t_triv = timeit(triv, r3, reps=args.reps)
    print(f"_pc32_jit host-dispatched: {t_pc:.3f} ms/call "
          f"(trivial-program dispatch floor: {t_triv:.3f} ms)", flush=True)


if __name__ == "__main__":
    main()
