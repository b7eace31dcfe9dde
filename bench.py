"""Benchmark: SEM operator-apply throughput (GDOF/s per chip).

The headline metric of BASELINE.json: sustained application rate of the hot
SEM operator — the convection-diffusion system matvec ``(K + Pe·conv)u`` that
sits inside every Krylov iteration — at the north-star configuration
p=16, 64×64 elements (N = 1,050,625 DOF), float32, on one chip.

``vs_baseline``: the reference applies the same operator as a SciPy CSR
matvec on the host (reference ConvectionDiffusion_Solver.py:87); since the
reference publishes no numbers (BASELINE.md), the baseline is a **pinned,
dated constant** stored under the ``"csr_pinned"`` key of BASELINE.json —
the same operator assembled to CSR and applied on this machine's CPU at a
comparable configuration (p=8, 32×32; the CSR at p=16/64×64 would need
~343M nonzeros), measured best-of-N on a quiet host via
``python bench.py --pin-csr``.  Re-measuring the shared noisy host per
bench run made the ratio swing 31–86 between runs (round-2 VERDICT #8);
the pinned constant makes it stable.  The ratio's config (p8 32×32) is
reported separately from the headline (p16 64×64) value.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import datetime
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) or ".")

from sem_tpu import operators as ops
from sem_tpu.mesh import Grid2D
from sem_tpu.ops import apply_system_best

_BASELINE_JSON = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BASELINE.json")


def device_apply_rate(grid: Grid2D, dtype, iters: int, pe: float = 40.0):
    """Sustained BARE (K + Pe·conv) apply rate in GDOF/s.

    The timed region contains only the chained operator applies: the chain
    ``x ← c·(A x)`` uses a *constant* scalar ``c ≈ 1/ρ(A)`` (estimated from
    three power steps outside the timed region) to keep magnitudes bounded;
    the multiply fuses into the apply's own padding/copy pass under jit, so
    no norm, reduction, or extra memory pass is timed (round-2 VERDICT #8:
    the old normalized power iteration understated the raw apply ~45%).
    """
    u = jnp.asarray(np.random.default_rng(0).standard_normal(grid.N), dtype)
    v = jnp.asarray(np.random.default_rng(1).standard_normal(grid.N), dtype)
    pe = jnp.asarray(pe, dtype)

    # spectral-radius estimate (outside the timed region)
    x = u / jnp.linalg.norm(u)
    for _ in range(3):
        y = apply_system_best(grid, u, v, x, pe)
        lam = float(jnp.linalg.norm(y))
        x = y / lam
    c = 1.0 / lam  # Python float: baked into the compiled program

    @jax.jit
    def many(x):
        def body(_, x):
            return c * apply_system_best(grid, u, v, x, pe)
        return lax.fori_loop(0, iters, body, x)

    jax.block_until_ready(many(x))  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(many(x))
    dt = time.perf_counter() - t0
    return grid.N * iters / dt / 1e9, dt


def csr_apply_rate(grid: Grid2D, iters: int, pe: float = 40.0,
                   repeats: int = 3):
    """The reference-architecture baseline: assembled CSR matvec on host CPU."""
    import scipy.sparse as sp
    P = grid.P
    rng = np.random.default_rng(0)
    # assemble (K + Pe*conv(u,v)) elementwise into CSR via the local->global map
    K_s, M_w, D = grid.basis.K, grid.basis.weights, grid.basis.D
    wq = grid.wq2d
    u_e = np.asarray(ops.gather(grid, jnp.asarray(
        rng.standard_normal(grid.N))))
    v_e = np.asarray(ops.gather(grid, jnp.asarray(
        np.random.default_rng(1).standard_normal(grid.N))))
    P1 = P + 1
    # element matrix A_e[i,j,k,l] = stiffness + convection
    I = np.eye(P1)
    Kx = (2 / grid.dx) * K_s
    Ky = (2 / grid.dy) * K_s
    mx = grid.dx / 2 * M_w
    my = grid.dy / 2 * M_w
    stiff = (np.einsum("ik,jl,j->ijkl", Kx, I, my)
             + np.einsum("ik,jl,i->ijkl", I, Ky, mx))
    rows, cols, vals = [], [], []
    gidx = grid.gidx.reshape(grid.N_e, P1, P1)
    for e in range(grid.N_e):
        conv = (pe * wq * (grid.dy / 2 * u_e[e]))[:, :, None, None] \
            * D[:, None, :, None] * I[None, :, None, :] \
            + (pe * wq * (grid.dx / 2 * v_e[e]))[:, :, None, None] \
            * I[:, None, :, None] * D[None, :, None, :]
        A_e = stiff + conv
        g = gidx[e]
        rows.append(np.broadcast_to(g[:, :, None, None], A_e.shape).ravel())
        cols.append(np.broadcast_to(g[None, None, :, :], A_e.shape).ravel())
        vals.append(A_e.ravel())
    A = sp.coo_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(grid.N, grid.N)).tocsr()
    x = np.random.default_rng(2).standard_normal(grid.N)
    A @ x  # warm
    best = float("inf")
    for _ in range(repeats):  # best-of-N: the host CPU is shared and noisy
        t0 = time.perf_counter()
        xx = x
        for _ in range(iters):
            y = A @ xx
            xx = y / np.linalg.norm(y)
        best = min(best, time.perf_counter() - t0)
    return grid.N * iters / best / 1e9, A


def coupled_solve_wall(P=8, N_e=16):
    """End-to-end coupled Boussinesq JNK solve wall-clock (the north star is
    a solve time, not an apply rate): de Vahl Davis config at a fixed
    mid-size grid, solved from zero to coupled rms 1e-9 (the reference
    example's tolerance, reference Boussinesq_SequentialCoupler.py:15-17).
    Returns (wall seconds of the solve, u_max·Re·Pr accuracy anchor)."""
    from sem_tpu.coupling import build_coupled
    from sem_tpu.coupling.mda import CoupledState

    cd, ns, mda = build_coupled(1.0, 1.0, Re=1e3, Ra=1e3, Pr=0.71,
                                P_cd=P, N_ex_cd=N_e // 2, N_ey_cd=N_e // 2,
                                P_ns=P, N_ex_ns=N_e, N_ey_ns=N_e,
                                mode="JNK", iprint=False)
    s = mda.solve()  # includes compile; re-solve below is the measured one
    mda.cd_comp.iter_count_solve = mda.ns_comp.iter_count_solve = 0
    t0 = time.perf_counter()
    s = mda.solve()
    wall = time.perf_counter() - t0
    u_anchor = float(jnp.max(jnp.abs(s.u))) * 1e3 * 0.71
    return wall, u_anchor


_CMP_CONFIG = dict(P=8, N_ex=32, N_ey=32)  # ratio config (CSR-feasible)


def pin_csr_baseline(repeats: int = 10):
    """Measure the CSR baseline best-of-N on a (hopefully quiet) host and
    persist it as the pinned ``"csr_pinned"`` entry of BASELINE.json."""
    cmp_grid = Grid2D(L_x=1.0, L_y=1.0, **_CMP_CONFIG)
    rate, _ = csr_apply_rate(cmp_grid, iters=30, repeats=repeats)
    with open(_BASELINE_JSON) as f:
        data = json.load(f)
    data["csr_pinned"] = {
        "config": "p8_32x32_f64_csr_host",
        "gdof_s": round(rate, 4),
        "best_of": repeats,
        "date": datetime.date.today().isoformat(),
        "note": ("reference-architecture baseline: assembled CSR matvec of "
                 "(K + Pe*conv) on this machine's host CPU (reference "
                 "ConvectionDiffusion_Solver.py:87); pinned so bench runs "
                 "do not fold host contention into vs_baseline"),
    }
    with open(_BASELINE_JSON, "w") as f:
        json.dump(data, f, indent=2)
        f.write("\n")
    print(f"pinned CSR baseline: {rate:.4f} GDOF/s (best of {repeats})")
    return rate


def _guard_backend_init(timeout_s: float = 600.0):
    """Bound the accelerator-backend initialization.

    ``jax.devices()`` over the tunnel-attached accelerator hangs
    indefinitely while the remote worker pool is down (observed: >90 min
    after a worker crash).  The driver expects ONE JSON line from this
    script, so a down backend must produce an error line, not a hang.
    The guard covers ONLY backend init — first compiles may legitimately
    take minutes and are not bounded."""
    import threading

    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            print(json.dumps({
                "metric": "sem_operator_apply_p16_64x64_f32",
                "value": 0.0, "unit": "GDOF/s", "vs_baseline": 0.0,
                "error": f"accelerator backend init exceeded "
                         f"{timeout_s:.0f}s (tunnel down?)",
            }), flush=True)
            os._exit(3)

    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    jax.devices()
    done.set()


def main():
    dtype = jnp.float32
    _guard_backend_init()

    # reference-architecture baseline: the pinned, dated constant (measure
    # with --pin-csr); only measured inline as a fallback if never pinned
    with open(_BASELINE_JSON) as f:
        pinned = json.load(f).get("csr_pinned")
    if pinned is not None:
        csr_rate = float(pinned["gdof_s"])
    else:
        cmp_grid = Grid2D(L_x=1.0, L_y=1.0, **_CMP_CONFIG)
        csr_rate, _ = csr_apply_rate(cmp_grid, iters=30)

    # device side of the ratio at the same (CSR-feasible) configuration
    cmp_grid = Grid2D(L_x=1.0, L_y=1.0, **_CMP_CONFIG)
    dev_rate_cmp = max(device_apply_rate(cmp_grid, dtype, iters=200)[0]
                       for _ in range(3))
    vs_baseline = dev_rate_cmp / csr_rate

    # headline: bare apply rate at the north-star configuration (best of 3)
    big = Grid2D(P=16, N_ex=64, N_ey=64, L_x=1.0, L_y=1.0)
    value = max(device_apply_rate(big, dtype, iters=100)[0]
                for _ in range(3))

    # second metric (VERDICT r1 #4): end-to-end coupled-solve wall-clock
    solve_wall, u_anchor = coupled_solve_wall()

    print(json.dumps({
        "metric": "sem_operator_apply_p16_64x64_f32",
        "value": round(value, 3),
        "unit": "GDOF/s",
        # ratio vs the reference architecture, at the CSR-feasible p8 32x32
        # config: device apply rate there / pinned host-CSR rate
        "vs_baseline": round(vs_baseline, 2),
        "vs_baseline_config": "p8_32x32 (device f32 vs pinned host CSR)",
        "device_apply_p8_32x32_gdof_s": round(dev_rate_cmp, 3),
        "csr_pinned_gdof_s": round(csr_rate, 4),
        "coupled_solve_p8_16x16_s": round(solve_wall, 2),
        "coupled_solve_u_anchor": round(u_anchor, 4),
    }), flush=True)  # flush: the TPU plugin can hard-exit the process at
    #                  teardown, discarding block-buffered stdout


if __name__ == "__main__":
    if "--pin-csr" in sys.argv:
        pin_csr_baseline()
    else:
        main()
