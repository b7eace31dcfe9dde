"""North-star measurement: coupled Boussinesq p16 64×64 to rms 1e-8.

Reproduces the BASELINE.md headline on one chip: builds the p-continuation
ladder (P4 → P8 → P16 at fixed 64×64 NS / 32×32 CD elements), runs it once
to compile, then reports the cached solve wall-clock and the de Vahl Davis
velocity anchor.  Target (BASELINE.json): < 10 s to 1e-8 rms on one v5e.

Usage:  python study/north_star.py [--direct] [--ttfs] [--short]
        --short  use the two-level P4 -> P16 ladder (skips P8: one fewer
        set of per-process program loads; the P16 level may pay 1-2 Newton
        iterations instead of 0)
        --direct additionally times the single-level p16 solve for the
        continuation-speedup comparison (~1.5-2 min extra)
        --ttfs   times the user-facing end-to-end path instead: ONE
        ``solve_continued`` call including all solver construction
        (build work overlaps the coarse solves in a worker thread;
        eigendecompositions and spectral constants disk-cached), i.e.
        time-to-first-solution of a warm process (VERDICT r2 #5 target:
        < 15 s total)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

if os.environ.get("JAX_PLATFORM_NAME"):
    # make JAX_PLATFORM_NAME authoritative: the accelerator plugin exports
    # JAX_PLATFORMS globally, which would otherwise override it
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORM_NAME"])

import jax.numpy as jnp

from sem_tpu.coupling.boussinesq import build_coupled
from sem_tpu.coupling.mda import CoupledState
from sem_tpu.interp import apply_transfer

KW = dict(Re=1e3, Ra=1e3, Pr=0.71,
          N_ex_cd=32, N_ey_cd=32, N_ex_ns=64, N_ey_ns=64,
          mode="JNK", mtol_nonlin=1e-8, iprint=False)


LADDER = (4, 16) if "--short" in sys.argv else (4, 8, 16)


def build_levels():
    levels = {}
    for P in LADDER:
        t0 = time.perf_counter()
        levels[P] = build_coupled(1.0, 1.0, P_cd=P, P_ns=P, **KW)
        print(f"build P={P}: {time.perf_counter() - t0:.1f}s", flush=True)
    return levels


def ladder(levels):
    s = None
    prev = None
    for P in LADDER:
        cd, ns, mda = levels[P]
        mda.cd_comp.iter_count_solve = mda.ns_comp.iter_count_solve = 0
        if s is not None:
            cd0, ns0 = prev
            s = CoupledState(T=apply_transfer(cd0.grid, cd.grid, s.T),
                             u=apply_transfer(ns0.grid, ns.grid, s.u),
                             v=apply_transfer(ns0.grid, ns.grid, s.v),
                             p=apply_transfer(ns0.grid, ns.grid, s.p))
        t0 = time.perf_counter()
        s = mda.solve(s)
        print(f"  level P={P}: {time.perf_counter() - t0:.1f}s "
              f"stats={mda.stats.as_list()}", flush=True)
        prev = (cd, ns)
    return s, mda


def main():
    if "--ttfs" in sys.argv:
        from sem_tpu.coupling.boussinesq import solve_continued
        # --ttfs --direct: single-level "ladder" — the round-5 warmer
        # attribution showed the COARSE level's program set dominates TTFS
        # (P4 level 360 s vs P16 level 5.3 s warm-started); a direct p16
        # solve pays ONE program set + [15,14,3] Newton from zero
        lad = ([(16, 16)] if "--direct" in sys.argv
               else [(P, P) for P in LADDER])
        t0 = time.perf_counter()
        cd, ns, mda, s = solve_continued(1.0, 1.0, ladder=lad, P_cd=16,
                                         P_ns=16, timing=True, **KW)
        wall = time.perf_counter() - t0
        from sem_tpu.utils import prefetch
        print(f"  [ttfs] prefetch stats: {prefetch.stats()}", flush=True)
        u_anchor = float(jnp.max(jnp.abs(s.u))) * 1e3 * 0.71
        r = mda._residuals(s)
        print(f"TTFS: end-to-end p16 64x64 build+solve {wall:.1f}s "
              f"(target <15 s warm); u_max*RePr = {u_anchor:.4f}; "
              f"|r| = {float(np.linalg.norm(r)):.2e} "
              f"<= atol {mda.atol_nonlin:.2e}", flush=True)
        return

    levels = build_levels()
    t0 = time.perf_counter()
    s, _ = ladder(levels)
    print(f"solve 1 (incl compile): {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    s, mda = ladder(levels)
    wall = time.perf_counter() - t0
    u_anchor = float(jnp.max(jnp.abs(s.u))) * 1e3 * 0.71
    r = mda._residuals(s)
    print(f"NORTH STAR: cached coupled p16 64x64 solve {wall:.1f}s "
          f"(target <10 s); u_max*RePr = {u_anchor:.4f} "
          f"(de Vahl Davis: 3.649); |r| = {float(np.linalg.norm(r)):.2e} "
          f"<= atol {mda.atol_nonlin:.2e}", flush=True)

    if "--direct" in sys.argv:
        cd, ns, mda = levels[16]
        t0 = time.perf_counter()
        mda.solve()
        print(f"direct p16 (no continuation): {time.perf_counter()-t0:.1f}s "
              f"stats={mda.stats.as_list()}", flush=True)
        # second in-process solve: programs warm, separates host-FGMRES
        # orchestration cost from compile/load of the p16-sized programs
        t0 = time.perf_counter()
        mda.solve()
        print(f"direct p16 (cached): {time.perf_counter()-t0:.1f}s "
              f"stats={mda.stats.as_list()}", flush=True)


if __name__ == "__main__":
    main()
