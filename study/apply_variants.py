"""Head-to-head timing of the fused-apply variants (VERDICT r4 #6 follow-up).

study/roofline.py (round 5) concluded the staggered banded Pallas kernel is
ISSUE-bound: ~10 small sequential MXU matmuls per row-block program (~80 per
apply at p16 64×64; the 2D-tiled coupled kernel ~432).  This harness times,
on the local accelerator with bench.py's fori-chain methodology (only the
chained applies in the timed region):

* the dense two-matmul XLA apply (``operators.apply_system``),
* the staggered banded Pallas kernel (``apply_system_pallas``),
* the field-batched einsum banded XLA apply (``apply_system_banded_xla``),

and the coupled saddle matvec pair (Pallas 2D-tiled vs batched einsum).

Usage: python study/apply_variants.py [-P 16] [-Ne 64] [-iters 200]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

if os.environ.get("JAX_PLATFORM_NAME"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORM_NAME"])

import jax.numpy as jnp
from jax import lax

from sem_tpu.mesh import Grid2D
from sem_tpu import operators as ops
from sem_tpu.ops.pallas_kernels import (apply_system_pallas,
                                        apply_system_banded_xla,
                                        apply_coupled_system_pallas,
                                        apply_coupled_system_banded_xla)


def _flag(name, default, cast=float):
    args = sys.argv
    if name in args:
        return cast(args[args.index(name) + 1])
    return default


def time_chain(apply_fn, x0, iters):
    """bench.py methodology: c·A x chain, constant c, nothing else timed."""
    x = x0 / jnp.linalg.norm(x0)
    for _ in range(3):
        y = apply_fn(x)
        lam = float(jnp.linalg.norm(y))
        x = y / lam
    c = 1.0 / lam

    @jax.jit
    def many(x):
        def body(_, x):
            return c * apply_fn(x)
        return lax.fori_loop(0, iters, body, x)

    jax.block_until_ready(many(x))
    t0 = time.perf_counter()
    out = jax.block_until_ready(many(x))
    dt = time.perf_counter() - t0
    return dt / iters, out


def main():
    P = _flag("-P", 16, int)
    Ne = _flag("-Ne", 64, int)
    iters = _flag("-iters", 200, int)
    grid = Grid2D(P=P, N_ex=Ne, N_ey=Ne, L_x=1.0, L_y=1.0)
    N = grid.N
    f32 = jnp.float32
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(N), f32)
    v = jnp.asarray(rng.standard_normal(N), f32)
    w = jnp.asarray(rng.standard_normal(N), f32)
    pe = f32(40.0)
    print(f"grid p{P} {Ne}x{Ne}  N={N}  iters={iters}  "
          f"backend={jax.default_backend()}", flush=True)

    interp = jax.default_backend() != "tpu"   # CPU smoke runs
    variants = {
        "dense-xla": lambda x: ops.apply_system(grid, u, v, x, pe),
        "pallas-banded": lambda x: apply_system_pallas(grid, u, v, x, pe,
                                                       interp),
        "einsum-banded": lambda x: apply_system_banded_xla(grid, u, v, x,
                                                           pe),
    }
    ref = None
    for name, fn in variants.items():
        dt, out = time_chain(fn, w, iters)
        gdofs = N / dt / 1e9
        if ref is None:
            ref = dt
        print(f"  apply {name:>14}: {dt * 1e6:8.1f} us/apply  "
              f"{gdofs:6.3f} GDOF/s  ({ref / dt:4.2f}x dense)", flush=True)

    # coupled saddle matvec (3N fields)
    q = jnp.asarray(rng.standard_normal(3 * N), f32)
    jac = tuple(jnp.asarray(rng.standard_normal(N), f32) for _ in range(4))
    mb_np = np.zeros(N, bool)
    mb_np[:grid.Ngx] = True
    mb = jnp.asarray(mb_np)
    coupled = {
        "pallas-2dtile": lambda x: apply_coupled_system_pallas(
            grid, x, u, v, jac, mb, pe, interp),
        "einsum-banded": lambda x: apply_coupled_system_banded_xla(
            grid, x, u, v, jac, mb, pe),
    }
    ref = None
    for name, fn in coupled.items():
        dt, out = time_chain(fn, q, iters)
        if ref is None:
            ref = dt
        print(f"  coupled {name:>12}: {dt * 1e6:8.1f} us/apply  "
              f"({ref / dt:4.2f}x pallas)", flush=True)


if __name__ == "__main__":
    main()
