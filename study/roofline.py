"""Roofline attribution for the headline SEM operator apply (VERDICT r4 #6).

Answers, with measured machine ceilings rather than datasheet numbers,
whether the ~2.4-2.5 GDOF/s p16 64×64 f32 apply (bench.py headline) is at
its hardware bound or leaving a factor on the table:

1. counts the FLOPs the banded Pallas kernel actually issues and the HBM
   bytes it actually moves (from the kernel's own tiling parameters in
   ``sem_tpu/ops/pallas_kernels.py`` — block size B=128, one x-direction
   (2B,3B)x(3B,C) matmul + nby (B,3B)x(3B,2B) y-direction matmuls per row
   program, three W row reads + u + v + banded constants in, one row out);
2. measures this chip's sustained HBM copy bandwidth and f32-HIGHEST /
   bf16 matmul throughput with the same fori-chain harness bench.py uses;
3. measures the bare apply (chained, constant-scaled — identical to the
   bench timed region) and attributes it: time at the bandwidth bound,
   time at the matmul bound, and the latency / non-overlap remainder.

Prints a human table plus ONE final JSON line for records.

Usage: python study/roofline.py [--iters 100]
"""
import argparse
import json
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
from sem_tpu.ops import apply_system_best
from sem_tpu.ops.pallas_kernels import _B


def _timed_chain(f, x, iters):
    """Wall time of ``iters`` chained applications of ``f`` under one jit
    (the bench.py harness shape: no per-iteration dispatch or readback)."""
    @jax.jit
    def many(x):
        return lax.fori_loop(0, iters, lambda _, x: f(x), x)

    jax.block_until_ready(many(x))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(many(x))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def measure_hbm_bw(mb=1024, reps=8):
    """Sustained HBM read+write bandwidth (GB/s) of a streaming pass
    ``y = x*c + d`` over a buffer far beyond VMEM.

    Timed as SINGLE dispatches (min over reps), NOT the fori chain: XLA
    fuses a chained elementwise loop into one tile-resident kernel (the
    whole chain reads/writes HBM once), which inflated the first
    measurement ~3 orders of magnitude.  At 1 GiB per pass the ~0.3 ms
    dispatch floor biases the result < ~15% low."""
    n = mb * 1024 * 1024 // 4
    x = jnp.ones(n, jnp.float32) * 1e-3
    f = jax.jit(lambda x: x * 1.0000001 + 1e-12)
    jax.block_until_ready(f(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        best = min(best, time.perf_counter() - t0)
    return 2 * n * 4 / best / 1e9, best


def measure_matmul_tf(k=4096, iters=30, dtype=jnp.float32,
                      precision=lax.Precision.HIGHEST):
    """Sustained square-matmul throughput (TFLOP/s) at the precision the
    kernel uses for f32 inputs (HIGHEST = 6-pass bf16 emulation on TPU)."""
    a = jnp.asarray(np.random.default_rng(1).standard_normal((k, k)), dtype)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((k, k)), dtype)
    c = jnp.asarray(1e-3, dtype)

    def f(x):
        return c * jnp.dot(a, x, precision=precision,
                           preferred_element_type=jnp.float32).astype(dtype)

    t = _timed_chain(f, x, iters)
    return 2 * k**3 / t / 1e12, t


def kernel_counts(grid: Grid2D, dtype_bytes=4):
    """(FLOPs, HBM bytes) per apply, from the Pallas kernel's own tiling.

    FLOPs are the ones ISSUED (dense in-band blocks of the 64-STAGGERED
    tiling: a (2B,2B) x-block and nby (2B,2B) y-blocks per row program;
    ~(2P+1)/(2B) of each block's rows/cols act on structural zeros — that
    inefficiency is the price of MXU shape) plus the elementwise
    combination.  Bytes assume each block-spec operand is fetched once per
    program (no inter-program reuse — the conservative model) plus the
    jit-level pad/unpad/scale passes around the kernel.
    """
    nbx = -(-grid.Ngx // _B)
    nby = -(-grid.Ngy // _B)
    C = nby * _B                                  # output-aligned width
    # per row program
    mm_x = 2 * (2 * _B) * (2 * _B) * C            # (2B,2B)x(2B,C)
    mm_y = nby * 2 * _B * (2 * _B) * (2 * _B)     # nby (B,2B)x(2B,2B)
    ew = 10 * _B * C                               # K2d/conv combination
    flops = nbx * (mm_x + mm_y + ew)
    # per row program HBM: 2 W1 row blocks + 1 W2 row (C+B wide) + u + v
    # rows + bx block + by full + m1x + m1y in, one row block out
    by_bytes = nby * 2 * _B * 2 * _B * dtype_bytes
    per_prog = (4 * _B * C + _B * (C + _B) + 2 * _B * 2 * _B
                + _B + C + _B * C) * dtype_bytes + by_bytes
    kernel_bytes = nbx * per_prog
    # jit-level passes around the kernel (per apply, in the fori chain):
    # pad W twice (read N, write W1 + W2), unpad+scale (read padded row
    # range, write N); u/v pads are loop-invariant and hoisted by XLA
    N = grid.N
    pad_bytes = (2 * N + (nbx + 1) * _B * C + nbx * _B * (C + _B)
                 + nbx * _B * C + N) * dtype_bytes
    return flops, kernel_bytes + pad_bytes, dict(
        nbx=nbx, nby=nby, C=C, mm_x=mm_x, mm_y=mm_y,
        kernel_bytes=kernel_bytes, pad_bytes=pad_bytes)


def measure_apply(grid: Grid2D, iters=100, pe=40.0):
    """Bare chained apply seconds/apply — bench.py's timed region."""
    dtype = jnp.float32
    u = jnp.asarray(np.random.default_rng(0).standard_normal(grid.N), dtype)
    v = jnp.asarray(np.random.default_rng(1).standard_normal(grid.N), dtype)
    pe_a = jnp.asarray(pe, dtype)
    x = u / jnp.linalg.norm(u)
    for _ in range(3):
        y = apply_system_best(grid, u, v, x, pe_a)
        lam = float(jnp.linalg.norm(y))
        x = y / lam
    c = 1.0 / lam
    return _timed_chain(lambda x: c * apply_system_best(grid, u, v, x, pe_a),
                        x, iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    grid = Grid2D(P=16, N_ex=64, N_ey=64, L_x=1.0, L_y=1.0)
    flops, bytes_, detail = kernel_counts(grid)

    print("== machine ceilings (measured, same fori-chain harness) ==",
          flush=True)
    bw, t_bw = measure_hbm_bw()
    print(f"HBM stream bandwidth:      {bw:8.1f} GB/s", flush=True)
    tf32, _ = measure_matmul_tf(dtype=jnp.float32)
    print(f"f32 HIGHEST matmul:        {tf32:8.1f} TFLOP/s (4096^3)",
          flush=True)
    tfbf, _ = measure_matmul_tf(dtype=jnp.bfloat16,
                                precision=lax.Precision.DEFAULT)
    print(f"bf16 matmul:               {tfbf:8.1f} TFLOP/s (4096^3)",
          flush=True)

    print("== kernel model (p16 64x64, f32) ==", flush=True)
    print(f"issued FLOPs / apply:      {flops / 1e9:8.3f} GFLOP "
          f"(x-matmul {detail['nbx'] * detail['mm_x'] / 1e9:.2f}, "
          f"y-matmuls {detail['nbx'] * detail['mm_y'] / 1e9:.2f})",
          flush=True)
    print(f"HBM bytes / apply:         {bytes_ / 1e6:8.1f} MB "
          f"(kernel {detail['kernel_bytes'] / 1e6:.1f} + pad/unpad "
          f"{detail['pad_bytes'] / 1e6:.1f})", flush=True)

    t_flop = flops / (tf32 * 1e12)
    t_band = bytes_ / (bw * 1e9)
    bound = max(t_flop, t_band)
    which = "matmul" if t_flop > t_band else "bandwidth"

    t_apply = measure_apply(grid, iters=args.iters)
    gdof = grid.N / t_apply / 1e9
    print("== verdict ==", flush=True)
    print(f"measured apply:            {t_apply * 1e6:8.1f} us "
          f"({gdof:.3f} GDOF/s)", flush=True)
    print(f"time at matmul ceiling:    {t_flop * 1e6:8.1f} us", flush=True)
    print(f"time at bandwidth ceiling: {t_band * 1e6:8.1f} us", flush=True)
    print(f"roofline bound ({which}):  {bound * 1e6:8.1f} us  ->  "
          f"apply runs at {bound / t_apply * 100:.0f}% of it "
          f"({t_apply / bound:.2f}x off)", flush=True)

    print(json.dumps(dict(
        apply_us=round(t_apply * 1e6, 1), gdof_s=round(gdof, 3),
        flops_g=round(flops / 1e9, 3), bytes_mb=round(bytes_ / 1e6, 1),
        hbm_gb_s=round(bw, 1), f32_highest_tf=round(tf32, 2),
        bf16_tf=round(tfbf, 2), bound=which,
        bound_us=round(bound * 1e6, 1),
        frac_of_bound=round(bound / t_apply, 3))), flush=True)


if __name__ == "__main__":
    main()
