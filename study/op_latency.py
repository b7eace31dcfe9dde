"""Per-op TPU matmul latency at SEM sizes — data for the preconditioner
dispatch-fusion decision (ROADMAP r4+ #1).

The coupled preconditioner chain at p16 is ~10 sequential large matmuls
(spectral-Schur Zx/Zy transforms, gradient applies, batched velocity FDM);
measured ~2.3 ms total at p16 f32, i.e. ~0.2 ms/matmul, latency-bound
(CLAUDE.md lesson 2).  Candidate fusions trade FLOPs for fewer dispatches:

* stacking ``[Zx; G·Zx]`` so one matmul yields both the Schur solve and its
  gradient (saves 2 of the 10, plus a thin ring correction);
* batching per-field transforms with different matrices per field
  (``einsum('fij,fjk->fik')``).

This script measures, inside ONE jitted program each (matching how the pc
runs inside the Krylov megakernel):

  chain-k   k data-dependent (n,n)@(n,n) matmuls   -> marginal per-op cost
  seq2      two independent (n,n)@(n,n) in sequence
  batch2    the same two as one einsum('fij,fjk->fik')
  stack2    the same two as one (2n,n)@(n,n) stacked matmul
  batch4    four-field einsum (the velocity-FDM shape, fields=2, two sides)

Run on the accelerator: ``python study/op_latency.py [-n 1025] [-dtype f32]``.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORM_NAME"):
    # honor the env override before any backend touch (CLAUDE.md lesson 17)
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORM_NAME"])
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
import numpy as np  # noqa: E402


def timeit(fn, *args, reps=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=1025)
    ap.add_argument("-dtype", default="f32", choices=["f32", "f64", "bf16"])
    ap.add_argument("-reps", type=int, default=50)
    args = ap.parse_args()
    n = args.n
    dt = {"f32": jnp.float32, "f64": jnp.float64, "bf16": jnp.bfloat16}[args.dtype]
    if dt == jnp.float64:
        jax.config.update("jax_enable_x64", True)
    hi = lax.Precision.HIGHEST
    print(f"platform={jax.devices()[0].platform} n={n} dtype={args.dtype}")

    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (n, n), dt) / n
    B = jax.random.normal(jax.random.PRNGKey(1), (n, n), dt) / n
    x = jax.random.normal(jax.random.PRNGKey(2), (n, n), dt)
    y = jax.random.normal(jax.random.PRNGKey(3), (n, n), dt)

    # -- chain-k: marginal cost of one more dependent matmul ----------------
    def chain(k):
        @jax.jit
        def f(A, x):
            def body(i, v):
                return jnp.matmul(A, v, precision=hi)
            return lax.fori_loop(0, k, body, x)
        return f

    results = {}
    for k in (2, 6, 10):
        results[f"chain{k}"] = timeit(chain(k), A, x, reps=args.reps)
    marginal = (results["chain10"] - results["chain2"]) / 8.0
    print(f"chain2={results['chain2']:.3f} ms  chain6={results['chain6']:.3f}"
          f"  chain10={results['chain10']:.3f}  -> marginal/matmul "
          f"{marginal * 1e3:.1f} us")

    # -- two independent products: sequential vs batched vs stacked ---------
    @jax.jit
    def seq2(A, B, x, y):
        u = jnp.matmul(A, x, precision=hi)
        v = jnp.matmul(B, y, precision=hi)
        return u + v  # combine so neither is DCE'd

    Ms = jnp.stack([A, B])
    Xs = jnp.stack([x, y])

    @jax.jit
    def batch2(Ms, Xs):
        uv = jnp.einsum("fij,fjk->fik", Ms, Xs, precision=hi)
        return uv[0] + uv[1]

    AB = jnp.concatenate([A, B], axis=0)  # (2n, n)

    @jax.jit
    def stack2(AB, x):
        uv = jnp.matmul(AB, x, precision=hi)  # same RHS, stacked LHS
        return uv[:n] + uv[n:]

    print(f"seq2   = {timeit(seq2, A, B, x, y, reps=args.reps):.3f} ms "
          f"(two dispatches, independent)")
    print(f"batch2 = {timeit(batch2, Ms, Xs, reps=args.reps):.3f} ms "
          f"(one einsum dispatch, per-field matrices)")
    print(f"stack2 = {timeit(stack2, AB, x, reps=args.reps):.3f} ms "
          f"(one stacked matmul, shared RHS — the [Zx;GZx] shape)")

    # -- four-field batch (velocity-FDM side shape) --------------------------
    M4 = jnp.stack([A, B, A.T, B.T])
    X4 = jnp.stack([x, y, x, y])

    @jax.jit
    def seq4(M4, X4):
        acc = jnp.zeros((n, n), dt)
        for f in range(4):
            acc = acc + jnp.matmul(M4[f], X4[f], precision=hi)
        return acc

    @jax.jit
    def batch4(M4, X4):
        uv = jnp.einsum("fij,fjk->fik", M4, X4, precision=hi)
        return uv.sum(0)

    print(f"seq4   = {timeit(seq4, M4, X4, reps=args.reps):.3f} ms")
    print(f"batch4 = {timeit(batch4, M4, X4, reps=args.reps):.3f} ms")


if __name__ == "__main__":
    main()
