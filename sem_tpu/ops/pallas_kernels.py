"""Pallas TPU kernel: fused block-banded SEM system apply.

Computes, in ONE kernel pass, the hot SEM matvec::

    y = (K + coef·(u ∂x + v ∂y)) w
      = (K1x@W)·m1y + m1x·(W@K1yᵀ) + coef·[u∘(G1x@W)·m1y + v∘m1x·(W@G1yᵀ)]

The XLA path (``sem_tpu.operators.apply_system``) does this with two large
dense matmuls; the assembled 1D operators are in fact *block-banded* (band
2P+1 ≤ 129), so ~⅔ of those FLOPs multiply structural zeros.  This kernel

* tiles the grid into 128-row programs,
* contracts only the in-band operator blocks (one (256,384)×(384,C) matmul
  for the x-direction; nb small (128,384)×(384,256) matmuls for the
  y-direction), and
* fuses the mass weights, convection products, and the final combination in
  VMEM — the field is read once from HBM and the result written once.

Zero-padding to 128-multiples makes every out-of-range band contribution
vanish, so no masking is needed.  Numerical parity with the XLA path is
tested in tests/test_pallas.py; ``apply_system_pallas`` falls back to the
XLA path on non-TPU backends (interpret mode is used in tests).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sem_tpu.mesh import Grid2D
from sem_tpu import operators as ops

__all__ = ["apply_system_pallas", "apply_system_best"]

_B = 128  # row/column block size (≥ the 1D operator half-band for P ≤ 63)


@functools.lru_cache(maxsize=None)
def _banded_constants(grid: Grid2D, dtype_name: str):
    """Padded, block-banded forms of the 1D operators (host-side, cached)."""
    dt = np.dtype(dtype_name)
    nbx = -(-grid.Ngx // _B)
    nby = -(-grid.Ngy // _B)
    Cx = (nbx + 2) * _B           # padded rows (one halo block each side)
    Cy = (nby + 2) * _B           # padded cols

    def pad_mat(A, n_out, offset):
        out = np.zeros((n_out, n_out), dt)
        out[offset:offset + A.shape[0], offset:offset + A.shape[1]] = A
        return out

    # x-direction banded blocks: for each row block i (of the unpadded
    # array, living at padded block i+1), keep columns of blocks i-1..i+1
    K1xp = pad_mat(grid.K1x.astype(dt), Cx, _B)
    G1xp = pad_mat(grid.G1x.astype(dt), Cx, _B)
    bx = np.zeros((nbx, 2 * _B, 3 * _B), dt)
    for i in range(nbx):
        r0 = (i + 1) * _B
        c0 = i * _B
        bx[i, :_B] = K1xp[r0:r0 + _B, c0:c0 + 3 * _B]
        bx[i, _B:] = G1xp[r0:r0 + _B, c0:c0 + 3 * _B]

    # y-direction banded blocks of [K1yᵀ, G1yᵀ]: for each col block j, keep
    # rows of blocks j-1..j+1
    K1yTp = pad_mat(grid.K1y.T.astype(dt), Cy, _B)
    G1yTp = pad_mat(grid.G1y.T.astype(dt), Cy, _B)
    by = np.zeros((nby, 3 * _B, 2 * _B), dt)
    for j in range(nby):
        c0 = (j + 1) * _B
        r0 = j * _B
        by[j, :, :_B] = K1yTp[r0:r0 + 3 * _B, c0:c0 + _B]
        by[j, :, _B:] = G1yTp[r0:r0 + 3 * _B, c0:c0 + _B]

    m1x = np.zeros((nbx * _B, 1), dt)
    m1x[:grid.Ngx, 0] = grid.m1x.astype(dt)
    m1y = np.zeros((1, Cy), dt)
    m1y[0, _B:_B + grid.Ngy] = grid.m1y.astype(dt)
    return bx, by, m1x, m1y, nbx, nby, Cx, Cy


def _kernel(nby: int):
    def kernel(wm1_ref, wc_ref, wp1_ref, u_ref, v_ref, bx_ref, by_ref,
               m1x_ref, m1y_ref, coef_ref, out_ref):
        C = wc_ref.shape[1]
        # x-direction: one banded matmul produces K1x- and G1x-rows at once
        wband = jnp.concatenate([wm1_ref[:], wc_ref[:], wp1_ref[:]], axis=0)
        xL = jnp.dot(bx_ref[0], wband,
                     preferred_element_type=wband.dtype,
                     precision=jax.lax.Precision.HIGHEST)   # (2B, C)
        Kx = xL[:_B]
        Gx = xL[_B:]

        # y-direction: banded blocks over the column tiles (concatenate the
        # per-tile results — in-kernel scatter is not lowerable on TPU)
        W = wc_ref[:]
        ys = [jnp.dot(W[:, j * _B:(j + 3) * _B], by_ref[j],
                      preferred_element_type=W.dtype,       # (B, 2B)
                      precision=jax.lax.Precision.HIGHEST)
              for j in range(nby)]
        zleft = jnp.zeros((_B, _B), W.dtype)
        zright = jnp.zeros((_B, C - (nby + 1) * _B), W.dtype)
        Ky = jnp.concatenate([zleft] + [y[:, :_B] for y in ys] + [zright],
                             axis=1)
        Gy = jnp.concatenate([zleft] + [y[:, _B:] for y in ys] + [zright],
                             axis=1)

        m1x = m1x_ref[:]          # (B, 1)
        m1y = m1y_ref[:]          # (1, C)
        coef = coef_ref[0, 0]
        K2d = Kx * m1y + m1x * Ky
        out_ref[:] = K2d + coef * (u_ref[:] * (Gx * m1y)
                                   + v_ref[:] * (m1x * Gy))
    return kernel


@functools.partial(jax.jit, static_argnums=(0, 5))
def apply_system_pallas(grid: Grid2D, u: jax.Array, v: jax.Array,
                        w: jax.Array, coef, interpret: bool = False
                        ) -> jax.Array:
    """Fused ``(K + coef·(u∂x + v∂y)) w`` as a single Pallas kernel.

    Drop-in equivalent of :func:`sem_tpu.operators.apply_system`
    (float32/bfloat16 fields; float64 falls back to the XLA path — f64 is
    software-emulated on the MXU and not supported by Mosaic matmuls).
    """
    if w.dtype == jnp.float64:
        return ops.apply_system(grid, u, v, w, coef)

    dt = w.dtype
    bx, by, m1x, m1y, nbx, nby, Cx, Cy = _banded_constants(grid, dt.name)
    Ngx, Ngy = grid.Ngx, grid.Ngy

    def pad_field(f):
        F = f.reshape(Ngx, Ngy)
        return jnp.pad(F, ((_B, Cx - _B - Ngx), (_B, Cy - _B - Ngy)))

    Wp = pad_field(w)
    Up = pad_field(u.astype(dt))
    Vp = pad_field(v.astype(dt))
    coef_arr = jnp.asarray(coef, dt).reshape(1, 1)

    # index maps must return int32: under jax_enable_x64 integer arithmetic
    # promotes to i64, which Mosaic cannot legalize in block index maps
    i32 = lambda x: jnp.asarray(x, jnp.int32)
    row_spec = lambda off: pl.BlockSpec(
        (_B, Cy), lambda i: (i32(i + off), i32(0)),
        memory_space=pltpu.VMEM)
    # Pallas canonicalizes index-map outputs to the x64 default integer,
    # which Mosaic cannot legalize — trace the kernel with x64 disabled
    # (the fields are f32/bf16; nothing in the kernel needs 64-bit types)
    with jax.enable_x64(False):
            out = pl.pallas_call(
            _kernel(nby),
            grid=(nbx,),
            in_specs=[
                row_spec(0),   # W rows i-1 (padded offset)
                row_spec(1),   # W rows i
                row_spec(2),   # W rows i+1
                row_spec(1),   # u rows i
                row_spec(1),   # v rows i
                pl.BlockSpec((1, 2 * _B, 3 * _B),
                             lambda i: (i32(i), i32(0), i32(0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),          # by (full)
                pl.BlockSpec((_B, 1), lambda i: (i32(i), i32(0)),
                             memory_space=pltpu.VMEM),          # m1x block
                pl.BlockSpec(memory_space=pltpu.VMEM),          # m1y (full)
                pl.BlockSpec(memory_space=pltpu.SMEM),          # coef
            ],
            out_specs=pl.BlockSpec((_B, Cy), lambda i: (i32(i), i32(0)),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nbx * _B, Cy), dt),
                interpret=interpret,
            )(Wp, Wp, Wp, Up, Vp, jnp.asarray(bx), jnp.asarray(by),
          jnp.asarray(m1x), jnp.asarray(m1y), coef_arr)

    return out[:Ngx, _B:_B + Ngy].reshape(-1)


# empirical crossover on v5e: below this the per-program fixed costs of the
# banded kernel exceed the saved matmul work (P=8 32x32 = 66k: XLA wins;
# p=16 64x64 = 1.05M: Pallas is ~1.8x faster)
_PALLAS_MIN_N = 300_000


def apply_system_best(grid: Grid2D, u, v, w, coef):
    """Dispatch the fused system apply to the faster backend for the size:
    the Pallas block-banded kernel for large f32/bf16 grids on TPU, the XLA
    two-matmul path otherwise."""
    if (w.dtype != jnp.float64 and grid.N >= _PALLAS_MIN_N
            and jax.default_backend() == "tpu"):
        return apply_system_pallas(grid, u, v, w, coef)
    return ops.apply_system(grid, u, v, w, coef)
