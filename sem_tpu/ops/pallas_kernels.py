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

__all__ = ["apply_system_pallas", "apply_system_best",
           "apply_coupled_system_pallas",
           "apply_system_pallas_sharded",
           "apply_coupled_system_pallas_sharded",
           "sharded_pallas_mesh"]

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
        # accumulate in f32 always (Mosaic requires 32-bit matmul
        # accumulators); HIGHEST precision is an f32-input technique —
        # bf16 inputs use the native bf16-multiply/f32-accumulate mode
        prec = (jax.lax.Precision.HIGHEST if wband.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        xL = jnp.dot(bx_ref[0], wband,
                     preferred_element_type=jnp.float32,
                     precision=prec)                        # (2B, C)
        Kx = xL[:_B]
        Gx = xL[_B:]

        # y-direction: banded blocks over the column tiles (concatenate the
        # per-tile results — in-kernel scatter is not lowerable on TPU)
        W = wc_ref[:]
        ys = [jnp.dot(W[:, j * _B:(j + 3) * _B], by_ref[j],
                      preferred_element_type=jnp.float32,   # (B, 2B)
                      precision=prec)
              for j in range(nby)]
        zleft = jnp.zeros((_B, _B), jnp.float32)
        zright = jnp.zeros((_B, C - (nby + 1) * _B), jnp.float32)
        Ky = jnp.concatenate([zleft] + [y[:, :_B] for y in ys] + [zright],
                             axis=1)
        Gy = jnp.concatenate([zleft] + [y[:, _B:] for y in ys] + [zright],
                             axis=1)

        m1x = m1x_ref[:]          # (B, 1)
        m1y = m1y_ref[:]          # (1, C)
        coef = coef_ref[0, 0]
        K2d = Kx * m1y + m1x * Ky
        out_ref[:] = (K2d + coef * (u_ref[:] * (Gx * m1y)
                                    + v_ref[:] * (m1x * Gy))
                      ).astype(out_ref.dtype)
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


def _coupled_kernel():
    """Fused coupled (du, dv, dp) saddle matvec: the NS solver's hot
    operator (NavierStokesSolver._coupled_ops.mv — the tangent residual
    rows of reference NavierStokes_Solver.py:138-160) in ONE kernel pass.

    2D-tiled: each (i, j) program computes one (B, B) output tile of all
    three residual fields from the (3B, B) row band and (B, 3B) column band
    of each input field — all six banded 1D operator products, the
    mass-weighted combinations, the convection and Jacobian-diagonal terms,
    and the Dirichlet/∂ₙp=0 row masking happen in VMEM on ~(B, B) tiles
    (the 1D-row-tiled variant held (B, 3·Cy) strips and ran out of scoped
    VMEM at p16 64×64).
    """
    def kernel(um1_ref, uc_ref, up1_ref, ujm_ref, ujp_ref,
               vm1_ref, vc_ref, vp1_ref, vjm_ref, vjp_ref,
               pm1_ref, pc_ref, pp1_ref, pjm_ref, pjp_ref,
               ul_ref, vl_ref, jxx_ref, jxy_ref, jyx_ref, jyy_ref, mb_ref,
               bx_ref, by_ref, m1x_ref, m1y_ref, coef_ref,
               dru_ref, drv_ref, drc_ref):
        m1x = m1x_ref[:]          # (B, 1)
        m1y = m1y_ref[:]          # (1, B)
        coef = coef_ref[0, 0]
        hi = (jax.lax.Precision.HIGHEST if uc_ref.dtype == jnp.float32
              else jax.lax.Precision.DEFAULT)

        def field_parts(rm1, rc, rp1, rjm, rjp):
            wcol = jnp.concatenate([rm1[:], rc[:], rp1[:]], axis=0)  # (3B,B)
            # f32 accumulation (Mosaic requires 32-bit matmul accumulators)
            xL = jnp.dot(bx_ref[0], wcol,
                         preferred_element_type=jnp.float32,
                         precision=hi)                               # (2B,B)
            wrow = jnp.concatenate([rjm[:], rc[:], rjp[:]], axis=1)  # (B,3B)
            yR = jnp.dot(wrow, by_ref[0, 0],
                         preferred_element_type=jnp.float32,
                         precision=hi)                               # (B,2B)
            Kx, Gx = xL[:_B], xL[_B:]
            Ky, Gy = yR[:, :_B], yR[:, _B:]
            return Kx * m1y + m1x * Ky, Gx * m1y, m1x * Gy

        Ku, gxu, gyu = field_parts(um1_ref, uc_ref, up1_ref, ujm_ref,
                                   ujp_ref)
        Kv, gxv, gyv = field_parts(vm1_ref, vc_ref, vp1_ref, vjm_ref,
                                   vjp_ref)
        Kp, gxp, gyp = field_parts(pm1_ref, pc_ref, pp1_ref, pjm_ref,
                                   pjp_ref)
        du, dv, dp = uc_ref[:], vc_ref[:], pc_ref[:]
        ul, vl = ul_ref[:], vl_ref[:]
        mb = mb_ref[:]            # 1.0 on Dirichlet rows, 0.0 elsewhere
        dru = Ku + coef * (ul * gxu + vl * gyu) \
            + jxx_ref[:] * du + jxy_ref[:] * dv + gxp
        drv = Kv + coef * (ul * gxv + vl * gyv) \
            + jyx_ref[:] * du + jyy_ref[:] * dv + gyp
        drc = gxu + gyv
        one = jnp.ones((), jnp.float32)
        dru_ref[:] = (mb * du + (one - mb) * dru).astype(dru_ref.dtype)
        drv_ref[:] = (mb * dv + (one - mb) * drv).astype(drv_ref.dtype)
        # artificial ∂ₙp=0 rows carry the pressure-stiffness rows
        drc_ref[:] = (mb * Kp + (one - mb) * drc).astype(drc_ref.dtype)
    return kernel


@functools.partial(jax.jit, static_argnums=(0, 7))
def apply_coupled_system_pallas(grid: Grid2D, q: jax.Array,
                                ul: jax.Array, vl: jax.Array,
                                jac, mb: jax.Array, coef,
                                interpret: bool = False) -> jax.Array:
    """Fused coupled saddle matvec ``(dru, drv, drc)`` for ``q=(du,dv,dp)``.

    Pallas analog of the fused two-matmul coupled matvec in
    ``NavierStokesSolver._coupled_ops``; excludes the pressure-pin row
    (a single element — callers apply it afterwards).  f32/bf16 only.

    :param jac: convection Jacobian diagonal vectors ``(jxx, jxy, jyx, jyy)``
    :param mb: boundary (Dirichlet-row) mask, flat bool/float ``(N,)``
    """
    dt = q.dtype
    bx, by, m1x, m1y, nbx, nby, Cx, Cy = _banded_constants(grid, dt.name)
    Ngx, Ngy = grid.Ngx, grid.Ngy
    N = grid.N

    def pad_field(f):
        F = f.reshape(Ngx, Ngy)
        return jnp.pad(F, ((_B, Cx - _B - Ngx), (_B, Cy - _B - Ngy)))

    Up, Vp, Pp = (pad_field(q[k * N:(k + 1) * N]) for k in range(3))
    Ulp = pad_field(ul.astype(dt))
    Vlp = pad_field(vl.astype(dt))
    jxx, jxy, jyx, jyy = (pad_field(j.astype(dt)) for j in jac)
    mbp = pad_field(mb.astype(dt))
    coef_arr = jnp.asarray(coef, dt).reshape(1, 1)
    # per-column-block y-operator bands reshaped for (i, j) indexing
    by4 = by.reshape(nby, 1, 3 * _B, 2 * _B)

    i32 = lambda x: jnp.asarray(x, jnp.int32)

    def spec(di, dj):
        return pl.BlockSpec((_B, _B),
                            lambda i, j: (i32(i + di), i32(j + dj)),
                            memory_space=pltpu.VMEM)

    halo5 = [spec(0, 1), spec(1, 1), spec(2, 1),   # rows i-1, i, i+1
             spec(1, 0), spec(1, 2)]               # cols j-1, j+1
    ctr = spec(1, 1)
    with jax.enable_x64(False):
        dru, drv, drc = pl.pallas_call(
            _coupled_kernel(),
            grid=(nbx, nby),
            in_specs=(halo5 * 3) + [ctr] * 7 + [
                pl.BlockSpec((1, 2 * _B, 3 * _B),
                             lambda i, j: (i32(i), i32(0), i32(0)),
                             memory_space=pltpu.VMEM),          # bx block
                pl.BlockSpec((1, 1, 3 * _B, 2 * _B),
                             lambda i, j: (i32(j), i32(0), i32(0), i32(0)),
                             memory_space=pltpu.VMEM),          # by block
                pl.BlockSpec((_B, 1), lambda i, j: (i32(i), i32(0)),
                             memory_space=pltpu.VMEM),          # m1x block
                pl.BlockSpec((1, _B), lambda i, j: (i32(0), i32(j)),
                             memory_space=pltpu.VMEM),          # m1y block
                pl.BlockSpec(memory_space=pltpu.SMEM),          # coef
            ],
            out_specs=[pl.BlockSpec((_B, _B),
                                    lambda i, j: (i32(i), i32(j)),
                                    memory_space=pltpu.VMEM)] * 3,
            out_shape=[jax.ShapeDtypeStruct((nbx * _B, nby * _B), dt)] * 3,
            interpret=interpret,
        )(Up, Up, Up, Up, Up, Vp, Vp, Vp, Vp, Vp, Pp, Pp, Pp, Pp, Pp,
          Ulp, Vlp, jxx, jxy, jyx, jyy, mbp,
          jnp.asarray(bx), jnp.asarray(by4),
          jnp.asarray(m1x), jnp.asarray(m1y.reshape(1, -1)[:, _B:]),
          coef_arr)

    def unpad(o):
        return o[:Ngx, :Ngy].reshape(-1)

    return jnp.concatenate([unpad(dru), unpad(drv), unpad(drc)])


# ---------------------------------------------------------------------------
# shard_map-wrapped variants: the fused kernels under a multi-device mesh
# (ROADMAP r4 #4 / VERDICT r2 next-round #3).  A bare ``pallas_call`` inside
# a GSPMD-partitioned program is replicated by XLA (silent all-gather of every
# operand per matvec), so multi-chip execution drops to "manual" SPMD: the
# padded row-block dimension is sharded over the 1D mesh, each device
# exchanges ONE _B-row halo block per side with its neighbors over ICI
# (``lax.ppermute`` — edge devices receive zeros, matching the global zero
# padding), and runs the single-chip kernel on its local row strip.  The
# per-row-block banded constants (bx, m1x) shard along with the rows; the
# column-direction constants (by, m1y) replicate.  The row-block count is
# padded up to a multiple of the device count (all-zero blocks produce zero
# rows — wasted only when N_e·P+1 divides badly; choose N_ex accordingly on
# real pods).

def _sharded_nbx(grid: Grid2D, ndev: int) -> int:
    nbx = -(-grid.Ngx // _B)
    return -(-nbx // ndev) * ndev


@functools.lru_cache(maxsize=None)
def _banded_constants_sharded(grid: Grid2D, dtype_name: str, nbx_sh: int):
    """Banded constants with the row-block axis zero-padded to ``nbx_sh``."""
    bx, by, m1x, m1y, nbx, nby, Cx, Cy = _banded_constants(grid, dtype_name)
    dt = np.dtype(dtype_name)
    bxs = np.zeros((nbx_sh,) + bx.shape[1:], dt)
    bxs[:nbx] = bx
    m1xs = np.zeros((nbx_sh * _B, 1), dt)
    m1xs[:m1x.shape[0]] = m1x
    return bxs, by, m1xs, m1y, nby, Cy


def _halo_perms(ndev: int):
    fwd = [(i, i + 1) for i in range(ndev - 1)]   # my top halo = prev's tail
    bwd = [(i + 1, i) for i in range(ndev - 1)]   # my bottom halo = next's head
    return fwd, bwd


@functools.partial(jax.jit, static_argnames=("grid", "mesh", "interpret"))
def apply_system_pallas_sharded(grid: Grid2D, u, v, w, coef, *,
                                mesh, interpret: bool = False):
    """:func:`apply_system_pallas` under manual SPMD over a 1D ``mesh``.

    Row strips (x-direction domain decomposition, matching
    ``parallel.sharding.field_sharding``) with a one-block ICI halo exchange
    per apply — the multi-chip replacement for the gated-off bare kernel.
    """
    dt = w.dtype
    ndev = int(mesh.devices.size)
    ax = mesh.axis_names[0]
    nbx_sh = _sharded_nbx(grid, ndev)
    bx, by, m1x, m1y, nby, Cy = _banded_constants_sharded(grid, dt.name,
                                                          nbx_sh)
    Ngx, Ngy = grid.Ngx, grid.Ngy
    nbx_loc = nbx_sh // ndev
    Rsh = nbx_sh * _B

    def pad_field(f):
        F = f.reshape(Ngx, Ngy)
        # rows: pad to the sharded block count, NO halo (built per-shard);
        # cols: one halo block left, zero-fill right — as the bare kernel
        return jnp.pad(F, ((0, Rsh - Ngx), (_B, Cy - _B - Ngy)))

    Wp = pad_field(w)
    Up = pad_field(u.astype(dt))
    Vp = pad_field(v.astype(dt))
    coef_arr = jnp.asarray(coef, dt).reshape(1, 1)
    fwd, bwd = _halo_perms(ndev)

    i32 = lambda x: jnp.asarray(x, jnp.int32)
    row_spec = lambda off: pl.BlockSpec(
        (_B, Cy), lambda i: (i32(i + off), i32(0)),
        memory_space=pltpu.VMEM)

    def local(Wl, Ul, Vl, bxl, byl, m1xl, m1yl, cl):
        def halo(F):
            top = jax.lax.ppermute(F[-_B:], ax, fwd)
            bot = jax.lax.ppermute(F[:_B], ax, bwd)
            return jnp.concatenate([top, F, bot], axis=0)

        Wh = halo(Wl)
        # u, v enter only through the center row spec — zero row pads suffice
        zrow = lambda F: jnp.pad(F, ((_B, _B), (0, 0)))
        with jax.enable_x64(False):
            return pl.pallas_call(
                _kernel(nby),
                grid=(nbx_loc,),
                in_specs=[
                    row_spec(0), row_spec(1), row_spec(2),
                    row_spec(1), row_spec(1),
                    pl.BlockSpec((1, 2 * _B, 3 * _B),
                                 lambda i: (i32(i), i32(0), i32(0)),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec((_B, 1), lambda i: (i32(i), i32(0)),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                out_specs=pl.BlockSpec((_B, Cy),
                                       lambda i: (i32(i), i32(0)),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nbx_loc * _B, Cy), dt),
                interpret=interpret,
            )(Wh, Wh, Wh, zrow(Ul), zrow(Vl), bxl, byl, m1xl, m1yl, cl)

    from jax.sharding import PartitionSpec as P
    out = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(ax, None), P(ax, None), P(ax, None),
                  P(ax, None, None), P(None, None, None),
                  P(ax, None), P(None, None), P(None, None)),
        out_specs=P(ax, None),
        check_vma=False,
    )(Wp, Up, Vp, jnp.asarray(bx), jnp.asarray(by),
      jnp.asarray(m1x), jnp.asarray(m1y), coef_arr)

    return out[:Ngx, _B:_B + Ngy].reshape(-1)


@functools.partial(jax.jit, static_argnames=("grid", "mesh", "interpret"))
def apply_coupled_system_pallas_sharded(grid: Grid2D, q, ul, vl, jac, mb,
                                        coef, *, mesh,
                                        interpret: bool = False):
    """:func:`apply_coupled_system_pallas` under manual SPMD over ``mesh``.

    Same row-strip decomposition and halo exchange as
    :func:`apply_system_pallas_sharded`; only the three Krylov fields
    (du, dv, dp) need neighbor halos — the frozen linearization fields enter
    the kernel through center-block specs only and are zero-row-padded.
    """
    dt = q.dtype
    ndev = int(mesh.devices.size)
    ax = mesh.axis_names[0]
    nbx_sh = _sharded_nbx(grid, ndev)
    bx, by, m1x, m1y, nby, Cy = _banded_constants_sharded(grid, dt.name,
                                                          nbx_sh)
    Ngx, Ngy, N = grid.Ngx, grid.Ngy, grid.N
    nbx_loc = nbx_sh // ndev
    Rsh = nbx_sh * _B

    def pad_field(f):
        F = f.reshape(Ngx, Ngy)
        return jnp.pad(F, ((0, Rsh - Ngx), (_B, Cy - _B - Ngy)))

    Up, Vp, Pp = (pad_field(q[k * N:(k + 1) * N]) for k in range(3))
    Ulp = pad_field(ul.astype(dt))
    Vlp = pad_field(vl.astype(dt))
    jxx, jxy, jyx, jyy = (pad_field(j.astype(dt)) for j in jac)
    mbp = pad_field(mb.astype(dt))
    coef_arr = jnp.asarray(coef, dt).reshape(1, 1)
    by4 = by.reshape(nby, 1, 3 * _B, 2 * _B)
    m1y_t = np.ascontiguousarray(m1y.reshape(1, -1)[:, _B:])
    fwd, bwd = _halo_perms(ndev)

    i32 = lambda x: jnp.asarray(x, jnp.int32)

    def spec(di, dj):
        return pl.BlockSpec((_B, _B),
                            lambda i, j: (i32(i + di), i32(j + dj)),
                            memory_space=pltpu.VMEM)

    halo5 = [spec(0, 1), spec(1, 1), spec(2, 1),
             spec(1, 0), spec(1, 2)]
    ctr = spec(1, 1)

    def local(Ub, Vb, Pb, Ulb, Vlb, jxxb, jxyb, jyxb, jyyb, mbb,
              bxl, by4l, m1xl, m1yl, cl):
        def halo(F):
            top = jax.lax.ppermute(F[-_B:], ax, fwd)
            bot = jax.lax.ppermute(F[:_B], ax, bwd)
            return jnp.concatenate([top, F, bot], axis=0)

        zrow = lambda F: jnp.pad(F, ((_B, _B), (0, 0)))
        Uh, Vh, Ph = halo(Ub), halo(Vb), halo(Pb)
        ctrs = [zrow(x) for x in (Ulb, Vlb, jxxb, jxyb, jyxb, jyyb, mbb)]
        with jax.enable_x64(False):
            return pl.pallas_call(
                _coupled_kernel(),
                grid=(nbx_loc, nby),
                in_specs=(halo5 * 3) + [ctr] * 7 + [
                    pl.BlockSpec((1, 2 * _B, 3 * _B),
                                 lambda i, j: (i32(i), i32(0), i32(0)),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, 3 * _B, 2 * _B),
                                 lambda i, j: (i32(j), i32(0), i32(0),
                                               i32(0)),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((_B, 1), lambda i, j: (i32(i), i32(0)),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, _B), lambda i, j: (i32(0), i32(j)),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                out_specs=[pl.BlockSpec((_B, _B),
                                        lambda i, j: (i32(i), i32(j)),
                                        memory_space=pltpu.VMEM)] * 3,
                out_shape=[jax.ShapeDtypeStruct((nbx_loc * _B, nby * _B),
                                                dt)] * 3,
                interpret=interpret,
            )(Uh, Uh, Uh, Uh, Uh, Vh, Vh, Vh, Vh, Vh,
              Ph, Ph, Ph, Ph, Ph, *ctrs, bxl, by4l, m1xl, m1yl, cl)

    from jax.sharding import PartitionSpec as P
    dru, drv, drc = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(ax, None),) * 10 + (
            P(ax, None, None), P(None, None, None, None),
            P(ax, None), P(None, None), P(None, None)),
        out_specs=(P(ax, None),) * 3,
        check_vma=False,
    )(Up, Vp, Pp, Ulp, Vlp, jxx, jxy, jyx, jyy, mbp,
      jnp.asarray(bx), jnp.asarray(by4), jnp.asarray(m1x),
      jnp.asarray(m1y_t), coef_arr)

    def unpad(o):
        return o[:Ngx, :Ngy].reshape(-1)

    return jnp.concatenate([unpad(dru), unpad(drv), unpad(drc)])


# empirical crossover on v5e: below this the per-program fixed costs of the
# banded kernel exceed the saved matmul work (P=8 32x32 = 66k: XLA wins;
# p=16 64x64 = 1.05M: Pallas is ~1.8x faster)
_PALLAS_MIN_N = 300_000


def _multichip_mesh_active() -> bool:
    """True when kernels are being traced under an active multi-device mesh.

    A bare ``pallas_call`` inside a GSPMD-partitioned program is not
    partitioned with it: XLA either replicates the kernel (silently
    all-gathering every operand per matvec) or fails to partition — so under
    an active multi-device mesh the dispatchers below conservatively route
    to the XLA two-matmul path, whose sharding propagation is tested
    (tests/test_sharding.py).  Read at trace time, like the solvers'
    ``constrain`` annotations (VERDICT r2 missing-item #1).
    """
    from sem_tpu.parallel.sharding import active_mesh
    mesh = active_mesh()
    return mesh is not None and mesh.devices.size > 1


def pallas_wanted(grid: Grid2D, dtype) -> bool:
    """Whether a fused apply should route through the Pallas kernels: large
    f32/bf16 grids, TPU backend, and no active multi-device mesh."""
    return (dtype != jnp.float64 and grid.N >= _PALLAS_MIN_N
            and jax.default_backend() == "tpu"
            and not _multichip_mesh_active())


def sharded_pallas_mesh(grid: Grid2D, dtype):
    """The active mesh, when the manual-SPMD Pallas variants should be used:
    a 1D multi-device mesh on TPU with a Pallas-sized f32/bf16 grid.
    Returns ``None`` otherwise (callers fall back to the XLA path, whose
    GSPMD sharding propagation is tested in tests/test_sharding.py)."""
    if (dtype == jnp.float64 or grid.N < _PALLAS_MIN_N
            or jax.default_backend() != "tpu"):
        return None
    from sem_tpu.parallel.sharding import active_mesh
    mesh = active_mesh()
    if mesh is None or mesh.devices.size <= 1 or len(mesh.axis_names) != 1:
        return None
    return mesh


def apply_system_best(grid: Grid2D, u, v, w, coef):
    """Dispatch the fused system apply to the faster backend for the size:
    the Pallas block-banded kernel for large f32/bf16 grids on single-chip
    TPU, the shard_map-wrapped kernel under a multi-device mesh, the XLA
    two-matmul path otherwise."""
    if pallas_wanted(grid, w.dtype):
        return apply_system_pallas(grid, u, v, w, coef)
    mesh = sharded_pallas_mesh(grid, w.dtype)
    if mesh is not None:
        return apply_system_pallas_sharded(grid, u, v, w, coef, mesh=mesh)
    return ops.apply_system(grid, u, v, w, coef)


def coupled_pallas_wanted(grid: Grid2D, dtype) -> bool:
    """Whether the coupled saddle matvec should route through the Pallas
    kernel (same crossover policy as :func:`apply_system_best`)."""
    return pallas_wanted(grid, dtype)
