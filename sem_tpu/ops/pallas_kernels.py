"""Pallas TPU kernel: fused block-banded SEM system apply.

Computes, in ONE kernel pass, the hot SEM matvec::

    y = (K + coef·(u ∂x + v ∂y)) w
      = (K1x@W)·m1y + m1x·(W@K1yᵀ) + coef·[u∘(G1x@W)·m1y + v∘m1x·(W@G1yᵀ)]

The XLA path (``sem_tpu.operators.apply_system``) does this with two large
dense matmuls; the assembled 1D operators are in fact *block-banded* (band
2P+1 ≤ 129), so ~⅔ of those FLOPs multiply structural zeros.  This kernel

* tiles the grid into 128-row programs,
* contracts only the in-band operator blocks with a **64-staggered input
  tiling**: the input field is padded by half a block (64) in the
  contracted direction, so a 128-row output block's band window
  (128 + 2P ≤ 256 rows for P ≤ 64) spans exactly TWO input blocks — one
  (256,256)×(256,C) matmul for the x-direction, nb (128,256)×(256,256)
  matmuls for the y-direction.  (The round-1..4 aligned tiling needed
  THREE blocks per window and computed the padded halo columns too:
  4.55 GFLOP/apply at p16 64×64 vs 2.72 now — measured 43% of the matmul
  roofline bound, study/roofline.py.)  Two differently-padded copies of
  the field (row-staggered for the x-matmul, column-staggered for the
  y-matmuls) keep every in-kernel slice block-aligned, and
* fuses the mass weights, convection products, and the final combination in
  VMEM.

Zero-padding makes every out-of-range band contribution vanish, so no
masking is needed.  Numerical parity with the XLA path is tested in
tests/test_pallas.py; ``apply_system_pallas`` falls back to the XLA path on
non-TPU backends (interpret mode is used in tests).
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

_B = 128  # row/column block size (staggered tiling needs half-band P ≤ _B/2)


@functools.lru_cache(maxsize=None)
def _banded_constants_stag(grid: Grid2D, dtype_name: str):
    """Staggered block-banded forms of the 1D operators (host-side, cached).

    Output row/column block ``i`` (rows ``i·B .. i·B+B-1`` of the unpadded
    field) reads input blocks ``i`` and ``i+1`` of a field padded by ``B/2``
    at the start of the contracted axis — two blocks cover the band window
    exactly when the half-band ``P ≤ B/2``.
    """
    dt = np.dtype(dtype_name)
    H = _B // 2
    if grid.P > H:   # band window no longer fits two staggered blocks
        raise ValueError(f"banded Pallas kernel supports P <= {H}")
    nbx = -(-grid.Ngx // _B)
    nby = -(-grid.Ngy // _B)

    def pad_mat(A, n_out):
        out = np.zeros((n_out, n_out), dt)
        out[H:H + A.shape[0], H:H + A.shape[1]] = A
        return out

    # x blocks: bx[i][kr, cc] = [K1x; G1x][i·B+kr, i·B+cc-H] — rows at
    # OUTPUT alignment, columns in the row-staggered input coordinates
    Kxp = pad_mat(grid.K1x.astype(dt), (nbx + 1) * _B)
    Gxp = pad_mat(grid.G1x.astype(dt), (nbx + 1) * _B)
    bx = np.zeros((nbx, 2 * _B, 2 * _B), dt)
    for i in range(nbx):
        r0, c0 = H + i * _B, i * _B
        bx[i, :_B] = Kxp[r0:r0 + _B, c0:c0 + 2 * _B]
        bx[i, _B:] = Gxp[r0:r0 + _B, c0:c0 + 2 * _B]

    # y blocks of [K1yᵀ | G1yᵀ]: by[j][rr, cc] = K1yᵀ[j·B+rr-H, j·B+cc] —
    # rows in the column-staggered input coordinates, columns at OUTPUT
    # alignment
    KyTp = pad_mat(grid.K1y.T.astype(dt), (nby + 1) * _B)
    GyTp = pad_mat(grid.G1y.T.astype(dt), (nby + 1) * _B)
    by = np.zeros((nby, 2 * _B, 2 * _B), dt)
    for j in range(nby):
        r0, c0 = j * _B, H + j * _B
        by[j, :, :_B] = KyTp[r0:r0 + 2 * _B, c0:c0 + _B]
        by[j, :, _B:] = GyTp[r0:r0 + 2 * _B, c0:c0 + _B]

    m1x = np.zeros((nbx * _B, 1), dt)
    m1x[:grid.Ngx, 0] = grid.m1x.astype(dt)
    m1y = np.zeros((1, nby * _B), dt)
    m1y[0, :grid.Ngy] = grid.m1y.astype(dt)
    return bx, by, m1x, m1y, nbx, nby


def _kernel(nby: int):
    def kernel(w1a_ref, w1b_ref, w2_ref, u_ref, v_ref, bx_ref, by_ref,
               m1x_ref, m1y_ref, coef_ref, out_ref):
        # x-direction: one staggered banded matmul produces the K1x- and
        # G1x-rows of this output block at once (input = two row-staggered
        # blocks; columns already at output alignment)
        wband = jnp.concatenate([w1a_ref[:], w1b_ref[:]], axis=0)  # (2B, C)
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

        # y-direction: staggered banded blocks over the column tiles (the
        # per-tile results concatenate exactly to the output width — no
        # zero blocks; in-kernel scatter is not lowerable on TPU)
        W2 = w2_ref[:]            # rows at output alignment, cols staggered
        ys = [jnp.dot(W2[:, j * _B:(j + 2) * _B], by_ref[j],
                      preferred_element_type=jnp.float32,   # (B, 2B)
                      precision=prec)
              for j in range(nby)]
        Ky = jnp.concatenate([y[:, :_B] for y in ys], axis=1)
        Gy = jnp.concatenate([y[:, _B:] for y in ys], axis=1)

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
    bx, by, m1x, m1y, nbx, nby = _banded_constants_stag(grid, dt.name)
    Ngx, Ngy = grid.Ngx, grid.Ngy
    H = _B // 2
    Rout, Cout = nbx * _B, nby * _B     # output tiling (aligned)

    W = w.reshape(Ngx, Ngy)
    # two staggered views of the field: W1 row-staggered (x-matmul operand),
    # W2 column-staggered (y-matmul operand); u, v, out stay output-aligned
    W1 = jnp.pad(W, ((H, Rout + _B - H - Ngx), (0, Cout - Ngy)))
    W2 = jnp.pad(W, ((0, Rout - Ngx), (H, Cout + _B - H - Ngy)))
    pad_ctr = lambda f: jnp.pad(f.astype(dt).reshape(Ngx, Ngy),
                                ((0, Rout - Ngx), (0, Cout - Ngy)))
    coef_arr = jnp.asarray(coef, dt).reshape(1, 1)

    # index maps must return int32: under jax_enable_x64 integer arithmetic
    # promotes to i64, which Mosaic cannot legalize in block index maps
    i32 = lambda x: jnp.asarray(x, jnp.int32)
    # Pallas canonicalizes index-map outputs to the x64 default integer,
    # which Mosaic cannot legalize — trace the kernel with x64 disabled
    # (the fields are f32/bf16; nothing in the kernel needs 64-bit types)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _kernel(nby),
            grid=(nbx,),
            in_specs=[
                pl.BlockSpec((_B, Cout), lambda i: (i32(i), i32(0)),
                             memory_space=pltpu.VMEM),      # W1 block i
                pl.BlockSpec((_B, Cout), lambda i: (i32(i + 1), i32(0)),
                             memory_space=pltpu.VMEM),      # W1 block i+1
                pl.BlockSpec((_B, Cout + _B), lambda i: (i32(i), i32(0)),
                             memory_space=pltpu.VMEM),      # W2 rows i
                pl.BlockSpec((_B, Cout), lambda i: (i32(i), i32(0)),
                             memory_space=pltpu.VMEM),      # u rows i
                pl.BlockSpec((_B, Cout), lambda i: (i32(i), i32(0)),
                             memory_space=pltpu.VMEM),      # v rows i
                pl.BlockSpec((1, 2 * _B, 2 * _B),
                             lambda i: (i32(i), i32(0), i32(0)),
                             memory_space=pltpu.VMEM),      # bx block
                pl.BlockSpec(memory_space=pltpu.VMEM),      # by (full)
                pl.BlockSpec((_B, 1), lambda i: (i32(i), i32(0)),
                             memory_space=pltpu.VMEM),      # m1x block
                pl.BlockSpec(memory_space=pltpu.VMEM),      # m1y (full)
                pl.BlockSpec(memory_space=pltpu.SMEM),      # coef
            ],
            out_specs=pl.BlockSpec((_B, Cout), lambda i: (i32(i), i32(0)),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Rout, Cout), dt),
            interpret=interpret,
        )(W1, W1, W2, pad_ctr(u), pad_ctr(v), jnp.asarray(bx),
          jnp.asarray(by), jnp.asarray(m1x), jnp.asarray(m1y), coef_arr)

    return out[:Ngx, :Ngy].reshape(-1)


@functools.partial(jax.jit, static_argnums=(0,))
def apply_system_banded_xla(grid: Grid2D, u: jax.Array, v: jax.Array,
                            w: jax.Array, coef) -> jax.Array:
    """Staggered banded apply as TWO batched einsums in pure XLA.

    Same block-banded math as :func:`apply_system_pallas` (identical
    ``_banded_constants_stag`` operands), but issued as one batched
    (nbx, 2B, 2B)×(nbx, 2B, C) contraction for the x-direction and one
    (R, nby, 2B)×(nby, 2B, 2B) for the y-direction, with XLA fusing the
    mass/convection combination.  Motivation (study/roofline.py, round 5):
    the Pallas kernel is ISSUE-bound, not FLOP-bound — its per-row-block
    programs issue ~10 small sequential MXU matmuls each (~80 per apply at
    p16 64×64), while a batched einsum pays ~one issue per direction
    (study/op_latency.py: four-field batched einsum 3× its sequential
    dispatches).  The overlapping band windows are materialized by two
    aligned reshape+concat views (pure copies, no gather).
    """
    if w.dtype == jnp.float64:
        return ops.apply_system(grid, u, v, w, coef)
    dt = w.dtype
    bx, by, m1x, m1y, nbx, nby = _banded_constants_stag(grid, dt.name)
    Ngx, Ngy = grid.Ngx, grid.Ngy
    H = _B // 2
    Rout, Cout = nbx * _B, nby * _B
    hi = (jax.lax.Precision.HIGHEST if dt == jnp.float32
          else jax.lax.Precision.DEFAULT)

    W = w.reshape(Ngx, Ngy)
    W1 = jnp.pad(W, ((H, Rout + _B - H - Ngx), (0, Cout - Ngy)))
    W2 = jnp.pad(W, ((0, Rout - Ngx), (H, Cout + _B - H - Ngy)))

    # x-direction: each output block contracts the 2B-row window at stride
    # B of the row-staggered field — expressed as TWO aligned batched
    # contractions (the window's first/second block half), so the
    # overlapping windows are never materialized (reshape views only)
    bxj = jnp.asarray(bx)
    Ax = W1.reshape(nbx + 1, _B, Cout)
    X = (jnp.einsum("iok,ikc->ioc", bxj[:, :, :_B], Ax[:-1], precision=hi)
         + jnp.einsum("iok,ikc->ioc", bxj[:, :, _B:], Ax[1:],
                      precision=hi))                         # (nbx, 2B, C)
    Kx = X[:, :_B, :].reshape(Rout, Cout)
    Gx = X[:, _B:, :].reshape(Rout, Cout)

    # y-direction: 2B-column windows at stride B of the column-staggered
    # field; by[j] carries [K1yᵀ | G1yᵀ] side by side
    byj = jnp.asarray(by)
    Ay = W2.reshape(Rout, nby + 1, _B)
    Y = (jnp.einsum("rjk,jko->rjo", Ay[:, :-1], byj[:, :_B], precision=hi)
         + jnp.einsum("rjk,jko->rjo", Ay[:, 1:], byj[:, _B:],
                      precision=hi))                         # (R, nby, 2B)
    Ky = Y[:, :, :_B].reshape(Rout, Cout)
    Gy = Y[:, :, _B:].reshape(Rout, Cout)

    m1xj = jnp.asarray(m1x)                                  # (Rout, 1)
    m1yj = jnp.asarray(m1y)                                  # (1, Cout)
    up = jnp.pad(u.astype(dt).reshape(Ngx, Ngy),
                 ((0, Rout - Ngx), (0, Cout - Ngy)))
    vp = jnp.pad(v.astype(dt).reshape(Ngx, Ngy),
                 ((0, Rout - Ngx), (0, Cout - Ngy)))
    coef_ = jnp.asarray(coef, dt)
    out = (Kx * m1yj + m1xj * Ky
           + coef_ * (up * (Gx * m1yj) + vp * (m1xj * Gy)))
    return out[:Ngx, :Ngy].reshape(-1)


def _coupled_kernel():
    """Fused coupled (du, dv, dp) saddle matvec: the NS solver's hot
    operator (NavierStokesSolver._coupled_ops.mv — the tangent residual
    rows of reference NavierStokes_Solver.py:138-160) in ONE kernel pass.

    2D-tiled: each (i, j) program computes one (B, B) output tile of all
    three residual fields from a (2B, B) staggered row band and a (B, 2B)
    staggered column band of each input field — all six banded 1D operator
    products, the mass-weighted combinations, the convection and
    Jacobian-diagonal terms, and the Dirichlet/∂ₙp=0 row masking happen in
    VMEM on ~(B, B) tiles (the 1D-row-tiled variant held (B, 3·Cy) strips
    and ran out of scoped VMEM at p16 64×64).  The center (B, B) tile of
    each Krylov field is a sublane slice of its already-loaded row band —
    four block reads per field, not five.
    """
    H = _B // 2

    def kernel(ua_ref, uap_ref, ub_ref, ubp_ref,
               va_ref, vap_ref, vb_ref, vbp_ref,
               pa_ref, pap_ref, pb_ref, pbp_ref,
               ul_ref, vl_ref, jxx_ref, jxy_ref, jyx_ref, jyy_ref, mb_ref,
               bx_ref, by_ref, m1x_ref, m1y_ref, coef_ref,
               dru_ref, drv_ref, drc_ref):
        m1x = m1x_ref[:]          # (B, 1)
        m1y = m1y_ref[:]          # (1, B)
        coef = coef_ref[0, 0]
        hi = (jax.lax.Precision.HIGHEST if ua_ref.dtype == jnp.float32
              else jax.lax.Precision.DEFAULT)

        def field_parts(ra, rap, rb, rbp):
            wcol = jnp.concatenate([ra[:], rap[:]], axis=0)     # (2B, B)
            # f32 accumulation (Mosaic requires 32-bit matmul accumulators)
            xL = jnp.dot(bx_ref[0], wcol,
                         preferred_element_type=jnp.float32,
                         precision=hi)                               # (2B,B)
            wrow = jnp.concatenate([rb[:], rbp[:]], axis=1)     # (B, 2B)
            yR = jnp.dot(wrow, by_ref[0],
                         preferred_element_type=jnp.float32,
                         precision=hi)                               # (B,2B)
            Kx, Gx = xL[:_B], xL[_B:]
            Ky, Gy = yR[:, :_B], yR[:, _B:]
            # center tile = the aligned rows inside the staggered row band
            ctr = wcol[H:H + _B]
            return Kx * m1y + m1x * Ky, Gx * m1y, m1x * Gy, ctr

        Ku, gxu, gyu, du = field_parts(ua_ref, uap_ref, ub_ref, ubp_ref)
        Kv, gxv, gyv, dv = field_parts(va_ref, vap_ref, vb_ref, vbp_ref)
        Kp, gxp, gyp, _ = field_parts(pa_ref, pap_ref, pb_ref, pbp_ref)
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
    bx, by, m1x, m1y, nbx, nby = _banded_constants_stag(grid, dt.name)
    Ngx, Ngy = grid.Ngx, grid.Ngy
    N = grid.N
    H = _B // 2
    Rout, Cout = nbx * _B, nby * _B

    def pad_A(f):   # row-staggered (x-matmul operand)
        return jnp.pad(f.reshape(Ngx, Ngy),
                       ((H, Rout + _B - H - Ngx), (0, Cout - Ngy)))

    def pad_Bc(f):  # column-staggered (y-matmul operand)
        return jnp.pad(f.reshape(Ngx, Ngy),
                       ((0, Rout - Ngx), (H, Cout + _B - H - Ngy)))

    def pad_ctr(f):  # output-aligned (elementwise operands)
        return jnp.pad(f.astype(dt).reshape(Ngx, Ngy),
                       ((0, Rout - Ngx), (0, Cout - Ngy)))

    dU, dV, dP = (q[k * N:(k + 1) * N] for k in range(3))
    Ua, Va, Pa = pad_A(dU), pad_A(dV), pad_A(dP)
    Ub, Vb, Pb = pad_Bc(dU), pad_Bc(dV), pad_Bc(dP)
    Ulp, Vlp = pad_ctr(ul), pad_ctr(vl)
    jxx, jxy, jyx, jyy = (pad_ctr(j) for j in jac)
    mbp = pad_ctr(mb)
    coef_arr = jnp.asarray(coef, dt).reshape(1, 1)

    i32 = lambda x: jnp.asarray(x, jnp.int32)

    def spec(di, dj):
        return pl.BlockSpec((_B, _B),
                            lambda i, j: (i32(i + di), i32(j + dj)),
                            memory_space=pltpu.VMEM)

    # per Krylov field: row-staggered blocks (i, i+1) of the A copy +
    # column-staggered blocks (j, j+1) of the B copy
    band4 = [spec(0, 0), spec(1, 0), spec(0, 0), spec(0, 1)]
    ctr = spec(0, 0)
    with jax.enable_x64(False):
        dru, drv, drc = pl.pallas_call(
            _coupled_kernel(),
            grid=(nbx, nby),
            in_specs=(band4 * 3) + [ctr] * 7 + [
                pl.BlockSpec((1, 2 * _B, 2 * _B),
                             lambda i, j: (i32(i), i32(0), i32(0)),
                             memory_space=pltpu.VMEM),          # bx block
                pl.BlockSpec((1, 2 * _B, 2 * _B),
                             lambda i, j: (i32(j), i32(0), i32(0)),
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
            out_shape=[jax.ShapeDtypeStruct((Rout, Cout), dt)] * 3,
            interpret=interpret,
        )(Ua, Ua, Ub, Ub, Va, Va, Vb, Vb, Pa, Pa, Pb, Pb,
          Ulp, Vlp, jxx, jxy, jyx, jyy, mbp,
          jnp.asarray(bx), jnp.asarray(by),
          jnp.asarray(m1x), jnp.asarray(m1y), coef_arr)

    def unpad(o):
        return o[:Ngx, :Ngy].reshape(-1)

    return jnp.concatenate([unpad(dru), unpad(drv), unpad(drc)])


@functools.partial(jax.jit, static_argnums=(0,))
def apply_coupled_system_banded_xla(grid: Grid2D, q: jax.Array,
                                    ul: jax.Array, vl: jax.Array,
                                    jac, mb: jax.Array, coef) -> jax.Array:
    """Coupled saddle matvec as FOUR field-batched einsums in pure XLA.

    Same math and operands as :func:`apply_coupled_system_pallas`, but the
    three Krylov fields (du, dv, dp) are stacked into one batch dimension
    and each direction's staggered banded contraction is issued as two
    aligned batched einsums — ~4 large MXU issues per apply instead of the
    2D-tiled kernel's nbx·nby programs × 6 small matmuls (~432 at p16
    64×64; the ISSUE-bound regime study/roofline.py identified).  The
    mass/convection/Jacobian/mask combination fuses in XLA.
    """
    dt = q.dtype
    bx, by, m1x, m1y, nbx, nby = _banded_constants_stag(grid, dt.name)
    Ngx, Ngy = grid.Ngx, grid.Ngy
    H = _B // 2
    Rout, Cout = nbx * _B, nby * _B
    hi = (jax.lax.Precision.HIGHEST if dt == jnp.float32
          else jax.lax.Precision.DEFAULT)

    Q3 = q.reshape(3, Ngx, Ngy)
    Q1 = jnp.pad(Q3, ((0, 0), (H, Rout + _B - H - Ngx), (0, Cout - Ngy)))
    Q2 = jnp.pad(Q3, ((0, 0), (0, Rout - Ngx), (H, Cout + _B - H - Ngy)))

    bxj = jnp.asarray(bx)
    Ax = Q1.reshape(3, nbx + 1, _B, Cout)
    X = (jnp.einsum("iok,fikc->fioc", bxj[:, :, :_B], Ax[:, :-1],
                    precision=hi)
         + jnp.einsum("iok,fikc->fioc", bxj[:, :, _B:], Ax[:, 1:],
                      precision=hi))                      # (3, nbx, 2B, C)
    Kx = X[:, :, :_B, :].reshape(3, Rout, Cout)
    Gx = X[:, :, _B:, :].reshape(3, Rout, Cout)

    byj = jnp.asarray(by)
    Ay = Q2.reshape(3, Rout, nby + 1, _B)
    Y = (jnp.einsum("frjk,jko->frjo", Ay[:, :, :-1], byj[:, :_B],
                    precision=hi)
         + jnp.einsum("frjk,jko->frjo", Ay[:, :, 1:], byj[:, _B:],
                      precision=hi))                      # (3, R, nby, 2B)
    Ky = Y[..., :_B].reshape(3, Rout, Cout)
    Gy = Y[..., _B:].reshape(3, Rout, Cout)

    m1xj = jnp.asarray(m1x)                               # (Rout, 1)
    m1yj = jnp.asarray(m1y)                               # (1, Cout)
    K2d = Kx * m1yj + m1xj * Ky                           # (3, Rout, Cout)
    gx = Gx * m1yj
    gy = m1xj * Gy

    def pad_ctr(f):
        return jnp.pad(f.astype(dt).reshape(Ngx, Ngy),
                       ((0, Rout - Ngx), (0, Cout - Ngy)))

    ulp, vlp = pad_ctr(ul), pad_ctr(vl)
    jxx, jxy, jyx, jyy = (pad_ctr(j) for j in jac)
    mbp = pad_ctr(mb)
    du = jnp.pad(Q3[0], ((0, Rout - Ngx), (0, Cout - Ngy)))
    dv = jnp.pad(Q3[1], ((0, Rout - Ngx), (0, Cout - Ngy)))
    coef_ = jnp.asarray(coef, dt)

    dru = K2d[0] + coef_ * (ulp * gx[0] + vlp * gy[0]) \
        + jxx * du + jxy * dv + gx[2]
    drv = K2d[1] + coef_ * (ulp * gx[1] + vlp * gy[1]) \
        + jyx * du + jyy * dv + gy[2]
    drc = gx[0] + gy[1]
    one = jnp.asarray(1.0, dt)
    dru = mbp * du + (one - mbp) * dru
    drv = mbp * dv + (one - mbp) * drv
    drc = mbp * K2d[2] + (one - mbp) * drc

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
# padding), and runs the single-chip kernel on its local row strip.  With
# the staggered tiling the halo is the HALF-block stagger pad (64 rows per
# side).  The per-row-block banded constants (bx, m1x) shard along with the
# rows; the column-direction constants (by, m1y) replicate.  The row-block
# count is padded up to a multiple of the device count (all-zero blocks
# produce zero rows — wasted only when N_e·P+1 divides badly; choose N_ex
# accordingly on real pods).

def _sharded_nbx(grid: Grid2D, ndev: int) -> int:
    nbx = -(-grid.Ngx // _B)
    return -(-nbx // ndev) * ndev


@functools.lru_cache(maxsize=None)
def _banded_constants_sharded(grid: Grid2D, dtype_name: str, nbx_sh: int):
    """Staggered banded constants, row-block axis zero-padded to ``nbx_sh``."""
    bx, by, m1x, m1y, nbx, nby = _banded_constants_stag(grid, dtype_name)
    dt = np.dtype(dtype_name)
    bxs = np.zeros((nbx_sh,) + bx.shape[1:], dt)
    bxs[:nbx] = bx
    m1xs = np.zeros((nbx_sh * _B, 1), dt)
    m1xs[:m1x.shape[0]] = m1x
    return bxs, by, m1xs, m1y, nby, nby * _B


def _halo_perms(ndev: int):
    fwd = [(i, i + 1) for i in range(ndev - 1)]   # my top halo = prev's tail
    bwd = [(i + 1, i) for i in range(ndev - 1)]   # my bottom halo = next's head
    return fwd, bwd


@functools.partial(jax.jit, static_argnames=("grid", "mesh", "interpret"))
def apply_system_pallas_sharded(grid: Grid2D, u, v, w, coef, *,
                                mesh, interpret: bool = False):
    """:func:`apply_system_pallas` under manual SPMD over a 1D ``mesh``.

    Row strips (x-direction domain decomposition, matching
    ``parallel.sharding.field_sharding``) with a half-block ICI halo exchange
    per apply — the multi-chip replacement for the gated-off bare kernel.
    """
    dt = w.dtype
    ndev = int(mesh.devices.size)
    ax = mesh.axis_names[0]
    nbx_sh = _sharded_nbx(grid, ndev)
    bx, by, m1x, m1y, nby, Cout = _banded_constants_sharded(grid, dt.name,
                                                            nbx_sh)
    Ngx, Ngy = grid.Ngx, grid.Ngy
    nbx_loc = nbx_sh // ndev
    Rsh = nbx_sh * _B
    H = _B // 2

    def pad_field(f):
        F = f.reshape(Ngx, Ngy)
        # rows: pad to the sharded block count, NO stagger (the half-block
        # halo is built per-shard); cols: output-aligned
        return jnp.pad(F, ((0, Rsh - Ngx), (0, Cout - Ngy)))

    Wp = pad_field(w)
    Up = pad_field(u.astype(dt))
    Vp = pad_field(v.astype(dt))
    coef_arr = jnp.asarray(coef, dt).reshape(1, 1)
    fwd, bwd = _halo_perms(ndev)

    i32 = lambda x: jnp.asarray(x, jnp.int32)

    def local(Wl, Ul, Vl, bxl, byl, m1xl, m1yl, cl):
        # W1: row-staggered local view — my top half-block halo is the
        # previous device's tail (edge devices receive zeros, matching the
        # global stagger pad); nbx_loc+1 staggered blocks total
        top = jax.lax.ppermute(Wl[-H:], ax, fwd)
        bot = jax.lax.ppermute(Wl[:H], ax, bwd)
        W1 = jnp.concatenate([top, Wl, bot], axis=0)
        # W2: column-staggered view (columns are not sharded)
        W2 = jnp.pad(Wl, ((0, 0), (H, H)))
        with jax.enable_x64(False):
            return pl.pallas_call(
                _kernel(nby),
                grid=(nbx_loc,),
                in_specs=[
                    pl.BlockSpec((_B, Cout), lambda i: (i32(i), i32(0)),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((_B, Cout), lambda i: (i32(i + 1), i32(0)),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((_B, Cout + _B),
                                 lambda i: (i32(i), i32(0)),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((_B, Cout), lambda i: (i32(i), i32(0)),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((_B, Cout), lambda i: (i32(i), i32(0)),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 2 * _B, 2 * _B),
                                 lambda i: (i32(i), i32(0), i32(0)),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec((_B, 1), lambda i: (i32(i), i32(0)),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                out_specs=pl.BlockSpec((_B, Cout),
                                       lambda i: (i32(i), i32(0)),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nbx_loc * _B, Cout), dt),
                interpret=interpret,
            )(W1, W1, W2, Ul, Vl, bxl, byl, m1xl, m1yl, cl)

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

    return out[:Ngx, :Ngy].reshape(-1)


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
    bx, by, m1x, m1y, nby, Cout = _banded_constants_sharded(grid, dt.name,
                                                            nbx_sh)
    Ngx, Ngy, N = grid.Ngx, grid.Ngy, grid.N
    nbx_loc = nbx_sh // ndev
    Rsh = nbx_sh * _B
    H = _B // 2

    def pad_field(f):
        F = f.reshape(Ngx, Ngy)
        return jnp.pad(F, ((0, Rsh - Ngx), (0, Cout - Ngy)))

    Up, Vp, Pp = (pad_field(q[k * N:(k + 1) * N]) for k in range(3))
    Ulp = pad_field(ul.astype(dt))
    Vlp = pad_field(vl.astype(dt))
    jxx, jxy, jyx, jyy = (pad_field(j.astype(dt)) for j in jac)
    mbp = pad_field(mb.astype(dt))
    coef_arr = jnp.asarray(coef, dt).reshape(1, 1)
    fwd, bwd = _halo_perms(ndev)

    i32 = lambda x: jnp.asarray(x, jnp.int32)

    def spec(di, dj):
        return pl.BlockSpec((_B, _B),
                            lambda i, j: (i32(i + di), i32(j + dj)),
                            memory_space=pltpu.VMEM)

    band4 = [spec(0, 0), spec(1, 0), spec(0, 0), spec(0, 1)]
    ctr = spec(0, 0)

    def local(Ub, Vb, Pb, Ulb, Vlb, jxxb, jxyb, jyxb, jyyb, mbb,
              bxl, byl, m1xl, m1yl, cl):
        def stag_rows(F):   # row-staggered view: half-block ICI halos
            top = jax.lax.ppermute(F[-H:], ax, fwd)
            bot = jax.lax.ppermute(F[:H], ax, bwd)
            return jnp.concatenate([top, F, bot], axis=0)

        stag_cols = lambda F: jnp.pad(F, ((0, 0), (H, H)))
        Ua, Va, Pa = stag_rows(Ub), stag_rows(Vb), stag_rows(Pb)
        Uc, Vc, Pc = stag_cols(Ub), stag_cols(Vb), stag_cols(Pb)
        with jax.enable_x64(False):
            return pl.pallas_call(
                _coupled_kernel(),
                grid=(nbx_loc, nby),
                in_specs=(band4 * 3) + [ctr] * 7 + [
                    pl.BlockSpec((1, 2 * _B, 2 * _B),
                                 lambda i, j: (i32(i), i32(0), i32(0)),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 2 * _B, 2 * _B),
                                 lambda i, j: (i32(j), i32(0), i32(0)),
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
            )(Ua, Ua, Uc, Uc, Va, Va, Vc, Vc, Pa, Pa, Pc, Pc,
              Ulb, Vlb, jxxb, jxyb, jyxb, jyyb, mbb,
              bxl, byl, m1xl, m1yl, cl)

    from jax.sharding import PartitionSpec as P
    dru, drv, drc = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(ax, None),) * 10 + (
            P(ax, None, None), P(None, None, None),
            P(ax, None), P(None, None), P(None, None)),
        out_specs=(P(ax, None),) * 3,
        check_vma=False,
    )(Up, Vp, Pp, Ulp, Vlp, jxx, jxy, jyx, jyy, mbp,
      jnp.asarray(bx), jnp.asarray(by), jnp.asarray(m1x),
      jnp.asarray(m1y), coef_arr)

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


def apply_kernel_choice() -> str:
    """Which fused-apply backend the dispatchers prefer for large
    single-chip f32/bf16 grids: ``SEM_TPU_APPLY_KERNEL`` ∈
    {``pallas`` (default), ``einsum``, ``dense``} — read at trace time like
    the other dispatch policies.  ``einsum`` selects the field-batched
    staggered-banded XLA variants (see ``apply_system_banded_xla``)."""
    import os
    return os.environ.get("SEM_TPU_APPLY_KERNEL", "pallas").strip().lower()


def pallas_wanted(grid: Grid2D, dtype) -> bool:
    """Whether a fused apply should route through the single-chip banded
    kernels (Pallas or einsum, per :func:`apply_kernel_choice`): large
    f32/bf16 grids, TPU backend, and no active multi-device mesh."""
    return (dtype != jnp.float64 and grid.N >= _PALLAS_MIN_N
            and jax.default_backend() == "tpu"
            and not _multichip_mesh_active()
            and apply_kernel_choice() != "dense")


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
    the banded kernel (Pallas or batched-einsum XLA, per
    ``SEM_TPU_APPLY_KERNEL``) for large f32/bf16 grids on single-chip TPU,
    the shard_map-wrapped kernel under a multi-device mesh, the XLA
    two-matmul path otherwise."""
    if pallas_wanted(grid, w.dtype):
        if apply_kernel_choice() == "einsum":
            return apply_system_banded_xla(grid, u, v, w, coef)
        return apply_system_pallas(grid, u, v, w, coef)
    mesh = sharded_pallas_mesh(grid, w.dtype)
    if mesh is not None:
        return apply_system_pallas_sharded(grid, u, v, w, coef, mesh=mesh)
    return ops.apply_system(grid, u, v, w, coef)


def coupled_pallas_wanted(grid: Grid2D, dtype) -> bool:
    """Whether the coupled saddle matvec should route through the Pallas
    kernel (same crossover policy as :func:`apply_system_best`)."""
    return pallas_wanted(grid, dtype)
