"""Pallas fused system-apply kernel vs the XLA reference path."""
import numpy as np
import pytest
import jax.numpy as jnp

from sem_tpu import operators as ops
from sem_tpu.mesh import Grid2D
from sem_tpu.ops import apply_system_pallas

RNG = np.random.default_rng(21)


@pytest.mark.parametrize("P,Ne", [(4, 8), (7, 5), (7, 40)])
def test_pallas_apply_matches_xla(P, Ne):
    grid = Grid2D(P=P, N_ex=Ne, N_ey=Ne, L_x=1.0, L_y=1.3)
    u, v, w = (jnp.asarray(RNG.standard_normal(grid.N), jnp.float32)
               for _ in range(3))
    ref = np.asarray(ops.apply_system(grid, u, v, w, jnp.float32(7.5)))
    got = np.asarray(apply_system_pallas(grid, u, v, w, jnp.float32(7.5),
                                         True))  # interpret mode on CPU
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got, ref, atol=2e-5 * scale)


@pytest.mark.parametrize("P,Ne", [(4, 8), (7, 5), (7, 40), (16, 16)])
def test_banded_xla_apply_matches_dense(P, Ne):
    """The batched-einsum staggered-banded apply (pure XLA) matches the
    dense two-matmul reference path on every grid shape class (non-square
    blocks, multi-block, p16)."""
    from sem_tpu.ops.pallas_kernels import apply_system_banded_xla
    grid = Grid2D(P=P, N_ex=Ne, N_ey=Ne, L_x=1.0, L_y=1.3)
    u, v, w = (jnp.asarray(RNG.standard_normal(grid.N), jnp.float32)
               for _ in range(3))
    ref = np.asarray(ops.apply_system(grid, u, v, w, jnp.float32(7.5)))
    got = np.asarray(apply_system_banded_xla(grid, u, v, w,
                                             jnp.float32(7.5)))
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got, ref, atol=2e-5 * scale)


@pytest.mark.parametrize("P,Ne", [(4, 8), (7, 5), (7, 40)])
def test_pallas_coupled_matches_xla(P, Ne):
    """The fused coupled saddle matvec kernel matches the operator-level
    composition (the NS tangent rows, reference NavierStokes_Solver.py
    :138-160, pin row excluded)."""
    from sem_tpu.ops import apply_coupled_system_pallas

    grid = Grid2D(P=P, N_ex=Ne, N_ey=Ne, L_x=1.0, L_y=1.3)
    N = grid.N
    f32 = jnp.float32
    q = jnp.asarray(RNG.standard_normal(3 * N), f32)
    ul, vl = (jnp.asarray(RNG.standard_normal(N), f32) for _ in range(2))
    jac = tuple(jnp.asarray(RNG.standard_normal(N), f32) for _ in range(4))
    mb_np = np.zeros(N, bool)
    mb_np[RNG.choice(N, size=N // 7, replace=False)] = True
    mb = jnp.asarray(mb_np)
    Re = f32(37.0)

    du, dv, dp = q[:N], q[N:2 * N], q[2 * N:]

    def sysapply(w):
        return (ops.apply_stiffness(grid, w)
                + Re * ops.apply_convection(grid, ul, vl, w))

    jxx, jxy, jyx, jyy = jac
    dru = sysapply(du) + jxx * du + jxy * dv + ops.apply_grad_x(grid, dp)
    drv = sysapply(dv) + jyx * du + jyy * dv + ops.apply_grad_y(grid, dp)
    drc = ops.apply_grad_x(grid, du) + ops.apply_grad_y(grid, dv)
    dru = jnp.where(mb, du, dru)
    drv = jnp.where(mb, dv, drv)
    drc = jnp.where(mb, ops.apply_stiffness(grid, dp), drc)
    ref = np.asarray(jnp.concatenate([dru, drv, drc]))

    got = np.asarray(apply_coupled_system_pallas(grid, q, ul, vl, jac,
                                                 mb, Re, True))
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got, ref, atol=2e-5 * scale)


@pytest.mark.parametrize("P,Ne", [(4, 8), (7, 5), (7, 40), (16, 16)])
def test_banded_xla_coupled_matches_composition(P, Ne):
    """The field-batched einsum coupled matvec matches the operator-level
    composition (same reference as the Pallas kernel's parity test)."""
    from sem_tpu.ops.pallas_kernels import apply_coupled_system_banded_xla

    grid = Grid2D(P=P, N_ex=Ne, N_ey=Ne, L_x=1.0, L_y=1.3)
    N = grid.N
    f32 = jnp.float32
    q = jnp.asarray(RNG.standard_normal(3 * N), f32)
    ul, vl = (jnp.asarray(RNG.standard_normal(N), f32) for _ in range(2))
    jac = tuple(jnp.asarray(RNG.standard_normal(N), f32) for _ in range(4))
    mb_np = np.zeros(N, bool)
    mb_np[RNG.choice(N, size=N // 7, replace=False)] = True
    mb = jnp.asarray(mb_np)
    Re = f32(37.0)

    du, dv, dp = q[:N], q[N:2 * N], q[2 * N:]

    def sysapply(w):
        return (ops.apply_stiffness(grid, w)
                + Re * ops.apply_convection(grid, ul, vl, w))

    jxx, jxy, jyx, jyy = jac
    dru = sysapply(du) + jxx * du + jxy * dv + ops.apply_grad_x(grid, dp)
    drv = sysapply(dv) + jyx * du + jyy * dv + ops.apply_grad_y(grid, dp)
    drc = ops.apply_grad_x(grid, du) + ops.apply_grad_y(grid, dv)
    dru = jnp.where(mb, du, dru)
    drv = jnp.where(mb, dv, drv)
    drc = jnp.where(mb, ops.apply_stiffness(grid, dp), drc)
    ref = np.asarray(jnp.concatenate([dru, drv, drc]))

    got = np.asarray(apply_coupled_system_banded_xla(grid, q, ul, vl, jac,
                                                     mb, Re))
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got, ref, atol=2e-5 * scale)


def test_pallas_f64_fallback():
    grid = Grid2D(P=3, N_ex=3, N_ey=3, L_x=1.0, L_y=1.0)
    u, v, w = (jnp.asarray(RNG.standard_normal(grid.N)) for _ in range(3))
    ref = np.asarray(ops.apply_system(grid, u, v, w, 2.0))
    got = np.asarray(apply_system_pallas(grid, u, v, w, 2.0, True))
    np.testing.assert_allclose(got, ref, rtol=1e-12)
