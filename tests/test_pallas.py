"""Pallas fused system-apply kernel vs the XLA reference path."""
import numpy as np
import pytest
import jax.numpy as jnp

from sem_tpu import operators as ops
from sem_tpu.mesh import Grid2D
from sem_tpu.ops import apply_system_pallas

RNG = np.random.default_rng(21)


@pytest.mark.parametrize("P,Ne", [(4, 8), (7, 5)])
def test_pallas_apply_matches_xla(P, Ne):
    grid = Grid2D(P=P, N_ex=Ne, N_ey=Ne, L_x=1.0, L_y=1.3)
    u, v, w = (jnp.asarray(RNG.standard_normal(grid.N), jnp.float32)
               for _ in range(3))
    ref = np.asarray(ops.apply_system(grid, u, v, w, jnp.float32(7.5)))
    got = np.asarray(apply_system_pallas(grid, u, v, w, jnp.float32(7.5),
                                         True))  # interpret mode on CPU
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got, ref, atol=2e-5 * scale)


def test_pallas_f64_fallback():
    grid = Grid2D(P=3, N_ex=3, N_ey=3, L_x=1.0, L_y=1.0)
    u, v, w = (jnp.asarray(RNG.standard_normal(grid.N)) for _ in range(3))
    ref = np.asarray(ops.apply_system(grid, u, v, w, 2.0))
    got = np.asarray(apply_system_pallas(grid, u, v, w, 2.0, True))
    np.testing.assert_allclose(got, ref, rtol=1e-12)
