"""shard_map-wrapped Pallas kernels on the virtual 8-device CPU mesh.

The bare fused kernels are gated off under a multi-device mesh (a
``pallas_call`` inside a GSPMD-partitioned program gets replicated — VERDICT
r2 missing-item #1); the ``*_sharded`` variants re-enable them via manual
SPMD: row strips + half-block ICI halo exchange (``lax.ppermute``) + a local
``pallas_call`` per device (ROADMAP r4 #4).  Interpret mode makes them
testable here without multi-chip TPU hardware; the kernel body is identical
to the single-chip one, so numerical parity + HLO structure are the
meaningful assertions.
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sem_tpu import operators as ops
from sem_tpu.mesh import Grid2D
from sem_tpu.parallel.sharding import make_mesh, use_mesh
from sem_tpu.ops import (apply_system_pallas_sharded,
                         apply_coupled_system_pallas_sharded,
                         apply_coupled_system_pallas,
                         sharded_pallas_mesh)

RNG = np.random.default_rng(11)


def _rand(n, dt=jnp.float32):
    return jnp.asarray(RNG.standard_normal(n), dt)


@pytest.mark.parametrize("nex,ney", [(8, 4),   # nbx=1 -> padded to 8 blocks
                                     (70, 2)])  # nbx=3 -> padded to 8 blocks
def test_sharded_system_apply_parity(nex, ney):
    """Sharded fused apply == XLA apply on the 8-device mesh (f32 roundoff)."""
    grid = Grid2D(P=4, N_ex=nex, N_ey=ney, L_x=1.0, L_y=1.0)
    mesh = make_mesh()
    u, v, w = _rand(grid.N), _rand(grid.N), _rand(grid.N)
    ref = np.asarray(ops.apply_system(grid, u, v, w, 3.0))
    got = np.asarray(apply_system_pallas_sharded(
        grid, u, v, w, 3.0, mesh=mesh, interpret=True))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=3e-6 * scale)


def test_sharded_coupled_apply_parity():
    """Sharded coupled saddle matvec == the single-chip Pallas kernel."""
    grid = Grid2D(P=4, N_ex=8, N_ey=4, L_x=1.0, L_y=1.0)
    mesh = make_mesh()
    N = grid.N
    q = _rand(3 * N)
    ul, vl = _rand(N), _rand(N)
    jac = tuple(_rand(N) for _ in range(4))
    mb = jnp.asarray(RNG.random(N) < 0.2, jnp.float32)
    ref = np.asarray(apply_coupled_system_pallas(
        grid, q, ul, vl, jac, mb, 2.5, True))
    got = np.asarray(apply_coupled_system_pallas_sharded(
        grid, q, ul, vl, jac, mb, 2.5, mesh=mesh, interpret=True))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=3e-6 * scale)


def test_sharded_coupled_hlo_structure():
    """The compiled sharded matvec communicates by halo exchange, not by
    gathering operands: collective-permutes present, and every all-gather is
    output-assembly-sized (the three unpadded result fields) — never a
    padded-operand gather (the failure mode the mesh gate guards against).
    """
    grid = Grid2D(P=4, N_ex=8, N_ey=4, L_x=1.0, L_y=1.0)
    mesh = make_mesh()
    N = grid.N
    f = jax.jit(functools.partial(apply_coupled_system_pallas_sharded,
                                  grid, mesh=mesh, interpret=True))
    s = jax.ShapeDtypeStruct((N,), jnp.float32)
    hlo = f.lower(jax.ShapeDtypeStruct((3 * N,), jnp.float32),
                  s, s, (s, s, s, s), s, 2.5).compile().as_text()

    assert "collective-permute" in hlo, "halo exchange missing"

    # padded per-field operand is (nbx_sh*B, Cy) elements; any all-gather
    # at that size would mean GSPMD is re-assembling operands per matvec
    import sem_tpu.ops.pallas_kernels as pk
    ndev = mesh.devices.size
    padded_elems = pk._sharded_nbx(grid, ndev) * pk._B * (
        (-(-grid.Ngy // pk._B) + 2) * pk._B)
    import re
    gathers = re.findall(r"= \S*f32\[([\d,]+)\][^=]* all-gather\(", hlo)
    for shape in gathers:
        elems = int(np.prod([int(d) for d in shape.split(",")]))
        assert elems <= 2 * N, \
            f"operand-sized all-gather ({shape}) in sharded matvec HLO"
    assert len(gathers) <= 3, "more all-gathers than output fields"


def test_sharded_dispatch_selection(monkeypatch):
    """``sharded_pallas_mesh`` selects the manual-SPMD variant exactly when a
    1D multi-device mesh is active on a Pallas-sized TPU grid."""
    import sem_tpu.ops.pallas_kernels as pk

    grid = Grid2D(P=4, N_ex=8, N_ey=4, L_x=1.0, L_y=1.0)
    monkeypatch.setattr(pk, "_PALLAS_MIN_N", 1)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    assert sharded_pallas_mesh(grid, jnp.float32) is None  # no mesh
    mesh = make_mesh()
    with use_mesh(mesh):
        assert sharded_pallas_mesh(grid, jnp.float32) is mesh
        assert sharded_pallas_mesh(grid, jnp.float64) is None  # no f64
        # single-device mesh: bare kernel fine, sharded variant unwanted
        with use_mesh(make_mesh(devices=jax.devices()[:1])):
            assert sharded_pallas_mesh(grid, jnp.float32) is None
    # non-TPU backend: GSPMD XLA path instead
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    with use_mesh(mesh):
        assert sharded_pallas_mesh(grid, jnp.float32) is None
