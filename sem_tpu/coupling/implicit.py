"""Implicit-differentiation adjoints of the coupled Boussinesq solve.

The reference implements only forward-mode coupled derivatives and raises on
reverse mode (reference ConvectionDiffusion_Component.py:45-46,
NavierStokes_Component.py:44-45).  This module is the capability *upgrade*
the BASELINE north star asks for ("pure-JAX fixed-point loops with
implicit-diff adjoints"): gradients of any functional of the converged
coupled state with respect to the physics parameters (Re, Ra, Pr, wall
temperatures), via the implicit-function theorem::

    F(x*, θ) = 0   ⇒   dJ/dθ = ∂J/∂θ − λᵀ ∂F/∂θ,   J_xᵀ λ = (∂J/∂x)ᵀ

The coupled residual ``F`` is re-expressed here as a *pure traced function*
of (state, params) — every operator in the framework is matrix-free and
jax-traceable, so the transposed Jacobian-vector products ``J_xᵀ v`` and
``∂F/∂θᵀ λ`` come from ``jax.vjp`` exactly (no hand-derived adjoints).  The
adjoint system is solved by flexible GMRES preconditioned by block-diagonal
fast-diagonalization solves (the FDM operator is self-adjoint).

Validated against finite differences in tests/test_implicit.py.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from sem_tpu import operators as ops
from sem_tpu.coupling.mda import _fgmres
from sem_tpu.interp import apply_transfer

__all__ = ["coupled_residual_fn", "solve_adjoint", "gradients"]


def coupled_residual_fn(cd, ns):
    """Pure coupled residual ``F(x_flat, params) -> r_flat``.

    ``params`` is a dict with (any of) ``Re``, ``Ra``, ``Pr``, ``T_W``,
    ``T_E`` as traced scalars.  Matches exactly the residual the MDA drives
    to zero (same operators, masks, pressure pin, cross-mesh transfers).
    """
    N_cd, N_ns = cd.N, ns.N
    mask_cd = cd._mask_dir
    mb, pin = ns._mask_bound, ns._mask_pin
    dir_u, dir_v = ns._dirichlet_u, ns._dirichlet_v
    mask_W = jnp.asarray(cd.grid.side_mask("W"))
    mask_E = jnp.asarray(cd.grid.side_mask("E"))

    def unpack(x):
        return (x[:N_cd], x[N_cd:N_cd + N_ns],
                x[N_cd + N_ns:N_cd + 2 * N_ns], x[N_cd + 2 * N_ns:])

    def F(x, params):
        T, u, v, p = unpack(x)
        Re = params["Re"]
        Pr = params["Pr"]
        Ra = params["Ra"]
        Pe = Re * Pr
        GrRe = Ra / Pr / Re
        T_W = params.get("T_W", 0.5)
        T_E = params.get("T_E", -0.5)

        # CD residual on the CD grid
        u_cd = apply_transfer(ns.grid, cd.grid, u)
        v_cd = apply_transfer(ns.grid, cd.grid, v)
        rT = Pe * ops.apply_convection(cd.grid, u_cd, v_cd, T) \
            + ops.apply_stiffness(cd.grid, T)
        dirichlet = jnp.where(mask_W, T_W, 0.0) + jnp.where(mask_E, T_E, 0.0)
        rT = jnp.where(mask_cd, T - dirichlet, rT)

        # NS residual on the NS grid
        T_ns = apply_transfer(cd.grid, ns.grid, T)
        conv = lambda w: ops.apply_stiffness(ns.grid, w) \
            + Re * ops.apply_convection(ns.grid, u, v, w)
        ru = conv(u) + ops.apply_grad_x(ns.grid, p)
        rv = conv(v) + ops.apply_grad_y(ns.grid, p) \
            - GrRe * ops.apply_mass(ns.grid, T_ns)
        rc = ops.apply_grad_x(ns.grid, u) + ops.apply_grad_y(ns.grid, v)
        ru = jnp.where(mb, u - dir_u, ru)
        rv = jnp.where(mb, v - dir_v, rv)
        rc = jnp.where(mb, ops.apply_stiffness(ns.grid, p), rc)
        rc = jnp.where(pin, p, rc)
        return jnp.concatenate([rT, ru, rv, rc])

    return F


def _block_fdm_precon(cd, ns):
    """Block-diagonal FDM preconditioner (self-adjoint, so it serves the
    transposed system as well)."""
    N_cd, N_ns = cd.N, ns.N
    mass = jnp.asarray(ns.grid.mass_diag)
    pin = ns._mask_pin

    @jax.jit
    def precon(r):
        rT = r[:N_cd]
        ru = r[N_cd:N_cd + N_ns]
        rv = r[N_cd + N_ns:N_cd + 2 * N_ns]
        rp = r[N_cd + 2 * N_ns:]
        zT = cd._fdm(rT)
        zu = ns._fdm(ru)
        zv = ns._fdm(rv)
        zp = jnp.where(pin, rp, rp / mass)
        return jnp.concatenate([zT, zu, zv, zp])

    return lambda r: np.asarray(precon(jnp.asarray(r)))


def solve_adjoint(cd, ns, x_star, gbar, params, atol=1e-10,
                  restart=60, maxiter=20000):
    """Solve the adjoint system ``J_xᵀ λ = gbar`` at the converged state."""
    F = coupled_residual_fn(cd, ns)
    x_star = jnp.asarray(x_star)
    params = {k: jnp.asarray(v, jnp.float64) for k, v in params.items()}
    _, vjp_x = jax.vjp(lambda x: F(x, params), x_star)
    mv = jax.jit(lambda lam: vjp_x(lam)[0])

    lam, iters, ok = _fgmres(
        lambda z: np.asarray(mv(jnp.asarray(z))),
        _block_fdm_precon(cd, ns),
        np.asarray(gbar), atol=atol * np.sqrt(gbar.shape[0]),
        restart=restart, maxiter=maxiter)
    if not ok:
        raise RuntimeError(f"adjoint FGMRES: no convergence in {iters} "
                           f"iterations")
    return jnp.asarray(lam), iters


def gradients(cd, ns, x_star, loss_fn, params, atol=1e-10):
    """Gradient of ``loss_fn(x)`` at the converged coupled state w.r.t. the
    physics parameters, by the implicit-function theorem.

    :param x_star: converged flat coupled state (from ``BoussinesqMDA``)
    :param loss_fn: traced scalar functional of the flat state
    :param params: dict of parameter values (``Re``, ``Ra``, ``Pr``, ...)
    :return: (loss value, dict of d loss / d param)
    """
    x_star = jnp.asarray(x_star)
    loss, gbar = jax.value_and_grad(loss_fn)(x_star)
    lam, _ = solve_adjoint(cd, ns, x_star, np.asarray(gbar), params,
                           atol=atol)

    F = coupled_residual_fn(cd, ns)
    pj = {k: jnp.asarray(v, jnp.float64) for k, v in params.items()}
    _, vjp_theta = jax.vjp(lambda th: F(x_star, th), pj)
    dtheta = vjp_theta(lam)[0]
    grads = {k: -float(v) for k, v in dtheta.items()}
    return float(loss), grads
