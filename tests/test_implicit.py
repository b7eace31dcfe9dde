"""Implicit-diff adjoint tests: consistency of the pure coupled residual and
finite-difference validation of parameter gradients (SURVEY.md §7.3 item 5:
'validate adjoints by finite differences')."""
import numpy as np
import pytest
import jax.numpy as jnp

from sem_tpu.coupling import build_coupled
from sem_tpu.coupling.implicit import coupled_residual_fn, gradients

PARAMS = dict(Re=200.0, Ra=500.0, Pr=0.71)
KW = dict(P_cd=2, N_ex_cd=2, N_ey_cd=2, P_ns=2, N_ex_ns=3, N_ey_ns=3,
          mode="GS", mtol_nonlin=1e-11, mtol_internal=1e-13, iprint=False)


def _solve(params):
    cd, ns, mda = build_coupled(1.0, 1.0, Re=params["Re"], Ra=params["Ra"],
                                Pr=params["Pr"], **KW)
    s = mda.solve()
    x = np.concatenate([np.asarray(s.T), np.asarray(s.u),
                        np.asarray(s.v), np.asarray(s.p)])
    return cd, ns, x


def test_pure_residual_matches_mda_residual():
    """The traced F(x, θ) vanishes at the MDA's converged state."""
    cd, ns, x = _solve(PARAMS)
    F = coupled_residual_fn(cd, ns)
    r = np.asarray(F(jnp.asarray(x),
                     {k: jnp.asarray(v) for k, v in PARAMS.items()}))
    assert np.linalg.norm(r) / np.sqrt(r.size) < 1e-10


def test_solve_adjoint_default_converges_and_transposes():
    """Fast coverage of the adjoint SOLVER itself (the FD tests are slow):
    the default transposed-BGS preconditioner converges on a small
    JNK-converged state, and the returned λ satisfies the defining
    transposed system ``J_xᵀ λ = g`` (residual checked via an independent
    vjp).  Guards the rewritten pc path — at default settings the weak
    round-3 block-diagonal pc already stalled on states this mild."""
    from sem_tpu.coupling.implicit import solve_adjoint

    cd, ns, x = _solve(PARAMS)
    rng = np.random.default_rng(3)
    g = rng.standard_normal(x.size)
    lam, iters = solve_adjoint(cd, ns, x, g, PARAMS, atol=1e-10)

    F = coupled_residual_fn(cd, ns)
    pj = {k: jnp.asarray(v) for k, v in PARAMS.items()}
    import jax
    _, vjp_x = jax.vjp(lambda q: F(q, pj), jnp.asarray(x))
    r = np.asarray(vjp_x(jnp.asarray(lam))[0]) - g
    # convergence is tested in the solver's row-scaled norm; verify the
    # raw residual is small relative to the stiffness-row scale
    assert np.linalg.norm(r) <= 1e-6 * np.linalg.norm(g), \
        np.linalg.norm(r) / np.linalg.norm(g)
    assert iters < 2000


@pytest.mark.slow
@pytest.mark.parametrize("pname,rel_step", [("Ra", 1e-5), ("Re", 1e-5),
                                            ("Pr", 1e-5)])
def test_adjoint_gradient_vs_finite_difference(pname, rel_step):
    cd, ns, x = _solve(PARAMS)

    def loss_fn(xf):
        # mean kinetic-energy-like functional of the NS velocity
        u = xf[cd.N:cd.N + ns.N]
        v = xf[cd.N + ns.N:cd.N + 2 * ns.N]
        return jnp.sum(u**2 + v**2)

    loss, grads = gradients(cd, ns, x, loss_fn, PARAMS, atol=1e-12)

    h = PARAMS[pname] * rel_step
    pp = dict(PARAMS); pp[pname] += h
    pm = dict(PARAMS); pm[pname] -= h
    _, _, xp = _solve(pp)
    _, _, xm = _solve(pm)
    fd = (float(loss_fn(jnp.asarray(xp))) - float(loss_fn(jnp.asarray(xm)))) \
        / (2 * h)
    assert grads[pname] == pytest.approx(fd, rel=2e-4), (grads[pname], fd)


@pytest.mark.slow
def test_adjoint_gradient_at_ptc_converged_ra1e5():
    """Adjoint hardening at high Ra (VERDICT r3 #9): the gradient w.r.t. Ra
    at a PTC-converged Ra=1e5 state — a convection-dominated linearization
    where the round-3 convection-blind block-FDM preconditioner hits the
    same wall the forward solve did — validated against central finite
    differences (warm-started JNK re-solves).  Uses the convection-aware
    transposed-BGS preconditioner with ``inner_rtol=1e-4`` block solves."""
    PAR = dict(Re=1e3, Ra=1e5, Pr=0.71)
    KW5 = dict(P_cd=4, N_ex_cd=8, N_ey_cd=8, P_ns=4, N_ex_ns=16, N_ey_ns=16,
               mtol_nonlin=1e-10, mtol_internal=1e-13, iprint=False)
    from sem_tpu.coupling.mda import CoupledState

    cd, ns, mda = build_coupled(1.0, 1.0, mode="PTC", **PAR, **KW5)
    s = mda.solve()
    x = np.concatenate([np.asarray(f) for f in (s.T, s.u, s.v, s.p)])

    def loss_fn(xf):
        u = xf[cd.N:cd.N + ns.N]
        v = xf[cd.N + ns.N:cd.N + 2 * ns.N]
        return jnp.sum(u**2 + v**2)

    loss, grads = gradients(cd, ns, x, loss_fn, PAR, atol=1e-11,
                            inner_rtol=1e-4)

    # central FD in Ra via warm-started JNK re-solves from the PTC state.
    # rel_step 1e-4 (not the easy test's 1e-5): the FD loss difference must
    # dominate the ~1e-5-grade state resolution of the re-solves (the
    # equal-order discretization's near-spurious modes cap state accuracy
    # well above the 1e-10 residual tolerance; measured agreement at this
    # step: ~2e-4 relative, vs ~2.5e-3 at rel_step 1e-5 where the FD noise
    # floor dominates)
    h = PAR["Ra"] * 1e-4
    vals = {}
    for sgn in (+1, -1):
        pp = dict(PAR)
        pp["Ra"] += sgn * h
        _, _, mda_p = build_coupled(1.0, 1.0, mode="JNK", **pp, **KW5)
        sp = mda_p.solve(CoupledState(s.T, s.u, s.v, s.p))
        vals[sgn] = float(loss_fn(jnp.concatenate(
            [sp.T, sp.u, sp.v, sp.p])))
    fd = (vals[+1] - vals[-1]) / (2 * h)
    assert grads["Ra"] == pytest.approx(fd, rel=1e-3), (grads["Ra"], fd)
