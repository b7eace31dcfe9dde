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
