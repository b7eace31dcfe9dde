"""Boussinesq coupler drivers — capability parity with the reference's
sequential and parallel OpenMDAO couplers
(reference OpenMDAO/Boussinesq_SequentialCoupler.py:10-108,
OpenMDAO/Boussinesq_ParallelCoupler.py:12-121).

Solves the dimensionless steady Boussinesq equations on [0,L_x]×[0,L_y]::

    Re ([u,v]∘∇)[u,v] = -∇p + ∇²[u,v] + Gr/Re [0, T]
    ∇∘[u,v] = 0
    Pe [u,v]∘∇T = ∇²T

with isothermal vertical walls T(0,y)=+0.5, T(L_x,y)=-0.5, adiabatic
floor/ceiling, and no-slip velocity everywhere; Pe = Re·Pr, Gr = Ra/Pr.

``run`` is the single-program driver (the reference's sequential coupler);
``run_parallel`` runs the same MDA with both disciplines' element batches
sharded over a ``jax.sharding.Mesh`` — the TPU-native replacement of the
reference's 2-rank MPI ``ParallelGroup`` (disciplinary MPMD becomes SPMD
sharding + XLA collectives; SURVEY.md §2.4-2.5).
"""
from __future__ import annotations

import typing

import numpy as np

from sem_tpu.coupling.components import (ConvectionDiffusionComponent,
                                         NavierStokesComponent)
from sem_tpu.coupling.mda import BoussinesqMDA, CoupledState
from sem_tpu.models.convection_diffusion import ConvectionDiffusionSolver
from sem_tpu.models.navier_stokes import NavierStokesSolver

__all__ = ["run", "run_parallel", "build_coupled"]


def build_coupled(L_x: float, L_y: float,
                  Re=1.e3, Ra=1.e3, Pr=0.71,
                  P_cd=4, N_ex_cd=8, N_ey_cd=8,
                  P_ns=4, N_ex_ns=8, N_ey_ns=8,
                  mode="JNK",
                  mtol_nonlin=1e-9, AGi=8, AGr=0.8, AGc=0.2,
                  mtol_gmres=1e-10, restart=20,
                  mtol_internal=1e-13, mtol_precon=1e-4, iprint=True,
                  device_krylov=None):
    """Construct solvers, components, and the MDA for the Boussinesq problem.

    Parameter names and defaults mirror the reference coupler's ``run``
    signature (reference Boussinesq_SequentialCoupler.py:10-17); the two
    disciplines may use different polynomial orders and element counts
    (exploited by the study harness, reference study/Boussinesq_run.py:50-51).
    """
    cd = ConvectionDiffusionSolver(L_x=L_x, L_y=L_y, Pe=Re * Pr,
                                   P=P_cd, N_ex=N_ex_cd, N_ey=N_ey_cd,
                                   T_W=0.5, T_E=-0.5,
                                   mtol=mtol_internal)
    ns = NavierStokesSolver(L_x=L_x, L_y=L_y, Re=Re, Gr=Ra / Pr,
                            P=P_ns, N_ex=N_ex_ns, N_ey=N_ey_ns,
                            mtol=mtol_internal, mtol_newton=mtol_internal,
                            iprint=["NEWTON_suc"] if iprint else [])
    cd_comp = ConvectionDiffusionComponent(cd, ns)
    ns_comp = NavierStokesComponent(cd, ns)
    mda = BoussinesqMDA(cd_comp, ns_comp, mode=mode,
                        mtol_nonlin=mtol_nonlin,
                        AGi=AGi, AGr=AGr, AGc=AGc,
                        mtol_gmres=mtol_gmres, restart=restart,
                        mtol_precon=mtol_precon, iprint=iprint,
                        device_krylov=device_krylov)
    return cd, ns, mda


def run(points_plot: typing.Tuple[np.ndarray, np.ndarray],
        L_x: float, L_y: float,
        Re=1.e3, Ra=1.e3, Pr=0.71,
        P_cd=4, N_ex_cd=8, N_ey_cd=8,
        P_ns=4, N_ex_ns=8, N_ey_ns=8,
        mode="JNK",
        mtol_nonlin=1e-9, AGi=8, AGr=0.8, AGc=0.2,
        mtol_gmres=1e-10, restart=20,
        mtol_internal=1e-13, mtol_precon=1e-4, iprint=True,
        return_state=False, device_krylov=None):
    """Solve the coupled Boussinesq problem; return (T, u, v) at plot points.

    Signature parity with reference Boussinesq_SequentialCoupler.py:10-17
    (same physics parameters, per-discipline resolutions, coupling mode, and
    tolerance conventions).
    """
    cd, ns, mda = build_coupled(L_x, L_y, Re, Ra, Pr,
                                P_cd, N_ex_cd, N_ey_cd,
                                P_ns, N_ex_ns, N_ey_ns,
                                mode, mtol_nonlin, AGi, AGr, AGc,
                                mtol_gmres, restart, mtol_internal,
                                mtol_precon, iprint,
                                device_krylov=device_krylov)
    state = mda.solve()

    T_plot = cd._get_interpol(state.T, points_plot)
    u_plot = ns._get_interpol(state.u, points_plot)
    v_plot = ns._get_interpol(state.v, points_plot)
    if return_state:
        return T_plot, u_plot, v_plot, state, mda.stats
    return T_plot, u_plot, v_plot


def run_parallel(points_plot, L_x, L_y, *args, devices=None, **kwargs):
    """Sharded-execution variant of :func:`run`.

    The reference's parallel coupler distributes the CD and NS disciplines
    onto 2 MPI ranks and runs PETSc GMRES across them (reference
    Boussinesq_ParallelCoupler.py:70-121).  On TPU the same capability is a
    single SPMD program over a ``jax.sharding.Mesh``: both disciplines'
    element batches and grid fields are sharded over all devices (element-
    domain decomposition — more parallel than the reference's 2-way
    disciplinary split), collectives ride ICI, and results land fully
    replicated — so no final MPI gather is needed.
    """
    from sem_tpu.parallel import sharding as sh
    mesh = sh.make_mesh(devices=devices)
    with sh.use_mesh(mesh):
        return run(points_plot, L_x, L_y, *args, **kwargs)
