"""Offline spectral study of the NS pressure-Schur complement.

Forms the exact dense coupled Jacobian blocks of the (Boussinesq) NS system
in the Stokes limit — the same masked rows as ``NavierStokesSolver``'s
``dres`` (velocity Dirichlet identity rows, artificial ``∂ₙp=0`` stiffness
rows, pressure pin; reference NavierStokes_Solver.py:114-119, :176-212) —
eliminates the velocity block exactly, and measures how candidate Schur-block
preconditioners condition the pressure system across resolutions.

Motivation (round 2): the diagonal-GLL-mass Schur preconditioner (the
reference's, :208-212) degrades from ~20 to ~3000 GMRES iterations between
P=4 8x8 and p=16 64x64 — this script identifies the mechanism (equal-order
P_N-P_N inf-sup decay vs boundary-row scaling vs convection) and ranks the
fixes offline, where the Schur matrix is small enough to study densely.

Usage:  python study/schur_spectrum.py [P Ne [P Ne ...]]
"""
import sys
import os

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from sem_tpu.mesh import Grid2D


def build_blocks(grid: Grid2D, Re=1e3, u=None, v=None):
    """Dense/sparse blocks of the coupled Jacobian with the solver's masks."""
    N = grid.N
    m1x, m1y = grid.m1x, grid.m1y
    Dx = sp.kron(sp.csr_matrix(grid.K1x), sp.diags(m1y))
    Dy = sp.kron(sp.diags(m1x), sp.csr_matrix(grid.K1y))
    K = (Dx + Dy).tocsr()
    Gx = sp.kron(sp.csr_matrix(grid.G1x), sp.diags(m1y)).tocsr()
    Gy = sp.kron(sp.diags(m1x), sp.csr_matrix(grid.G1y)).tocsr()
    M = sp.diags(grid.mass_diag).tocsr()

    mb = grid.boundary_mask
    pin = np.zeros(N, dtype=bool)
    pin[N // 2] = True

    Sys = K.copy()
    if u is not None:
        Sys = Sys + Re * (sp.diags(u) @ Gx + sp.diags(v) @ Gy)

    def zero_rows(A, mask):
        A = A.tolil(copy=True)
        A[np.where(mask)[0], :] = 0.0
        return A.tocsr()

    def identity_rows(A, mask):
        A = zero_rows(A, mask).tolil()
        idx = np.where(mask)[0]
        A[idx, idx] = 1.0
        return A.tocsr()

    # velocity block (2N x 2N) with Dirichlet identity rows
    Z = sp.csr_matrix((N, N))
    if u is not None:
        jxx = sp.diags(Re * np.asarray(Gx @ u))
        jxy = sp.diags(Re * np.asarray(Gy @ u))
        jyx = sp.diags(Re * np.asarray(Gx @ v))
        jyy = sp.diags(Re * np.asarray(Gy @ v))
    else:
        jxx = jxy = jyx = jyy = Z
    A = sp.bmat([[identity_rows(Sys + jxx, mb), zero_rows(jxy, mb)],
                 [zero_rows(jyx, mb), identity_rows(Sys + jyy, mb)]]).tocsr()
    # gradient block (2N x N): zero rows on Dirichlet nodes
    G = sp.vstack([zero_rows(Gx, mb), zero_rows(Gy, mb)]).tocsr()
    # divergence block (N x 2N): zero rows on mb | pin
    B = sp.hstack([zero_rows(Gx, mb | pin), zero_rows(Gy, mb | pin)]).tocsr()
    # pressure block: K rows on mb, identity on pin
    C = identity_rows(zero_rows(K, ~mb), pin).tocsr()
    return A, G, B, C, K, M, mb, pin


def schur_dense(A, G, B, C):
    lu = spla.splu(A.tocsc())
    AG = lu.solve(G.toarray())
    return C.toarray() - B @ AG


def gmres_count(S, Minv_apply, atol_rel=1e-10, maxiter=2000):
    """Right-preconditioned GMRES iteration count on S dp = b."""
    n = S.shape[0]
    b = np.random.default_rng(0).standard_normal(n)
    it = {"n": 0}

    def cb(_):
        it["n"] += 1

    Mop = spla.LinearOperator((n, n), matvec=Minv_apply)
    Sop = spla.LinearOperator((n, n), matvec=lambda x: S @ x)
    x, info = spla.gmres(Sop, b, M=Mop, rtol=atol_rel, atol=0.0,
                         restart=200, maxiter=max(1, maxiter // 200),
                         callback=cb, callback_type="pr_norm")
    res = np.linalg.norm(b - S @ x) / np.linalg.norm(b)
    return it["n"], res, info


def run_config(P, Ne, Re=1e3, with_wind=False):
    grid = Grid2D(P, Ne, Ne, 1.0, 1.0)
    N = grid.N
    u = v = None
    if with_wind:
        pts = grid.points
        u = 0.005 * np.sin(np.pi * pts[0]) * np.cos(np.pi * pts[1])
        v = -0.005 * np.cos(np.pi * pts[0]) * np.sin(np.pi * pts[1])
    A, G, B, C, K, M, mb, pin = build_blocks(grid, Re=Re, u=u, v=v)
    S = schur_dense(A, G, B, C)

    md = grid.mass_diag
    sd = grid.stiff_diag

    # --- candidate Schur preconditioners ---------------------------------
    def mass_inv(r):
        dp = r / md
        dp = np.where(mb, r / sd, dp)
        dp = np.where(pin, r, dp)
        return dp

    # BFBt / least-squares commutator:
    #   S^-1 ~ (B M^-1 G)^+ (B M^-1 A M^-1 G) (B M^-1 G)^+
    Minv2 = sp.diags(np.concatenate([1.0 / md, 1.0 / md]))
    BMG = (B @ Minv2 @ G).toarray()
    BMAMG = (B @ Minv2 @ A @ Minv2 @ G).toarray()
    BMG_pinv = np.linalg.pinv(BMG, rcond=1e-10)

    def bfbt_inv(r):
        return BMG_pinv @ (BMAMG @ (BMG_pinv @ r))

    # exact |diag(S)| scaling (tests whether pure row scaling is the issue)
    dS = np.abs(np.diag(S)) + 1e-300

    def diag_inv(r):
        return r / dS

    rows = []
    for name, Mi in (("mass", mass_inv), ("bfbt", bfbt_inv),
                     ("diagS", diag_inv)):
        # eigenvalues of the preconditioned Schur (right precon)
        SM = S @ np.array([Mi(e) for e in np.eye(N)]).T
        ev = np.linalg.eigvals(SM)
        ev = ev[np.abs(ev) > 1e-13 * np.abs(ev).max()]
        it, res, info = gmres_count(S, Mi)
        rows.append((name, it, res, np.abs(ev).min(), np.abs(ev).max(),
                     np.abs(ev).max() / np.abs(ev).min()))
    wind = "wind" if with_wind else "stokes"
    print(f"P={P} Ne={Ne} N={N} ({wind}):")
    for name, it, res, lo, hi, kappa in rows:
        print(f"  {name:6s} gmres_iters={it:5d} final_rel={res:.1e} "
              f"|ev| in [{lo:.3e}, {hi:.3e}]  spread={kappa:.2e}")
    return rows


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    configs = (list(zip(args[::2], args[1::2])) if args
               else [(4, 4), (4, 8), (4, 12), (8, 4), (8, 8)])
    for (P, Ne) in configs:
        run_config(P, Ne)
