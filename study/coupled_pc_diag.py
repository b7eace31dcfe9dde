"""Offline coupled-saddle preconditioner diagnostic.

Measures FGMRES iteration counts on the FULL coupled Newton saddle system
under the production-style block upper-triangular preconditioner
(velocity = exact inverse of the DIFFUSION-only masked block — the FDM
analog; pressure = candidate Schur inverse), at a strong O(1) recirculating
wind (lid Re=400 regime).

Round-3 findings (ROADMAP design notes): the ranking INVERTS between the
Schur block alone and the composition —

  * true-Schur alone (schur_spectrum.py --lid 400): pcd ~350 its,
    spectral+bb >3000;
  * coupled composition (this script):  spectral rel 1.3e-1 @2000 its,
    pcd rel 9.9e-1 @2000 its (NO progress).

So at convection dominance the bottleneck is the *composition with the
convection-less velocity inverse*, and Schur-alone quality does not
predict coupled quality.  Run: python study/coupled_pc_diag.py
"""
import os, sys
os.environ["JAX_PLATFORM_NAME"]="cpu"
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/study")
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla
from sem_tpu.mesh import Grid2D
from schur_spectrum import build_blocks

P, Ne, Re = 8, 8, 400.0
grid = Grid2D(P, Ne, Ne, 1.0, 1.0)
N = grid.N
if "--real" in sys.argv:
    # linearize at the ACTUAL converged lid-cavity solution (boundary-
    # layer-concentrated wind — the production operating point) instead
    # of the synthetic O(1) vortex (which is much harsher: production
    # spectral+f64 converges ~190 its on real Re=400 linearizations)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from sem_tpu import NavierStokesSolver
    ns = NavierStokesSolver(1.0, 1.0, Re=Re, Gr=0.0, P=P, N_ex=Ne,
                            N_ey=Ne, u_N=1.0, iprint=[])
    uj, vj, _ = ns._get_solution(jnp.zeros(N))
    u, v = np.asarray(uj), np.asarray(vj)
    print("wind: converged lid-cavity solution "
          f"(|u|max={np.abs(u).max():.3f})")
else:
    x, y = grid.points
    u = np.sin(np.pi*x)**2 * np.sin(2*np.pi*y)
    v = -np.sin(2*np.pi*x) * np.sin(np.pi*y)**2
    print("wind: synthetic O(1) vortex")
A, G, B, C, K, mb, pin = build_blocks(grid, Re=Re, u=u, v=v)
md, sd = grid.mass_diag, grid.stiff_diag

# full coupled matvec  [A G; B C]
def J_mv(q):
    du, dp = q[:2*N], q[2*N:]
    return np.concatenate([A @ du + G @ dp, B @ du + C @ dp])

# velocity preconditioner block: exact inverse of the DIFFUSION-only
# masked block (what FDM inverts; default), or of the FULL Newton velocity
# block A (--velo exact — upper bound on what any velocity solve can give)
if "--velo" in sys.argv and sys.argv[sys.argv.index("--velo") + 1] == "exact":
    lu_Kd = spla.splu(A.tocsc())
    print("velocity inverse: EXACT (full Newton A)")
else:
    Kd = build_blocks(grid, Re=Re, u=None, v=None)[0]  # [[K,0],[0,K]] masked
    lu_Kd = spla.splu(Kd.tocsc())
    print("velocity inverse: diffusion-only (FDM analog)")

# Schur candidates
Gxp = sp.kron(sp.csr_matrix(grid.G1x), sp.diags(grid.m1y)).tocsr()
Gyp = sp.kron(sp.diags(grid.m1x), sp.csr_matrix(grid.G1y)).tocsr()
Fp = (K + Re*(sp.diags(u)@Gxp + sp.diags(v)@Gyp)).tocsr()
Kpin = K.tolil(copy=True); ip = int(np.where(pin)[0][0])
Kpin[ip,:] = 0.0; Kpin[ip,ip] = 1.0
lup = spla.splu(Kpin.tocsc())
def shat_pcd(rp):
    t = lup.solve(np.where(mb|pin, 0.0, rp))
    dp = (Fp @ t)/md
    dp = np.where(mb, rp/sd, dp)
    return np.where(pin, rp, dp)

import scipy.linalg
def _e_pencil(G1, m1):
    Ex = G1.T @ np.diag(1.0/m1) @ G1
    s = 1.0/np.sqrt(m1)
    A1 = (Ex*s[:,None])*s[None,:]; A1 = 0.5*(A1+A1.T)
    lam, Q = scipy.linalg.eigh(A1)
    return lam, s[:,None]*Q
ex, Zx = _e_pencil(grid.G1x, grid.m1x)
ey, Zy = _e_pencil(grid.G1y, grid.m1y)
lx = np.einsum("ij,ik,kj->j", Zx, grid.K1x, Zx)
ly = np.einsum("ij,ik,kj->j", Zy, grid.K1y, Zy)
esum = ex[:,None]+ey[None,:]; ksum = lx[:,None]+ly[None,:]
scale = np.max(np.abs(esum))
ginv = np.where(np.abs(esum) > 1e-14*scale, ksum/esum, 0.0)
ib = np.where(mb)[0]
K_bb_inv = np.linalg.inv(K[np.ix_(ib, ib)].toarray())
def shat_spec(rp):
    r_int = np.where(mb|pin, 0.0, rp).reshape(grid.Ngx, grid.Ngy)
    dp = (Zx @ (ginv*(Zx.T @ r_int @ Zy)) @ Zy.T).reshape(-1)
    dp = np.where(mb, rp/sd, dp)
    dp_b = K_bb_inv @ (rp[ib] - (K[ib] @ np.where(mb, 0.0, dp)))
    dp = dp.copy(); dp[ib] = dp_b
    return np.where(pin, rp, dp)

def make_pc(shat):
    def pc(r):
        ru2, rp = r[:2*N], r[2*N:]
        dp = shat(rp)
        gd = G @ dp
        duv = lu_Kd.solve(ru2 - gd)
        return np.concatenate([duv, dp])
    return pc

def fgmres_count(mv, pc, n, rtol=1e-8, maxiter=2000, restart=200):
    b = np.random.default_rng(3).standard_normal(n)
    bn = np.linalg.norm(b)
    x = np.zeros(n); it = 0
    while it < maxiter:
        r = b - mv(x); beta = np.linalg.norm(r)
        if beta <= rtol*bn: return it, beta/bn
        m = min(restart, maxiter-it)
        V = [r/beta]; Zs = []
        H = np.zeros((m+1, m)); g = np.zeros(m+1); g[0]=beta
        cs = np.zeros(m); sn = np.zeros(m); kk=0
        for k in range(m):
            z = pc(V[k]); w = mv(z); Zs.append(z)
            for j in range(k+1):
                H[j,k] = V[j] @ w; w = w - H[j,k]*V[j]
            H[k+1,k] = np.linalg.norm(w); V.append(w/max(H[k+1,k],1e-300))
            for j in range(k):
                t1 = cs[j]*H[j,k]+sn[j]*H[j+1,k]
                t2 = -sn[j]*H[j,k]+cs[j]*H[j+1,k]
                H[j,k],H[j+1,k] = t1,t2
            d = np.hypot(H[k,k],H[k+1,k]); cs[k],sn[k]=H[k,k]/d,H[k+1,k]/d
            H[k,k]=d; H[k+1,k]=0
            g[k+1]=-sn[k]*g[k]; g[k]=cs[k]*g[k]; it+=1; kk=k+1
            if abs(g[k+1]) <= rtol*bn: break
        yv = np.linalg.solve(np.triu(H[:kk,:kk]), g[:kk])
        x = x + np.stack(Zs[:kk], axis=1) @ yv
    r = b - mv(x)
    return it, np.linalg.norm(r)/bn

for name, shat in (("spectral", shat_spec), ("pcd", shat_pcd)):
    it, res = fgmres_count(J_mv, make_pc(shat), 3*N)
    print(f"coupled pc[{name}]: iters={it} rel={res:.2e}", flush=True)
