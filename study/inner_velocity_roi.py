"""ROI of inner velocity-solve effort in the coupled block pc (real wind)."""
import os, sys
os.environ["JAX_PLATFORM_NAME"]="cpu"
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/study")
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla
from sem_tpu.mesh import Grid2D
from schur_spectrum import build_blocks
import scipy.linalg

P, Ne, Re = 8, 8, 400.0
grid = Grid2D(P, Ne, Ne, 1.0, 1.0)
N = grid.N
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from sem_tpu import NavierStokesSolver
ns = NavierStokesSolver(1.0, 1.0, Re=Re, Gr=0.0, P=P, N_ex=Ne, N_ey=Ne,
                        u_N=1.0, iprint=[])
uj, vj, _ = ns._get_solution(jnp.zeros(N))
u, v = np.asarray(uj), np.asarray(vj)
A, G, B, C, K, mb, pin = build_blocks(grid, Re=Re, u=u, v=v)
md, sd = grid.mass_diag, grid.stiff_diag
def J_mv(q):
    du, dp = q[:2*N], q[2*N:]
    return np.concatenate([A @ du + G @ dp, B @ du + C @ dp])
Kd = build_blocks(grid, Re=Re, u=None, v=None)[0]
lu_Kd = spla.splu(Kd.tocsc())

# spectral Schur block (+bb elimination), as production
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
def shat(rp):
    r_int = np.where(mb|pin, 0.0, rp).reshape(grid.Ngx, grid.Ngy)
    dp = (Zx @ (ginv*(Zx.T @ r_int @ Zy)) @ Zy.T).reshape(-1)
    dp = np.where(mb, rp/sd, dp)
    dp_b = K_bb_inv @ (rp[ib] - (K[ib] @ np.where(mb, 0.0, dp)))
    dp = dp.copy(); dp[ib] = dp_b
    return np.where(pin, rp, dp)

def velo_gmres(b2, steps):
    """steps of FDM(=Kd)-right-preconditioned GMRES on A duv = b2."""
    x = np.zeros(2*N); r = b2.copy(); beta = np.linalg.norm(r)
    if beta == 0: return x
    V=[r/beta]; Zs=[]; m=steps
    H=np.zeros((m+1,m)); g=np.zeros(m+1); g[0]=beta
    cs=np.zeros(m); sn=np.zeros(m); kk=0
    for k in range(m):
        z = lu_Kd.solve(V[k]); w = A @ z; Zs.append(z)
        for j in range(k+1):
            H[j,k]=V[j]@w; w=w-H[j,k]*V[j]
        H[k+1,k]=np.linalg.norm(w); V.append(w/max(H[k+1,k],1e-300))
        for j in range(k):
            t1=cs[j]*H[j,k]+sn[j]*H[j+1,k]; t2=-sn[j]*H[j,k]+cs[j]*H[j+1,k]
            H[j,k],H[j+1,k]=t1,t2
        d=np.hypot(H[k,k],H[k+1,k]); cs[k],sn[k]=H[k,k]/d,H[k+1,k]/d
        H[k,k]=d; H[k+1,k]=0; g[k+1]=-sn[k]*g[k]; g[k]=cs[k]*g[k]; kk=k+1
    yv=np.linalg.solve(np.triu(H[:kk,:kk]), g[:kk])
    return np.stack(Zs[:kk],axis=1)@yv

def make_pc(vsteps):
    def pc(r):
        ru2, rp = r[:2*N], r[2*N:]
        dp = shat(rp)
        b2 = ru2 - (G @ dp)
        duv = lu_Kd.solve(b2) if vsteps == 0 else velo_gmres(b2, vsteps)
        return np.concatenate([duv, dp])
    return pc

def fgmres_count(mv, pc, n, rtol=1e-4, maxiter=800, restart=200):
    b = np.random.default_rng(3).standard_normal(n); bn = np.linalg.norm(b)
    x = np.zeros(n); it = 0
    while it < maxiter:
        r = b - mv(x); beta = np.linalg.norm(r)
        if beta <= rtol*bn: return it, beta/bn
        m = min(restart, maxiter-it)
        V=[r/beta]; Zs=[]; H=np.zeros((m+1,m)); g=np.zeros(m+1); g[0]=beta
        cs=np.zeros(m); sn=np.zeros(m); kk=0
        for k in range(m):
            z = pc(V[k]); w = mv(z); Zs.append(z)
            for j in range(k+1):
                H[j,k]=V[j]@w; w=w-H[j,k]*V[j]
            H[k+1,k]=np.linalg.norm(w); V.append(w/max(H[k+1,k],1e-300))
            for j in range(k):
                t1=cs[j]*H[j,k]+sn[j]*H[j+1,k]; t2=-sn[j]*H[j,k]+cs[j]*H[j+1,k]
                H[j,k],H[j+1,k]=t1,t2
            d=np.hypot(H[k,k],H[k+1,k]); cs[k],sn[k]=H[k,k]/d,H[k+1,k]/d
            H[k,k]=d; H[k+1,k]=0; g[k+1]=-sn[k]*g[k]; g[k]=cs[k]*g[k]
            it+=1; kk=k+1
            if abs(g[k+1])<=rtol*bn: break
        yv=np.linalg.solve(np.triu(H[:kk,:kk]), g[:kk])
        x=x+np.stack(Zs[:kk],axis=1)@yv
    r=b-mv(x); return it, np.linalg.norm(r)/bn

# production forcing asks ~1e-3..1e-4 relative per Newton step
for vs in (0, 5, 20, 60):
    it, res = fgmres_count(J_mv, make_pc(vs), 3*N)
    tag = "plain-FDM" if vs == 0 else f"GMRES({vs})+FDM"
    print(f"velocity inner = {tag:14s}: outer_iters={it} rel={res:.2e}",
          flush=True)
