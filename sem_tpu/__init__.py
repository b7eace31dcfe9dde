"""sem_tpu — a TPU-native (JAX/XLA/Pallas/pjit) spectral-element framework.

Re-designed from scratch with the capabilities of the reference Galerkin SEM
framework (Tangxiaotian11/SEM): Gauss-Legendre-Lobatto nodal bases, 2D
continuous-Galerkin tensor-product discretization, steady convection-diffusion
and Navier-Stokes (Boussinesq) solvers, and multidisciplinary coupling with
nonlinear Gauss-Seidel / Newton-block-Jacobi / block-Jacobi-preconditioned
Newton-Krylov MDA schemes.

Architectural differences from the reference (see SURVEY.md §7):

* **Matrix-free everywhere.** The reference eagerly assembles global SciPy CSR
  matrices and rank-3 sparse convection tensors (reference SEM.py:113-146,
  :226-245).  Here every operator is applied matrix-free: linear operators
  (mass/stiffness/gradient) exploit the global tensor-product structure
  ``A = A1x ⊗ M1y + M1x ⊗ A1y`` and are applied as two dense 1D matmuls on the
  field in grid form — MXU-shaped work; the nonlinear convection term is a
  batched per-element sum-factorization contraction plus a C0 scatter-add
  (``segment_sum``).
* **Fast-diagonalization direct solves** replace SuperLU (reference
  NavierStokes_Solver.py:184): on the uniform tensor-product mesh the
  Dirichlet-restricted Laplacian is inverted *exactly* by a generalized
  eigendecomposition per dimension and four dense matmuls per apply.
* **jit-compiled restarted GMRES** (``lax.while_loop``) replaces SciPy LGMRES
  (reference ConvectionDiffusion_Solver.py:146, NavierStokes_Solver.py:222).
* **Pure-JAX MDA couplers** replace OpenMDAO + MPI + PETSc (reference
  OpenMDAO/*); disciplinary fields shard over a ``jax.sharding.Mesh`` with XLA
  collectives instead of MPI messages.

float64 is enabled at import because the reference's Newton iterations
converge to 1e-13 rms residuals (reference NavierStokes_Solver.py:13);
all hot kernels also accept float32/bfloat16 inputs for speed benchmarking.
"""
import os as _os

import jax

jax.config.update("jax_enable_x64", True)

# The solver megakernels (nested Krylov under jit) compile in minutes on TPU;
# the persistent compilation cache makes every later process start instantly.
# Override the location with SEM_TPU_CACHE_DIR; disable with SEM_TPU_CACHE=0.
if _os.environ.get("SEM_TPU_CACHE", "1") != "0":
    jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("SEM_TPU_CACHE_DIR",
                        _os.path.expanduser("~/.cache/sem_tpu_jax")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sem_tpu import gll
from sem_tpu.mesh import Grid2D
from sem_tpu import operators
from sem_tpu.krylov import gmres, cg
from sem_tpu.fdm import FDM2D
from sem_tpu.models.convection_diffusion import ConvectionDiffusionSolver
from sem_tpu.models.navier_stokes import NavierStokesSolver

__version__ = "0.1.0"

__all__ = [
    "gll",
    "Grid2D",
    "operators",
    "gmres",
    "cg",
    "FDM2D",
    "ConvectionDiffusionSolver",
    "NavierStokesSolver",
]
