"""ctypes bindings to the native (C++) data-generation runtime.

The reference binds its Fortran units through numpy.f2py + gfortran
makefiles (SURVEY.md L4); here the native library is plain C++ with a C ABI,
built with g++ and loaded through ctypes — no binding generator.  The
library is built on first use (and cached); everything it provides also has
a pure-JAX implementation, so the native path is an accelerator/oracle, not
a hard dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB = os.path.join(_NATIVE_DIR, "libsympgpr_native.so")


class NativeUnavailable(RuntimeError):
    pass


def build(force: bool = False) -> str:
    """Build the native library (idempotent)."""
    if force or not os.path.exists(_LIB):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True, capture_output=True, text=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            detail = getattr(e, "stderr", str(e))
            raise NativeUnavailable(f"native build failed: {detail}") from e
    return _LIB


@lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    lib = ctypes.CDLL(build())
    d = ctypes.c_double
    i = ctypes.c_int
    pd = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    pi = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

    lib.sympgpr_ath.restype = d
    lib.sympgpr_ath.argtypes = [d, d]
    lib.sympgpr_compute_r.restype = d
    lib.sympgpr_compute_r.argtypes = [d, d, d]
    lib.sympgpr_fieldlines_integrate.restype = None
    lib.sympgpr_fieldlines_integrate.argtypes = [
        d, i, i, d, i, i, i, pd, pd, pd,
    ]
    lib.sympgpr_henon_sections.restype = None
    lib.sympgpr_henon_sections.argtypes = [
        d, d, d, d, i, i, i, pd, pd, pd, pi,
    ]
    return lib


def available() -> bool:
    try:
        _lib()
        return True
    except NativeUnavailable:
        return False


def fieldlines_integrate(
    eps: float, m: int, n: int, phase: float, nph: int, nsteps: int,
    z0: np.ndarray, r0: np.ndarray,
) -> np.ndarray:
    """Native twin of ``systems.tokamak.integrate_fieldlines``.

    z0: (npart, 3) [pth, th, ph]; returns (nsteps+1, npart, 3).
    """
    z0 = np.ascontiguousarray(z0, np.float64)
    r0 = np.ascontiguousarray(r0, np.float64)
    npart = z0.shape[0]
    out = np.empty((nsteps + 1, npart, 3), np.float64)
    _lib().sympgpr_fieldlines_integrate(
        eps, m, n, phase, nph, nsteps, npart, z0, r0, out
    )
    return out


def compute_r(pth: float, th: float, rstart: float = 0.3) -> float:
    return float(_lib().sympgpr_compute_r(pth, th, rstart))


def henon_sections(
    z0: np.ndarray, max_cuts: int, lam: float = 1.0, w1: float = 1.0,
    w2: float = 1.0, dt: float = 0.01, max_steps: int | None = None,
):
    """Native twin of ``systems.henon_heiles.integrate_sections``.

    Returns (cuts (max_cuts, npart, 4), tcuts, counts).
    """
    z0 = np.ascontiguousarray(z0, np.float64)
    npart = z0.shape[0]
    if max_steps is None:
        max_steps = int((max_cuts + 2) * 7.5 / dt)
    cuts = np.empty((max_cuts, npart, 4), np.float64)
    tcuts = np.empty((max_cuts, npart), np.float64)
    counts = np.empty(npart, np.int32)
    _lib().sympgpr_henon_sections(
        lam, w1, w2, dt, max_steps, max_cuts, npart, z0, cuts, tcuts, counts
    )
    return cuts, tcuts, counts
