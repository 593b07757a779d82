"""ctypes bindings for the native host-side diagnostics library.

Loads ``native/libgptools_native.so`` (built with ``make -C native``) and
exposes numpy-level wrappers; every entry point has a pure-JAX fallback
(`gptools_tpu.utils.diagnostics`), so the native library is an optional
accelerator for large host-side chain archives, never a hard dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

__all__ = ["load", "build", "available", "ess_batch", "split_rhat_batch"]

_LIB: Optional[ctypes.CDLL] = None
_SEARCHED = False


def _native_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
    )


def _lib_path() -> str:
    return os.environ.get(
        "GPTOOLS_NATIVE_LIB",
        os.path.join(_native_dir(), "libgptools_native.so"),
    )


def build(quiet: bool = True) -> bool:
    """Build the native library with make; returns success."""
    try:
        subprocess.run(
            ["make", "-C", _native_dir()],
            check=True,
            capture_output=quiet,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load(auto_build: bool = False) -> Optional[ctypes.CDLL]:
    """Load (optionally building) the library; caches the handle."""
    global _LIB, _SEARCHED
    if _LIB is not None:
        return _LIB
    if _SEARCHED and not auto_build:
        return None
    _SEARCHED = True
    path = _lib_path()
    if not os.path.exists(path) and auto_build:
        build()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    i64 = ctypes.c_int64
    dptr = ctypes.POINTER(ctypes.c_double)
    lib.gpt_ess_batch.argtypes = [dptr, i64, i64, i64, i64, dptr]
    lib.gpt_ess_batch.restype = None
    lib.gpt_split_rhat_batch.argtypes = [dptr, i64, i64, i64, dptr]
    lib.gpt_split_rhat_batch.restype = None
    lib.gpt_abi_version.restype = ctypes.c_int
    if lib.gpt_abi_version() != 2:
        return None
    _LIB = lib
    return lib


def available() -> bool:
    return load() is not None


def _as_cmd(chains) -> np.ndarray:
    c = np.ascontiguousarray(np.asarray(chains, dtype=np.float64))
    if c.ndim == 2:
        c = c[None]
    if c.ndim != 3:
        raise ValueError("chains must be (num_chains, num_samples, dim)")
    return c


def ess_batch(chains, max_pairs: int = 64) -> np.ndarray:
    """Per-parameter ESS of (C, S, D) chains via the native library
    (falls back to the JAX implementation when not built).

    The native Geyer scan is lag-incremental with a ``max_pairs`` work
    budget: parameters whose autocorrelation stays positive past the budget
    (long-memory chains, where an O(n log n) FFT beats the O(n J) scan) are
    recomputed through the JAX FFT path, so the result is identical to
    `gptools_tpu.utils.diagnostics.ess_per_param` either way."""
    lib = load()
    c = _as_cmd(chains)
    if lib is None:
        from gptools_tpu.utils.diagnostics import ess_per_param

        return np.asarray(ess_per_param(c))
    m, n, d = c.shape
    out = np.empty((d,), np.float64)
    lib.gpt_ess_batch(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        m,
        n,
        d,
        max_pairs,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    bad = ~np.isfinite(out)
    if bad.any():  # budget exhausted for these params: JAX FFT fallback
        from gptools_tpu.utils.diagnostics import ess_per_param

        out[bad] = np.asarray(ess_per_param(c[:, :, bad]))
    return out


def split_rhat_batch(chains) -> np.ndarray:
    """Per-parameter split-R-hat of (C, S, D) chains via the native library
    (JAX fallback when not built)."""
    lib = load()
    c = _as_cmd(chains)
    if lib is None:
        from gptools_tpu.utils.diagnostics import split_rhat

        return np.asarray(split_rhat(c))
    m, n, d = c.shape
    out = np.empty((d,), np.float64)
    lib.gpt_split_rhat_batch(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        m,
        n,
        d,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out
