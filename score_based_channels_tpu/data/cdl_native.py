"""ctypes bindings for the native (C++/OpenMP) CDL generator.

Compiles native/cdl_gen.cc on first use (g++ -O3 -fopenmp, cached as a
shared object next to the source) and exposes the same interface as
cdl.generate_cdl_channels. Falls back gracefully: callers should catch
NativeUnavailable and use the JAX backend.

Statistical parity with the JAX backend is tested (same model, different
RNG streams ⇒ moment-level agreement, not bitwise).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from .cdl import CDL_PROFILES

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "cdl_gen.cc")
_SO = os.path.join(_NATIVE_DIR, "libcdl_gen.so")

_lib: Optional[ctypes.CDLL] = None


class NativeUnavailable(RuntimeError):
    pass


def _build() -> None:
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", str(e))
        raise NativeUnavailable(f"cannot build native CDL generator: {detail}")


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or (os.path.exists(_SRC) and
                                   os.path.getmtime(_SO)
                                   < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.cdl_generate.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.cdl_generate.restype = None
    lib.cdl_num_threads.restype = ctypes.c_int
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except NativeUnavailable:
        return False


def generate_cdl_channels_native(
    seed: int,
    profile: str = "CDL-C",
    num_channels: int = 200,
    num_rx: int = 16,
    num_tx: int = 64,
    spacing: float = 0.5,
    delay_spread_s: float = 30e-9,
    subcarrier_hz: float = 15e3,
    num_subcarriers: int = 10,
    subcarrier_gap: int = 24,
) -> np.ndarray:
    """Native backend of data.cdl.generate_cdl_channels → (N, S, Nr, Nt)."""
    lib = _load()
    prof = CDL_PROFILES[profile]
    rows = np.ascontiguousarray(prof.rows, np.float64)
    out = np.empty(num_channels * num_subcarriers * num_rx * num_tx * 2,
                   np.float32)
    lib.cdl_generate(
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rows.shape[0], int(prof.los), float(prof.c_zsd), float(prof.c_zsa),
        num_channels, num_rx, num_tx, float(spacing), float(delay_spread_s),
        float(subcarrier_hz), num_subcarriers, subcarrier_gap,
        ctypes.c_uint64(seed),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    ri = out.reshape(num_channels, num_subcarriers, num_rx, num_tx, 2)
    return (ri[..., 0] + 1j * ri[..., 1]).astype(np.complex64)
