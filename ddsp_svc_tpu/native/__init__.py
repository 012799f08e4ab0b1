"""ctypes binding for the native host DSP library (libddsp_native.so).

Builds on demand (`make -C ddsp_svc_tpu/native` or `ensure_built()`); all
entry points degrade gracefully to the JAX/numpy implementations when the
library is unavailable, so the framework never hard-depends on a compiler at
runtime.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libddsp_native.so")
_lib: Optional[ctypes.CDLL] = None


def ensure_built(quiet: bool = True) -> bool:
    """Build the library if missing. Returns availability."""
    if os.path.isfile(_LIB_PATH):
        return True
    try:
        subprocess.run(
            ["make", "-C", _DIR],
            check=True,
            capture_output=quiet,
        )
    except Exception:
        return False
    return os.path.isfile(_LIB_PATH)


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB_PATH) and not ensure_built():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.extract_f0_nccf.restype = ctypes.c_int64
    lib.extract_f0_nccf.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.extract_volume.restype = ctypes.c_int64
    lib.extract_volume.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def extract_f0_native(
    audio: np.ndarray, sample_rate: float, hop: float,
    f0_min: float, f0_max: float, win: int,
) -> Optional[np.ndarray]:
    """NCCF pitch track; None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    n_frames = int(len(audio) // hop) + 1
    out = np.zeros(n_frames, dtype=np.float32)
    rc = lib.extract_f0_nccf(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(audio),
        float(sample_rate), float(hop), float(f0_min), float(f0_max), int(win),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_frames,
    )
    return out if rc == n_frames else None


def extract_volume_native(audio: np.ndarray, hop: float) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    n_frames = int(len(audio) // hop) + 1
    out = np.zeros(n_frames, dtype=np.float32)
    rc = lib.extract_volume(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(audio),
        float(hop),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_frames,
    )
    return out if rc == n_frames else None
