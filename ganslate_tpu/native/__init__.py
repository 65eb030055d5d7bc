"""Native (C++) data-plane kernels with transparent numpy fallback.

`libdataops.so` is built from dataops.cpp (see Makefile; `make native` or the
first import builds it automatically when a compiler is present). All entry
points here accept/return numpy arrays and silently fall back to numpy when
the shared library is unavailable, so the framework never hard-depends on a
toolchain at runtime.
"""

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_DIR = Path(__file__).resolve().parent
_SO_PATH = _DIR / "libdataops.so"
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    src = _DIR / "dataops.cpp"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", str(src), "-o", str(_SO_PATH)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        logger.debug(f"native dataops build failed ({e}); using numpy fallback")
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _SO_PATH.exists():
        src = _DIR / "dataops.cpp"
        if not (src.exists() and _build()):
            return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
    except OSError:
        return None

    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_ubyte)
    f64p = ctypes.POINTER(ctypes.c_double)
    i64 = ctypes.c_int64

    lib.clip_minmax_normalize_f32.argtypes = [f32p, f32p, i64,
                                              ctypes.c_float, ctypes.c_float]
    lib.mean_std_f32.argtypes = [f32p, i64, f64p, f64p]
    lib.zscore_normalize_f32.argtypes = [f32p, f32p, i64, ctypes.c_float,
                                         ctypes.c_float, ctypes.c_int,
                                         ctypes.c_float, ctypes.c_float,
                                         ctypes.c_float, ctypes.c_float]
    lib.extract_patch_f32.argtypes = [f32p, f32p] + [i64] * 9
    lib.masked_fill_f32.argtypes = [f32p, u8p, f32p, i64, ctypes.c_float]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _f32(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float32)


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def clip_minmax_normalize(array, lo: float, hi: float) -> np.ndarray:
    """2 * (clip(x, lo, hi) - lo) / (hi - lo) - 1, multithreaded."""
    lib = _load()
    x = _f32(array)
    if lib is None:
        x = np.clip(x, lo, hi)
        return (2 * (x - lo) / (hi - lo) - 1).astype(np.float32)
    out = np.empty_like(x)
    lib.clip_minmax_normalize_f32(_ptr(x), _ptr(out), x.size,
                                  ctypes.c_float(lo), ctypes.c_float(hi))
    return out


def mean_std(array) -> Tuple[float, float]:
    lib = _load()
    x = _f32(array)
    if lib is None:
        return float(x.mean()), float(x.std())
    mean = ctypes.c_double()
    std = ctypes.c_double()
    lib.mean_std_f32(_ptr(x), x.size, ctypes.byref(mean), ctypes.byref(std))
    return mean.value, std.value


def z_score_normalize(array, scale_to_range=None) -> np.ndarray:
    """Native z-score normalization (optionally scaled to a range)."""
    lib = _load()
    x = _f32(array)
    if lib is None:
        from ganslate_tpu.data.utils import normalization
        return normalization.z_score_normalize(x, scale_to_range)
    mean, std = mean_std(x)
    out = np.empty_like(x)
    if scale_to_range:
        # Source scale: the z-scored volume min/max.
        smin = (float(x.min()) - mean) / std
        smax = (float(x.max()) - mean) / std
        lib.zscore_normalize_f32(_ptr(x), _ptr(out), x.size,
                                 ctypes.c_float(mean), ctypes.c_float(std), 1,
                                 ctypes.c_float(smin), ctypes.c_float(smax),
                                 ctypes.c_float(scale_to_range[0]),
                                 ctypes.c_float(scale_to_range[1]))
    else:
        lib.zscore_normalize_f32(_ptr(x), _ptr(out), x.size,
                                 ctypes.c_float(mean), ctypes.c_float(std), 0,
                                 0, 0, 0, 0)
    return out


def extract_patch(volume, start, size) -> np.ndarray:
    """Copy a 3D patch (multithreaded plane memcpy)."""
    lib = _load()
    z, y, x = (int(v) for v in start)
    dz, dy, dx = (int(v) for v in size)
    if lib is None or volume.dtype != np.float32 or not volume.flags.c_contiguous \
            or volume.ndim != 3:
        return np.ascontiguousarray(volume[z:z + dz, y:y + dy, x:x + dx])
    out = np.empty((dz, dy, dx), np.float32)
    lib.extract_patch_f32(_ptr(volume), _ptr(out), *volume.shape, z, y, x,
                          dz, dy, dx)
    return out


def masked_fill(array, mask, fill: float) -> np.ndarray:
    """where(mask, array, fill), multithreaded (body-mask application)."""
    lib = _load()
    x = _f32(array)
    if lib is None:
        return np.where(mask, x, np.float32(fill))
    m = np.ascontiguousarray(mask != 0, dtype=np.uint8)
    out = np.empty_like(x)
    lib.masked_fill_f32(_ptr(x), m.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                        _ptr(out), x.size, ctypes.c_float(fill))
    return out
