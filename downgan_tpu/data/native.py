"""ctypes bindings for the native data-layer kernels (``native/cfdecode.cpp``).

Compiled with g++ at first use into ``~/.cache/downgan_tpu/native`` (or
``DOWNGAN_NATIVE_DIR``); all entry points fall back to numpy when no
toolchain is available, so the native layer is an accelerator, never a
requirement. See the .cpp header for why this exists.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "cfdecode.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("DOWNGAN_DISABLE_NATIVE") == "1":
        return None
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    cache = os.environ.get(
        "DOWNGAN_NATIVE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "downgan_tpu", "native"),
    )
    os.makedirs(cache, exist_ok=True)
    lib_path = os.path.join(cache, "libcfdecode.so")
    if (not os.path.exists(lib_path)
            or os.path.getmtime(lib_path) < os.path.getmtime(src)):
        # Compile to a private temp path and rename into place: the cache
        # is shared (pod hosts on one home dir, multi-process tests), so a
        # direct -o to lib_path would let concurrent g++ runs interleave
        # writes into one .so — and a timeout-killed compile would leave a
        # partial file whose fresh mtime suppresses every later rebuild.
        # os.replace is atomic on one filesystem, and an already-dlopen'd
        # mapping is unaffected by the rename (unlike in-place truncation).
        tmp = f"{lib_path}.{os.getpid()}.tmp"
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, src],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, lib_path)
        except (OSError, subprocess.SubprocessError):
            return None
        finally:
            if os.path.exists(tmp):
                try:
                    os.remove(tmp)
                except OSError:
                    pass
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError:
        return None

    lib.cf_unpack_i16.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.c_size_t, ctypes.c_double,
        ctypes.c_double, ctypes.c_int16, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.cf_unpack_i8.argtypes = [
        ctypes.POINTER(ctypes.c_int8), ctypes.c_size_t, ctypes.c_double,
        ctypes.c_double, ctypes.c_int8, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.nan_moments.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_size_t),
    ]
    lib.standardize_inplace.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_size_t,
        ctypes.c_double, ctypes.c_double,
    ]
    lib.block_mean_coarsen.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_size_t, ctypes.c_size_t,
        ctypes.c_size_t, ctypes.c_size_t, ctypes.POINTER(ctypes.c_float),
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _build_and_load() is not None


def cf_unpack(
    raw: np.ndarray, scale: float, offset: float, fill: Optional[int]
) -> np.ndarray:
    """Unpack an int16/int8 CF payload to float32 (fill -> NaN)."""
    lib = _build_and_load()
    if lib is None or raw.dtype not in (np.int16, np.int8):
        # float64 intermediate, matching the native kernel and the generic
        # h5py decode path bit-for-bit regardless of g++ availability.
        out = (raw.astype(np.float64) * float(scale) + float(offset)).astype(np.float32)
        if fill is not None:
            out = np.where(raw == fill, np.float32(np.nan), out).astype(np.float32)
        return out
    raw = np.ascontiguousarray(raw)
    out = np.empty(raw.shape, np.float32)
    fn = lib.cf_unpack_i16 if raw.dtype == np.int16 else lib.cf_unpack_i8
    ctype = ctypes.c_int16 if raw.dtype == np.int16 else ctypes.c_int8
    fn(
        raw.ctypes.data_as(ctypes.POINTER(ctype)), raw.size,
        float(scale), float(offset),
        ctype(int(fill) if fill is not None else 0),
        1 if fill is not None else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def nan_moments(data: np.ndarray) -> Tuple[float, float, int]:
    """NaN-skipping (mean, std, count) — numpy.nanmean/nanstd semantics."""
    lib = _build_and_load()
    if lib is None or data.dtype != np.float32:
        return float(np.nanmean(data)), float(np.nanstd(data)), int(np.sum(~np.isnan(data)))
    data = np.ascontiguousarray(data)
    mean = ctypes.c_double()
    std = ctypes.c_double()
    count = ctypes.c_size_t()
    lib.nan_moments(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), data.size,
        ctypes.byref(mean), ctypes.byref(std), ctypes.byref(count),
    )
    return mean.value, std.value, int(count.value)


def standardize_inplace(data: np.ndarray, mean: float, std: float) -> np.ndarray:
    """In-place z-score of a float32 array; returns it (numpy fallback
    copies). The fallback replicates the C kernel's float32 math exactly
    — ``(x - float32(mean)) * float32(1/std)`` — so staged data is
    bit-identical whether or not a g++ toolchain is available (multihost
    pods may mix hosts with and without one)."""
    lib = _build_and_load()
    if lib is None or data.dtype != np.float32 or not data.flags.c_contiguous:
        m = np.float32(mean)
        s = np.float32(1.0 / float(std))
        return (np.asarray(data, np.float32) - m) * s
    lib.standardize_inplace(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), data.size,
        float(mean), 1.0 / float(std),
    )
    return data


def block_mean_coarsen(data: np.ndarray, factor: int) -> np.ndarray:
    """(T, H, W) float32 -> (T, H/f, W/f) block means."""
    lib = _build_and_load()
    t, h, w = data.shape
    if h % factor or w % factor:
        raise ValueError(f"spatial dims ({h},{w}) not divisible by {factor}")
    if lib is None or data.dtype != np.float32:
        return data.reshape(t, h // factor, factor, w // factor, factor).mean(
            axis=(2, 4)
        ).astype(np.float32)
    data = np.ascontiguousarray(data)
    out = np.empty((t, h // factor, w // factor), np.float32)
    lib.block_mean_coarsen(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), t, h, w, factor,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
