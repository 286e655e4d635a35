"""ctypes bindings for the native host-runtime kernels (native/rvc_host.cpp).

The TPU owns model compute; these C++ kernels own the host-side hot loops
around it: the conversion pipeline's peak-scan + int16 quantization of the
upload buffer, the dataset slicer's frame-RMS and its sequential silence
state machine (reference lib/slicer2.py:76-183 — the reference's own host
loops sit on ffmpeg/numpy/torch C cores).

``lib()`` returns the loaded library or None. The shared object is built
on demand with g++ (one translation unit, no dependencies) and cached
next to this file; every caller has a pure-numpy fallback, so a machine
without a toolchain loses nothing but speed. Set RVC_TPU_NO_NATIVE=1 to
force the fallbacks (used by tests to compare both paths).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "native",
                    "rvc_host.cpp")
_SO = os.path.join(_HERE, "librvc_host.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def ensure_built() -> str | None:
    """Compile the shared object if missing/stale; returns its path or None."""
    if not os.path.exists(_SRC):
        return _SO if os.path.exists(_SO) else None
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", _SO, _SRC],
                check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            return None
    return _SO


def lib() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried or os.environ.get("RVC_TPU_NO_NATIVE"):
        return None
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = ensure_built()
        if so is None:
            return None
        try:
            L = ctypes.CDLL(so)
        except OSError:
            return None
        i64, f32p, i16p, i64p = (ctypes.c_int64,
                                 ctypes.POINTER(ctypes.c_float),
                                 ctypes.POINTER(ctypes.c_int16),
                                 ctypes.POINTER(ctypes.c_int64))
        L.peak_quantize_i16.argtypes = [f32p, i64, i16p]
        L.peak_quantize_i16.restype = ctypes.c_double
        L.frame_rms.argtypes = [f32p, i64, i64, i64, f32p]
        L.frame_rms.restype = i64
        L.slicer_silence_tags.argtypes = [
            f32p, i64, ctypes.c_double, i64, i64, i64, i64p, i64]
        L.slicer_silence_tags.restype = i64
        L.dequantize_i16.argtypes = [i16p, i64, ctypes.c_double, f32p]
        L.dequantize_i16.restype = None
        _lib = L
        return _lib


def _f32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


# -- public API (native with numpy fallback) --------------------------------


def peak_quantize_i16(x: np.ndarray) -> tuple[np.ndarray, float]:
    """One-pass |x|.max() + rint(x·32766/peak) → (int16 array, peak)."""
    x = np.ascontiguousarray(x, np.float32)
    L = lib()
    if L is not None:
        out = np.empty(x.shape, np.int16)
        peak = L.peak_quantize_i16(
            _f32(x), x.size, out.ctypes.data_as(
                ctypes.POINTER(ctypes.c_int16)))
        return out, float(peak)
    peak = float(np.abs(x).max()) if x.size else 0.0
    scale = 32766.0 / max(peak, 1e-9)
    return np.rint(x * scale).astype(np.int16), peak


def frame_rms(y: np.ndarray, frame_length: int, hop_length: int) -> np.ndarray:
    """Center-padded frame RMS; streaming native path for float32 input,
    numpy (in the input's own dtype — float64 keeps float64 precision)
    otherwise."""
    y = np.asarray(y)
    L = lib() if y.dtype == np.float32 else None
    if L is None:
        pad = frame_length // 2
        yp = np.pad(y, (pad, pad), mode="constant")
        n_frames = 1 + (len(yp) - frame_length) // hop_length
        idx = (np.arange(frame_length)[None, :]
               + hop_length * np.arange(n_frames)[:, None])
        frames = yp[idx]
        return np.sqrt(np.mean(frames * frames, axis=-1))
    y = np.ascontiguousarray(y)
    n_frames = 1 + (len(y) + 2 * (frame_length // 2) - frame_length) // hop_length
    out = np.empty(max(n_frames, 0), np.float32)
    got = L.frame_rms(_f32(y), len(y), frame_length, hop_length, _f32(out))
    return out[:got]


def slicer_silence_tags(rms: np.ndarray, threshold: float, min_interval: int,
                        min_length: int, max_sil_kept: int
                        ) -> list[tuple[int, int]] | None:
    """Native slicer state machine; returns None if the library is absent
    (callers fall back to the Python loop in ops/slicer.py)."""
    L = lib()
    if L is None:
        return None
    rms = np.ascontiguousarray(rms, np.float32)
    cap = 64
    while True:
        tags = np.empty(2 * cap, np.int64)
        n = L.slicer_silence_tags(
            _f32(rms), len(rms), float(threshold), int(min_interval),
            int(min_length), int(max_sil_kept),
            tags.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), cap)
        if n >= 0:
            return [(int(tags[2 * i]), int(tags[2 * i + 1]))
                    for i in range(n)]
        cap *= 4
