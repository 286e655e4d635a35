"""Envelopes and filtering ops.

  * ``rms_envelope`` / ``change_rms`` — RMS-envelope volume mixing,
    semantics of reference ``change_rms`` (lib/model_utils.py:40-60):
    half-second RMS frames, linear-interpolated to sample rate, applied as
    rms1^(1-rate) * rms2^(rate-1).
  * ``median_filter_1d`` — device median filter (used for harvest-style f0
    smoothing, reference pitch_extraction.py:234-236).
  * ``highpass_fir`` — linear-phase FIR approximation of the reference's
    butter(N=5, 48 Hz) filtfilt high-pass (vc_infer_pipeline.py:21,123),
    applied as a single conv so it stays on device. (The host pipeline may
    use scipy filtfilt for bit-parity; this is the fused device path.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as _ss

from .stft import frame_signal


def rms_envelope(x: jax.Array, frame_length: int, hop_length: int) -> jax.Array:
    """librosa.feature.rms semantics: center-padded frame RMS. x: (..., T)."""
    pad = frame_length // 2
    padding = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    xp = jnp.pad(x, padding, mode="constant")
    frames = frame_signal(xp, frame_length, hop_length)
    return jnp.sqrt(jnp.mean(frames * frames, axis=-1))


def _linear_interp_to(env: jax.Array, out_len: int) -> jax.Array:
    """Resize last axis to out_len with torch F.interpolate(mode='linear',
    align_corners=False) semantics."""
    n = env.shape[-1]
    scale = n / out_len
    pos = (jnp.arange(out_len) + 0.5) * scale - 0.5
    pos = jnp.clip(pos, 0.0, n - 1.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n - 1)
    w = pos - lo
    return env[..., lo] * (1.0 - w) + env[..., hi] * w


def change_rms(
    source: jax.Array,
    source_sr: int,
    target: jax.Array,
    target_sr: int,
    rate: float,
) -> jax.Array:
    """Blend target's loudness envelope toward the source's.

    rate=1 keeps target untouched; rate=0 fully imposes source RMS.
    """
    rms1 = rms_envelope(source, source_sr // 2 * 2, source_sr // 2)
    rms2 = rms_envelope(target, target_sr // 2 * 2, target_sr // 2)
    T = target.shape[-1]
    rms1 = _linear_interp_to(rms1, T)
    rms2 = jnp.maximum(_linear_interp_to(rms2, T), 1e-6)
    gain = jnp.power(rms1, 1.0 - rate) * jnp.power(rms2, rate - 1.0)
    return target * gain


def median_filter_1d(x: jax.Array, kernel_size: int) -> jax.Array:
    """Median filter along the last axis with reflect padding (scipy.signal.medfilt
    uses zero padding; we match scipy by zero-padding)."""
    if kernel_size <= 1:
        return x
    pad = kernel_size // 2
    padding = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    xp = jnp.pad(x, padding, mode="constant")
    frames = frame_signal(xp, kernel_size, 1)
    return jnp.median(frames, axis=-1)


@functools.lru_cache(maxsize=None)
def _highpass_taps_np(cutoff_hz: float, fs: int, numtaps: int) -> np.ndarray:
    return _ss.firwin(numtaps, cutoff_hz, fs=fs, pass_zero=False).astype(np.float32)


def highpass_fir(x: jax.Array, cutoff_hz: float = 48.0, fs: int = 16000, numtaps: int = 1023) -> jax.Array:
    """Zero-phase-ish linear-phase FIR high-pass, same-length output."""
    taps = _highpass_taps_np(cutoff_hz, fs, numtaps)
    *lead, T = x.shape
    xf = x.reshape((-1, 1, T)).astype(jnp.float32)
    kernel = jnp.asarray(taps[::-1].copy()).reshape(1, 1, -1)
    pad = numtaps // 2
    y = jax.lax.conv_general_dilated(
        xf,
        kernel,
        window_strides=(1,),
        padding=[(pad, pad)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y.reshape((*lead, -1))[..., :T].astype(x.dtype)


def butter_highpass_host(x: np.ndarray, cutoff_hz: float = 48.0, fs: int = 16000) -> np.ndarray:
    """Exact reference semantics (vc_infer_pipeline.py:21,123): 5th-order
    Butterworth + filtfilt on host. Used by the host preprocessing path."""
    bh, ah = _ss.butter(N=5, Wn=cutoff_hz, btype="high", fs=fs)
    return _ss.filtfilt(bh, ah, x).astype(np.float32)
