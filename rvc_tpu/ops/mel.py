"""Mel filterbanks and log-mel spectrograms.

Reimplements the librosa Slaney-scale mel filterbank from the published
formula (the reference calls ``librosa.filters.mel`` at
lib/train/mel_processing.py:38-39) and the two mel frontends:

  * ``spec_to_mel`` — reference ``spec_to_mel_torch``
    (lib/train/mel_processing.py:89-96): mel matmul + log dynamic-range
    compression with clip at 1e-5.
  * ``mel_spectrogram`` — reference ``mel_spectrogram_torch``
    (lib/train/mel_processing.py:117-150), the BigVGAN-style variant used
    by the multi-scale mel loss.

Also provides the HTK mel conversion used for f0 coarse quantization
(reference lib/audio.py:302-304).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .stft import spectrogram


def hz_to_mel_htk(hz):
    """HTK/Wikipedia mel used for f0 quantization (reference lib/audio.py:302)."""
    return 2595.0 * jnp.log10(1.0 + hz / 700.0)


def hz_to_mel_htk_np(hz):
    return 2595.0 * np.log10(1.0 + np.asarray(hz) / 700.0)


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    if mels.ndim:
        log_t = f >= min_log_hz
        mels[log_t] = min_log_mel + np.log(f[log_t] / min_log_hz) / logstep
    elif f >= min_log_hz:
        mels = min_log_mel + np.log(f / min_log_hz) / logstep
    return mels


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    if m.ndim:
        log_t = m >= min_log_mel
        freqs[log_t] = min_log_hz * np.exp(logstep * (m[log_t] - min_log_mel))
    elif m >= min_log_mel:
        freqs = min_log_hz * np.exp(logstep * (m - min_log_mel))
    return freqs


@functools.lru_cache(maxsize=None)
def _mel_filterbank_np(
    sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float | None, htk: bool = False
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, (n_bins, n_mels).

    Matches librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax) transposed
    to the frame-major layout (we multiply spectrogram (.., T, n_bins) by it).
    """
    if fmax is None:
        fmax = sr / 2.0
    n_bins = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, sr / 2.0, n_bins)
    if htk:
        mel_lo, mel_hi = hz_to_mel_htk_np(fmin), hz_to_mel_htk_np(fmax)
        mels = np.linspace(mel_lo, mel_hi, n_mels + 2)
        mel_f = 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    else:
        mel_lo, mel_hi = _hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax)
        mels = np.linspace(mel_lo, mel_hi, n_mels + 2)
        mel_f = _mel_to_hz_slaney(mels)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    weights = np.zeros((n_mels, n_bins))
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney normalization (area of each triangle = const energy per channel).
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # (n_bins, n_mels)


def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float = 0.0, fmax: float | None = None
) -> jax.Array:
    return jnp.asarray(_mel_filterbank_np(sr, n_fft, n_mels, fmin, fmax))


def dynamic_range_compression(x, clip_val: float = 1e-5):
    return jnp.log(jnp.maximum(x, clip_val))


def spec_to_mel(
    spec: jax.Array,
    n_fft: int,
    num_mels: int,
    sampling_rate: int,
    fmin: float,
    fmax: float | None,
) -> jax.Array:
    """spec: (..., T, n_bins) -> log-mel (..., T, n_mels)."""
    fb = jnp.asarray(_mel_filterbank_np(sampling_rate, n_fft, num_mels, fmin, fmax), spec.dtype)
    mel = jnp.matmul(spec, fb, precision=jax.lax.Precision.HIGHEST)
    return dynamic_range_compression(mel)


def mel_spectrogram(
    wav: jax.Array,
    n_fft: int,
    n_mels: int,
    sampling_rate: int,
    hop_length: int,
    win_length: int,
    fmin: float,
    fmax: float | None,
    center: bool = False,
) -> jax.Array:
    """Waveform (..., T) -> log-mel (..., n_frames, n_mels).

    Matches reference ``mel_spectrogram_torch`` (mel_processing.py:117-150)
    up to the frame-major layout (they keep (B, mels, T)); that variant
    skips the magnitude epsilon, so we use |STFT| without the +1e-8.
    """
    pad = int((n_fft - hop_length) / 2)
    padding = [(0, 0)] * (wav.ndim - 1) + [(pad, pad)]
    wav = jnp.pad(wav, padding, mode="reflect")
    from .stft import stft as _stft

    real, imag = _stft(wav, n_fft, hop_length, win_length, center=center)
    mag = jnp.sqrt(real * real + imag * imag + 1e-9)
    fb = jnp.asarray(_mel_filterbank_np(sampling_rate, n_fft, n_mels, fmin, fmax), mag.dtype)
    mel = jnp.matmul(mag, fb, precision=jax.lax.Precision.HIGHEST)
    return dynamic_range_compression(mel)
