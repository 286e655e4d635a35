"""Karafan audio utilities (reference lib/karafan/audio_utils.py + compare.py).

Normalize / Silent (RMS gate with fades) / Butterworth & Linkwitz-Riley
pass filters / sample-rate-shift (SRS) / Make_Ensemble / SDR scoring.
Host-side numpy+scipy (these run once per song around the device demixers).
"""
from __future__ import annotations

import math

import numpy as np
from scipy import signal as _ss


def normalize(audio: np.ndarray, threshold_db: float = -1.0) -> np.ndarray:
    """Peak-normalize to threshold dBFS (reference audio_utils.Normalize)."""
    target = 10 ** (threshold_db / 20)
    peak = np.abs(audio).max()
    if peak == 0:
        return audio
    return audio * (target / peak)


def silent(audio: np.ndarray, sample_rate: int, threshold_db: float = -50.0,
           min_size_ms: int = 1000, fade_ms: int = 100) -> np.ndarray:
    """Zero out sustained below-threshold regions with fades (reference
    audio_utils.Silent semantics: RMS gate over windows, keep fades)."""
    audio = np.atleast_2d(audio.copy())
    thresh = 10 ** (threshold_db / 20)
    win = max(int(sample_rate * 0.05), 1)
    mono = np.mean(np.abs(audio), axis=0)
    n_win = len(mono) // win
    rms = np.sqrt(np.mean(
        mono[: n_win * win].reshape(n_win, win) ** 2, axis=-1))
    quiet = rms < thresh
    min_windows = max(int(min_size_ms / 1000 * sample_rate / win), 1)
    fade = int(fade_ms / 1000 * sample_rate)
    i = 0
    while i < n_win:
        if quiet[i]:
            j = i
            while j < n_win and quiet[j]:
                j += 1
            if j - i >= min_windows:
                s, e = i * win, j * win
                audio[:, s + fade : max(s + fade, e - fade)] = 0.0
                if fade > 0:
                    ramp = np.linspace(1, 0, fade)
                    audio[:, s : s + fade] *= ramp
                    if e - fade > s + fade:
                        audio[:, e - fade : e] *= ramp[::-1]
            i = j
        else:
            i += 1
    return audio


def pass_filter(kind: str, cutoff: float, audio: np.ndarray, sample_rate: int,
                order: int = 16) -> np.ndarray:
    """Butterworth (odd order) / Linkwitz-Riley-style (even order, cascaded)
    zero-phase filter (reference audio_utils.Pass_filter)."""
    btype = "highpass" if kind == "highpass" else "lowpass"
    sos = _ss.butter(order // 2 if order > 1 else 1, cutoff, btype=btype,
                     fs=sample_rate, output="sos")
    return _ss.sosfiltfilt(sos, audio, axis=-1).astype(np.float32)


def change_sample_rate(audio: np.ndarray, up: int, down: int) -> np.ndarray:
    """SRS pitch-preserving rate shift (reference audio_utils.Change_sample_rate):
    resample by up/down without relabeling the rate (spectral shift trick)."""
    return _ss.resample_poly(audio, up, down, axis=-1).astype(np.float32)


def srs_shift(audio: np.ndarray, way: str, current_cutoff: float,
              target_cutoff: float) -> np.ndarray:
    """Cutoff-expressed SRS resample (reference audio_utils.Change_sample_rate
    :237-244): resample from 2·current_cutoff to 2·target_cutoff WITHOUT
    relabeling the sample rate, which shifts the spectral content so a
    band-limited model sees the band it was trained on. way='DOWN' swaps the
    cutoffs (content moves down / signal gets longer); 'UP' restores it.
    Kaiser-windowed polyphase (scipy) stands in for librosa kaiser_best."""
    if way == "DOWN":
        current_cutoff, target_cutoff = target_cutoff, current_cutoff
    up = int(round(target_cutoff * 2))
    down = int(round(current_cutoff * 2))
    g = math.gcd(up, down)
    return _ss.resample_poly(audio, up // g, down // g, axis=-1).astype(np.float32)


def linkwitz_riley(kind: str, cutoff: float, audio: np.ndarray,
                   sample_rate: int, order: int = 8) -> np.ndarray:
    """Linkwitz-Riley crossover leg (reference audio_utils.Linkwitz_Riley_filter
    :191-201): an order//2 Butterworth applied zero-phase (sosfiltfilt), so the
    lowpass+highpass pair sums flat at the crossover."""
    sos = _ss.butter(order // 2, cutoff, btype=kind, fs=sample_rate, output="sos")
    return _ss.sosfiltfilt(sos, audio, padlen=0, axis=-1).astype(np.float32)


def make_ensemble(algorithm: str, audios: list[np.ndarray]) -> np.ndarray:
    """Combine stems (reference audio_utils.Make_Ensemble): 'Max' keeps the
    per-sample extreme (by magnitude), 'Average' means."""
    n = min(a.shape[-1] for a in audios)
    stack = np.stack([a[..., :n] for a in audios])
    if algorithm.lower() == "max":
        idx = np.argmax(np.abs(stack), axis=0)
        return np.take_along_axis(stack, idx[None], axis=0)[0]
    return stack.mean(axis=0)


def sdr(references: np.ndarray, estimates: np.ndarray) -> np.ndarray:
    """Signal-to-distortion ratio per source (reference compare.py:35-55)."""
    references = np.atleast_2d(references)
    estimates = np.atleast_2d(estimates)
    n = min(references.shape[-1], estimates.shape[-1])
    references, estimates = references[..., :n], estimates[..., :n]
    delta = 1e-7
    num = np.sum(np.square(references), axis=-1)
    den = np.sum(np.square(references - estimates), axis=-1)
    return 10 * np.log10((num + delta) / (den + delta))
