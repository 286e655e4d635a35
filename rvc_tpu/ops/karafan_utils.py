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
    """DC-remove + peak-normalize to threshold dBFS (reference
    audio_utils.Normalize:92-107 — the DC suppression is part of the
    contract: 'every process is based on RMS dB levels')."""
    audio = audio - np.mean(audio)
    target = 10 ** (threshold_db / 20)
    peak = np.abs(audio).max()
    if peak == 0:
        return audio
    return audio * (target / peak)


def _window_rms_db(chunk: np.ndarray, frame: int) -> float:
    """max RMS of a chunk in dB, librosa-framing semantics (centered frames
    of ``frame`` samples at hop ``frame``, zero pad, amin 1e-5) — what the
    reference Silent measures per window (audio_utils.py:132)."""
    mono2 = np.atleast_2d(chunk) ** 2
    padded = np.pad(mono2, [(0, 0), (frame // 2, frame // 2)])
    n_frames = 1 + (padded.shape[-1] - frame) // frame
    vals = [np.sqrt(np.mean(padded[:, k * frame : k * frame + frame], axis=-1))
            for k in range(max(n_frames, 1))]
    return float(20 * np.log10(np.maximum(1e-5, np.max(vals))))


def silent(audio_in: np.ndarray, sample_rate: int,
           threshold_db: float = -50.0) -> np.ndarray:
    """Zero sustained below-threshold regions with fades — behavior-exact
    port of reference audio_utils.Silent:109-167 (window 500 ms, min size
    1 s, 300 ms linear fades, max-RMS-in-dB gate, including its quirk of
    anchoring the region at the last loud window)."""
    sr = sample_rate
    min_size = int(1.000 * sr)
    window = int(0.500 * sr)
    fade_len = int(0.300 * sr)
    fade_out = np.linspace(1.0, 0.0, fade_len)
    fade_in = np.linspace(0.0, 1.0, fade_len)

    audio = np.atleast_2d(audio_in).copy()
    n = audio.shape[-1]
    start = end = 0
    for i in range(0, n, window):
        rms_db = _window_rms_db(audio[:, i : i + window], window)
        if rms_db < threshold_db:
            end = i + window
            if i >= n - window:  # trailing silence
                if end - start > min_size:
                    if start > fade_len:
                        audio[:, start : start + fade_len] *= fade_out
                        start += fade_len
                    audio[:, start:n] = 0.0
                    break
        else:
            if end - start > min_size:
                if start > fade_len:
                    audio[:, start : start + fade_len] *= fade_out
                    start += fade_len
                if end < n - fade_len:
                    audio[:, end - fade_len : end] *= fade_in
                    end -= fade_len
                audio[:, start:end] = 0.0
            start = i
    return audio


def pass_filter(kind: str, cutoff: float, audio: np.ndarray, sample_rate: int,
                order: int = 16) -> np.ndarray:
    """Butterworth (odd order) / Linkwitz-Riley-style (even order, cascaded)
    zero-phase filter (reference audio_utils.Pass_filter)."""
    btype = "highpass" if kind == "highpass" else "lowpass"
    if cutoff >= sample_rate / 2:
        cutoff = sample_rate / 2 - 1
    sos = _ss.butter(order // 2 if order > 1 else 1, cutoff, btype=btype,
                     fs=sample_rate, output="sos")
    # padlen=0: the reference filters without edge padding
    # (audio_utils.Pass_filter:228)
    return _ss.sosfiltfilt(sos, audio, padlen=0, axis=-1).astype(np.float32)


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
