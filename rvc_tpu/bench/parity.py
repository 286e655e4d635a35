"""Output-parity harness: mel-spectral distance between two renditions.

The acceptance gate for the rebuild is <0.1 dB mel-spectral distance vs
the PyTorch reference output (BASELINE.json north star). This module
computes that metric: mean absolute difference of log10-mel magnitudes
(in dB) over aligned frames, plus an SDR-style summary.

Usage:
    python -m rvc_tpu.bench.parity ours.wav reference.wav --sr 48000
"""
from __future__ import annotations

import numpy as np


def mel_distance_db(
    a: np.ndarray,
    b: np.ndarray,
    sr: int,
    n_fft: int = 2048,
    hop: int = 512,
    n_mels: int = 128,
) -> float:
    """Mean |Δ| of 20·log10 mel magnitudes, in dB, over aligned frames."""
    import jax.numpy as jnp

    from ..ops.mel import _mel_filterbank_np
    from ..ops.stft import stft as _stft

    n = min(len(a), len(b))
    a = np.asarray(a[:n], np.float32)
    b = np.asarray(b[:n], np.float32)
    # scale-align (int16 vs float, peak-normalized outputs)
    pa = np.abs(a).max() or 1.0
    pb = np.abs(b).max() or 1.0
    a, b = a / pa, b / pb
    fb = jnp.asarray(_mel_filterbank_np(sr, n_fft, n_mels, 0.0, None))

    def logmel(x):
        real, imag = _stft(jnp.asarray(x)[None], n_fft, hop, n_fft, center=True)
        mag = jnp.sqrt(real**2 + imag**2 + 1e-9)
        mel = jnp.matmul(mag, fb)
        return 20.0 * jnp.log10(jnp.maximum(mel, 1e-5))

    la, lb = logmel(a), logmel(b)
    return float(np.mean(np.abs(np.asarray(la) - np.asarray(lb))))


def compare_wavs(path_a: str, path_b: str, sr: int | None = None) -> dict:
    from ..io.audio import load_input_audio
    from ..ops.karafan_utils import sdr

    a, sra = load_input_audio(path_a)
    b, srb = load_input_audio(path_b)
    if sr is None:
        sr = sra
    if sra != sr:
        from scipy.signal import resample_poly
        import math

        g = math.gcd(sra, sr)
        a = resample_poly(a, sr // g, sra // g)
    if srb != sr:
        from scipy.signal import resample_poly
        import math

        g = math.gcd(srb, sr)
        b = resample_poly(b, sr // g, srb // g)
    n = min(len(a), len(b))
    return {
        "mel_distance_db": mel_distance_db(a, b, sr),
        "sdr_db": float(sdr(a[:n], b[:n]).mean()),
        "sr": sr,
        "seconds": n / sr,
    }


if __name__ == "__main__":
    import argparse
    import json

    p = argparse.ArgumentParser()
    p.add_argument("ours")
    p.add_argument("reference")
    p.add_argument("--sr", type=int, default=None)
    args = p.parse_args()
    print(json.dumps(compare_wavs(args.ours, args.reference, args.sr), indent=2))
