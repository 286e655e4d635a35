"""Time stretching and pitch shifting — TPU-native phase vocoder.

Covers the reference's rubberband-CLI wrappers (lib/uvr5_pack/pyrb.py
time_stretch/pitch_shift, used by spec_utils.py:534-550 for the UVR
"match frequency pitch" semitone shift): instead of shelling out to a
binary around temp WAV files, the stretch runs as a phase vocoder on the
DFT-matmul STFT (ops/stft.py) — magnitudes linearly interpolated between
analysis frames, phases advanced by the accumulated instantaneous
frequency (a lax.scan over synthesis frames), then iSTFT.
"""
from __future__ import annotations

import math
from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from .stft import istft, stft
from .resample import resample_poly


def phase_vocoder(re: jax.Array, im: jax.Array, rate: float, hop: int,
                  n_fft: int) -> tuple[jax.Array, jax.Array]:
    """Stretch an STFT (..., frames, bins) by `rate` (>1 → faster/shorter).

    librosa-style: synthesis frame k reads analysis position k*rate."""
    n_frames = re.shape[-2]
    n_bins = re.shape[-1]
    steps = np.arange(0, n_frames, rate)
    idx0 = np.minimum(steps.astype(np.int64), n_frames - 1)
    idx1 = np.minimum(idx0 + 1, n_frames - 1)
    frac = jnp.asarray((steps - idx0).astype(np.float32))[:, None]

    mag = jnp.sqrt(re * re + im * im)
    phase = jnp.arctan2(im, re)

    mag0 = jnp.take(mag, idx0, axis=-2)
    mag1 = jnp.take(mag, idx1, axis=-2)
    mag_out = (1.0 - frac) * mag0 + frac * mag1

    # instantaneous frequency: phase advance between consecutive analysis
    # frames, deviation from the bin's expected advance wrapped to ±π
    expected = jnp.asarray(
        2.0 * math.pi * hop * np.arange(n_bins) / n_fft, re.dtype)
    ph0 = jnp.take(phase, idx0, axis=-2)
    ph1 = jnp.take(phase, idx1, axis=-2)
    dev = ph1 - ph0 - expected
    dev = dev - 2.0 * math.pi * jnp.round(dev / (2.0 * math.pi))
    advance = expected + dev  # (..., K, bins)

    ph_init = phase[..., 0, :]

    def step(acc, adv):
        out = acc
        return acc + adv, out

    adv_seq = jnp.moveaxis(advance, -2, 0)
    _, ph_seq = jax.lax.scan(step, ph_init, adv_seq)
    ph_out = jnp.moveaxis(ph_seq, 0, -2)
    return mag_out * jnp.cos(ph_out), mag_out * jnp.sin(ph_out)


def time_stretch(y: jax.Array, sr: int, rate: float, n_fft: int = 2048,
                 hop: int = 512) -> jax.Array:
    """(..., T) → (..., ≈T/rate). rate > 1 speeds up (shorter output)."""
    if rate == 1.0:
        return y
    re, im = stft(y, n_fft, hop, center=True)
    re2, im2 = phase_vocoder(re, im, rate, hop, n_fft)
    out_len = int(round(y.shape[-1] / rate))
    out = istft(re2, im2, n_fft, hop, center=True, length=out_len)
    short = out_len - out.shape[-1]
    if short > 0:  # istft yields ≤ n_frames*hop samples; top up with zeros
        out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, short)])
    return out


def pitch_shift(y: jax.Array, sr: int, n_steps: float, n_fft: int = 2048,
                hop: int = 512) -> jax.Array:
    """Shift pitch by `n_steps` semitones, duration preserved
    (stretch by 2^(-n/12) then resample back)."""
    if n_steps == 0:
        return y
    rate = 2.0 ** (-float(n_steps) / 12.0)
    stretched = time_stretch(y, sr, rate, n_fft=n_fft, hop=hop)
    frac = Fraction(rate).limit_denominator(1000)
    x = stretched if stretched.ndim > 1 else stretched[None]
    out = resample_poly(x, frac.numerator, frac.denominator)
    if stretched.ndim == 1:
        out = out[0]
    T = y.shape[-1]
    out = out[..., :T]
    pad = T - out.shape[-1]
    if pad > 0:
        out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, pad)])
    return out
