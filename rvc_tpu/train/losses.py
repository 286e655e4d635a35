"""GAN + reconstruction loss suite (reference lib/train/losses.py).

All losses are pure jnp (jit-able, fp32 reductions regardless of compute
dtype). Covers:

  * LSGAN discriminator/generator losses (:571-593), feature matching
    (:564-569), VITS KL (:596-611);
  * single-scale mel L1 on the sliced segment (training_cli.py:566-570);
  * MultiScaleMelSpectrogramLoss (BigVGAN-derived, :430-561) with static
    per-scale fmin/fmax (the reference's dynamic adjustment defaults to
    off; a host-side adjuster can rebuild the static bank set per epoch);
  * aux losses: TEFS Hilbert envelope/fine-structure (:279-322), TSI
    envelope correlation (:235-277), harmonic/percussive L1 via a
    device median-filter HPSS (:324-399 — the reference round-trips to
    librosa on CPU inside the loss; here HPSS runs on device).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mel import mel_spectrogram
from ..ops.stft import frame_signal


def feature_loss(fmap_r, fmap_g) -> jax.Array:
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl.astype(jnp.float32) - gl.astype(jnp.float32)))
    return loss


def discriminator_loss(disc_real, disc_gen):
    loss = 0.0
    per_disc = []
    for dr, dg in zip(disc_real, disc_gen):
        drf, dgf = dr.astype(jnp.float32), dg.astype(jnp.float32)
        l = jnp.mean((1.0 - drf) ** 2) + jnp.mean(dgf**2)
        per_disc.append(l)
        loss += l
    return loss, per_disc


def generator_loss(disc_gen):
    loss = 0.0
    per_disc = []
    for dg in disc_gen:
        l = jnp.mean((1.0 - dg.astype(jnp.float32)) ** 2)
        per_disc.append(l)
        loss += l
    return loss, per_disc


def kl_loss(z_p, logs_q, m_p, logs_p, z_mask) -> jax.Array:
    """VITS prior KL (channels-last (B, T, C); mask (B, T, 1)).

    Reference normalization (losses.py:596-611): numerator sums over all
    channels; denominator counts each valid (b, t) position once — i.e.
    mean-over-frames of the per-frame channel sum.
    """
    z_p, logs_q = z_p.astype(jnp.float32), logs_q.astype(jnp.float32)
    m_p, logs_p = m_p.astype(jnp.float32), logs_p.astype(jnp.float32)
    m = z_mask.astype(jnp.float32)
    kl = logs_p - logs_q - 0.5
    kl = kl + 0.5 * ((z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
    return jnp.sum(kl * m) / jnp.sum(m)


def mel_l1(y_mel, y_hat_mel) -> jax.Array:
    return jnp.mean(jnp.abs(y_mel.astype(jnp.float32) - y_hat_mel.astype(jnp.float32)))


# ---------------------------------------------------------------------------
# Multi-scale mel loss
# ---------------------------------------------------------------------------


def _window_length(n_mels: int, sample_rate: int) -> int:
    w = int(8 * n_mels / (sample_rate / 2) * sample_rate)
    return 2 ** (w.bit_length() - 1)


class MultiScaleMelLoss:
    """Static-bank multi-scale log-mel L1 (reference losses.py:430-561)."""

    def __init__(
        self,
        sampling_rate: int,
        n_mels: Sequence[int] = (20, 64, 80, 128, 160, 256),
        fmin: float = 50.0,
        fmax: float | None = None,
        loss: str = "l1",
    ):
        self.sampling_rate = sampling_rate
        self.n_mels = sorted(n_mels)
        self.windows = [_window_length(m, sampling_rate) for m in self.n_mels]
        self.hop = sampling_rate // 100
        self.fmin = fmin
        self.fmax = fmax if fmax is not None else sampling_rate / 2
        self.loss = loss

    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        """x, y: (B, T) waveforms."""
        total = 0.0
        for n_mels, win in zip(self.n_mels, self.windows):
            xm = mel_spectrogram(x.astype(jnp.float32), win, n_mels, self.sampling_rate,
                                 self.hop, win, self.fmin, self.fmax)
            ym = mel_spectrogram(y.astype(jnp.float32), win, n_mels, self.sampling_rate,
                                 self.hop, win, self.fmin, self.fmax)
            d = xm - ym
            if self.loss == "l2":
                total += jnp.mean(d * d)
            else:
                total += jnp.mean(jnp.abs(d))
        return total / len(self.n_mels)


# ---------------------------------------------------------------------------
# Aux losses (TEFS / TSI / harmonic)
# ---------------------------------------------------------------------------


def _minmax_scale(x, eps=1e-8):
    return (x - x.min()) / (x.max() - x.min() + eps)


def compute_tefs(audio: jax.Array, eps: float = 1e-8):
    """Hilbert envelope + instantaneous-phase cosine (reference :279-322)."""
    x = audio.astype(jnp.float32)
    n = x.shape[-1]
    X = jnp.fft.fft(x, axis=-1)
    h = np.zeros(n, np.float32)
    h[0] = 1
    if n % 2 == 0:
        h[1 : n // 2] = 2
        h[n // 2] = 1
    else:
        h[1 : (n + 1) // 2] = 2
    analytic = jnp.fft.ifft(X * jnp.asarray(h), axis=-1)
    env = _minmax_scale(jnp.abs(analytic), eps)
    phase = jnp.cos(jnp.diff(jnp.angle(analytic), axis=-1))
    return jnp.nan_to_num(env, nan=eps), jnp.nan_to_num(phase, nan=eps)


def _l2_normalize(x, axis, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def _max_pool_lastdim(x, k=3):
    pad = k // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], constant_values=-jnp.inf)
    frames = frame_signal(xp, k, 1)
    return frames.max(axis=-1)


def _envelope(log_mag: jax.Array, axis: int, eps: float = 1e-8):
    """Peak envelope summed along ``axis`` (reference compute_envelope)."""
    x = _l2_normalize(log_mag, axis)
    if axis == -2 or axis == log_mag.ndim - 2:
        x = jnp.swapaxes(x, -1, -2)
        pooled = _max_pool_lastdim(x, 3)
        pooled = jnp.swapaxes(pooled, -1, -2)
        return jnp.nan_to_num(pooled, nan=eps).sum(axis=-2)
    pooled = _max_pool_lastdim(x, 3)
    return jnp.nan_to_num(pooled, nan=eps).sum(axis=-1)


def _pearson(x, y, eps=1e-8):
    xc = x - x.mean(-1, keepdims=True)
    yc = y - y.mean(-1, keepdims=True)
    cov = jnp.sum(xc * yc, -1)
    sx = jnp.sqrt(jnp.sum(xc * xc, -1) + eps)
    sy = jnp.sqrt(jnp.sum(yc * yc, -1) + eps)
    return jnp.nan_to_num(cov / (sx * sy + eps), nan=eps)


def compute_tsi_loss(org_log_mag, gen_log_mag, axis=-1, eps=1e-8):
    eo = _envelope(org_log_mag, axis, eps)
    eg = _envelope(gen_log_mag, axis, eps)
    return jnp.mean(1.0 - _pearson(eo, eg, eps))


def _median_pool(x: jax.Array, k: int, axis: int) -> jax.Array:
    """Median filter along `axis` with reflect padding."""
    x = jnp.moveaxis(x, axis, -1)
    pad = k // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(xp, k, 1)
    out = jnp.median(frames, axis=-1)
    return jnp.moveaxis(out, -1, axis)


def hpss(spec: jax.Array, kernel_size: int = 31, power: float = 2.0, eps: float = 1e-10):
    """Median-filtering harmonic/percussive separation on device
    (librosa.decompose.hpss semantics with margin=1, soft masks).

    spec: (..., T, F) magnitude-like array. Harmonic = smooth along time,
    percussive = smooth along frequency.
    """
    harm = _median_pool(spec, kernel_size, axis=-2)
    perc = _median_pool(spec, kernel_size, axis=-1)
    hp = jnp.power(jnp.maximum(harm, 0.0), power)
    pp = jnp.power(jnp.maximum(perc, 0.0), power)
    total = hp + pp
    mask_h = jnp.where(total > eps, hp / jnp.maximum(total, eps), 0.5)
    mask_p = jnp.where(total > eps, pp / jnp.maximum(total, eps), 0.5)
    return spec * mask_h, spec * mask_p


def compute_harmonics(mag: jax.Array, kernel_sizes=(3, 7, 13, 19, 29), eps=1e-8):
    """Multi-kernel HPSS concat (reference compute_harmonics :324-342),
    but fully on device instead of a per-step librosa CPU round trip."""
    hs, ps = [], []
    for k in kernel_sizes:
        h, p = hpss(jnp.abs(mag.astype(jnp.float32)), k)
        hs.append(h)
        ps.append(p)
    harmonic = _minmax_scale(jnp.concatenate(hs, axis=-1), eps)
    percussive = _minmax_scale(jnp.concatenate(ps, axis=-1), eps)
    return jnp.nan_to_num(harmonic, nan=eps), jnp.nan_to_num(percussive, nan=eps)


def combined_aux_loss(
    original_audio: jax.Array,
    generated_audio: jax.Array,
    c_tefs: float = 1.0,
    c_hd: float = 1.0,
    c_tsi: float = 1.0,
    n_mels: int = 128,
    sample_rate: int = 40000,
    n_fft: int = 1024,
    hop_length: int = 320,
    win_length: int = 1024,
    fmin: float = 0.0,
    fmax: float | None = None,
    eps: float = 1e-8,
):
    """(harmonic, tefs, tsi) losses — reference losses.py:344-399."""
    harmonic_loss = tefs_loss = tsi_loss = jnp.float32(0.0)
    if c_hd + c_tsi > 0:
        org_mag = mel_spectrogram(original_audio.astype(jnp.float32), n_fft, n_mels,
                                  sample_rate, hop_length, win_length, fmin, fmax)
        gen_mag = mel_spectrogram(generated_audio.astype(jnp.float32), n_fft, n_mels,
                                  sample_rate, hop_length, win_length, fmin, fmax)
    if c_hd > 0:
        oh, op = compute_harmonics(org_mag, eps=eps)
        gh, gp = compute_harmonics(gen_mag, eps=eps)
        harmonic_loss = jnp.mean(jnp.abs(gh - oh)) + jnp.mean(jnp.abs(gp - op))
    if c_tsi > 0:
        tsi_loss = compute_tsi_loss(org_mag, gen_mag, -1, eps) + compute_tsi_loss(
            org_mag, gen_mag, -2, eps
        )
    if c_tefs > 0:
        ge, gph = compute_tefs(generated_audio, eps)
        oe, oph = compute_tefs(original_audio, eps)
        tefs_loss = jnp.mean(jnp.abs(ge - oe)) + jnp.mean(jnp.abs(gph - oph))
    return harmonic_loss, tefs_loss, tsi_loss
