"""CREPE pitch CNN (full/tiny) in Flax.

The reference uses torchcrepe (pitch_extraction.py:76-150) with the
standard CREPE weights. Architecture: six conv(+BN+maxpool) stages over
1024-sample frames at 16 kHz, 2048→360-bin sigmoid classifier;
decoded either by Viterbi over a |Δbin|-penalized transition matrix
(torchcrepe's default) or weighted-argmax. Frame preprocessing matches
torchcrepe: zero-pad by 512, per-frame mean/std normalization.

TPU-first: all frames across all chunks batch into one conv stack pass;
Viterbi is a lax.scan over a fixed 360×360 transition — tiny.
Param names mirror torchcrepe (conv1..conv6, conv1_BN.., classifier).
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..ops.stft import frame_signal
from .layers import BatchNorm, Conv2dTorch, Linear

PITCH_BINS = 360
WINDOW = 1024
CENTS_PER_BIN = 20.0
CENTS_OFFSET = 1997.3794084376191


_SIZES = {
    "full": dict(in_ch=(1, 1024, 128, 128, 128, 256), out_ch=(1024, 128, 128, 128, 256, 512),
                 in_features=2048),
    "tiny": dict(in_ch=(1, 128, 16, 16, 16, 32), out_ch=(128, 16, 16, 16, 32, 64),
                 in_features=256),
}


class CrepeNet(nn.Module):
    capacity: str = "full"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, frames: jax.Array) -> jax.Array:
        """frames: (N, 1024) normalized windows -> (N, 360) salience."""
        sz = _SIZES[self.capacity]
        x = frames[:, :, None, None].astype(self.dtype)  # (N, H=1024, W=1, C=1)
        kernels = [(512, 1)] + [(64, 1)] * 5
        strides = [(4, 1)] + [(1, 1)] * 5
        pads = [(254, 256)] + [(31, 32)] * 5
        for i in range(6):
            ci = sz["in_ch"][i]
            co = sz["out_ch"][i]
            x = jnp.pad(x, ((0, 0), pads[i], (0, 0), (0, 0)))
            x = Conv2dTorch(ci, co, kernels[i], strides[i], (0, 0), dtype=self.dtype,
                            name=f"conv{i + 1}")(x)
            x = jax.nn.relu(x)
            x = BatchNorm(co, dtype=self.dtype, name=f"conv{i + 1}_BN")(x)
            # max pool (2,1)
            N, H, W, C = x.shape
            x = x.reshape(N, H // 2, 2, W, C).max(axis=2)
        N = x.shape[0]
        # torchcrepe: permute(0,3,2,1).reshape(N,-1): (N,C,H,W)->(N,W,H,C) flat
        x = x.transpose(0, 2, 1, 3).reshape(N, -1)
        x = Linear(sz["in_features"], PITCH_BINS, dtype=self.dtype, name="classifier")(x)
        return jax.nn.sigmoid(x)


def preprocess_frames(audio: jax.Array, hop_length: int) -> jax.Array:
    """(B, T) 16 kHz -> (B, F, 1024) zero-padded, per-frame normalized."""
    pad = WINDOW // 2
    x = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)])
    frames = frame_signal(x, WINDOW, hop_length)
    mu = frames.mean(axis=-1, keepdims=True)
    std = jnp.maximum(frames.std(axis=-1, keepdims=True), 1e-10)
    return (frames - mu) / std


@functools.lru_cache(maxsize=None)
def _viterbi_transition() -> np.ndarray:
    xx, yy = np.meshgrid(np.arange(PITCH_BINS), np.arange(PITCH_BINS))
    transition = np.maximum(12 - abs(xx - yy), 0).astype(np.float64)
    return (transition / transition.sum(axis=1, keepdims=True)).astype(np.float32)


def viterbi_decode(probs: jax.Array) -> jax.Array:
    """(B, T, 360) -> (B, T) bin indices via max-product Viterbi
    (torchcrepe.decode.viterbi semantics, implemented as a scan + argmax
    backtrace)."""
    logT = jnp.log(jnp.asarray(_viterbi_transition()) + 1e-12)
    logp = jnp.log(jnp.maximum(probs, 1e-12))
    # emission distribution normalized like librosa.sequence.viterbi
    logp = logp - jax.nn.logsumexp(logp, axis=-1, keepdims=True)

    def step(carry, obs):
        score = carry  # (B, 360)
        cand = score[:, :, None] + logT[None]  # (B, from, to)
        best_prev = jnp.argmax(cand, axis=1)  # (B, to)
        score_new = jnp.max(cand, axis=1) + obs
        return score_new, best_prev

    init = logp[:, 0] + jnp.log(1.0 / PITCH_BINS)
    final, back = jax.lax.scan(step, init, jnp.swapaxes(logp[:, 1:], 0, 1))
    last = jnp.argmax(final, axis=-1)  # (B,)

    def backstep(state, bp):
        prev = jnp.take_along_axis(bp, state[:, None], axis=-1)[:, 0]
        return prev, prev

    _, path = jax.lax.scan(backstep, last, back, reverse=True)
    path = jnp.swapaxes(path, 0, 1)  # (B, T-1)
    return jnp.concatenate([path, last[:, None]], axis=1)


def weighted_argmax_decode(probs: jax.Array) -> jax.Array:
    """(B, T, 360) -> (B, T) fractional bins averaged ±4 around argmax."""
    center = jnp.argmax(probs, axis=-1)
    idx = jnp.clip(center[..., None] + jnp.arange(-4, 5), 0, PITCH_BINS - 1)
    w = jnp.take_along_axis(probs, idx, axis=-1)
    return jnp.sum(w * idx, -1) / jnp.maximum(jnp.sum(w, -1), 1e-9)


def bins_to_hz(bins: jax.Array) -> jax.Array:
    cents = CENTS_PER_BIN * bins + CENTS_OFFSET
    return 10.0 * jnp.power(2.0, cents / 1200.0)


def predict(
    params,
    audio: jax.Array,
    hop_length: int = 160,
    fmin: float = 50.0,
    fmax: float = 1100.0,
    capacity: str = "full",
    decoder: str = "viterbi",
    dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """(B, T) -> (f0 Hz (B, F), periodicity (B, F))."""
    frames = preprocess_frames(audio, hop_length)
    B, F, _ = frames.shape
    net = CrepeNet(capacity=capacity, dtype=dtype)
    probs = net.apply(params, frames.reshape(B * F, WINDOW)).reshape(B, F, PITCH_BINS)
    # mask out-of-range bins like torchcrepe.predict(fmin, fmax)
    bins_hz = np.asarray(bins_to_hz(jnp.arange(PITCH_BINS)))
    mask = (bins_hz >= fmin) & (bins_hz <= fmax)
    probs = jnp.where(jnp.asarray(mask)[None, None, :], probs, 0.0)
    if decoder == "viterbi":
        bins = viterbi_decode(probs)
        periodicity = jnp.take_along_axis(probs, bins[..., None], axis=-1)[..., 0]
        f0 = bins_to_hz(bins.astype(jnp.float32))
    else:
        fbins = weighted_argmax_decode(probs)
        periodicity = jnp.max(probs, axis=-1)
        f0 = bins_to_hz(fbins)
    return f0, periodicity
