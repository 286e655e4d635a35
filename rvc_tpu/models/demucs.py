"""Demucs time-domain separator (classic v1/v2 architecture) + chunked apply.

Reference vendors demucs v1–v4 (lib/uvr5_pack/demucs/, 5900 LoC torch).
This implements the classic Demucs topology — std-normalized input,
optional 2× upsample, 6 conv encoder layers (k8 s4, GELU, 1×1 GLU
rewrite), BiLSTM bottleneck, mirrored decoder with skip connections — and
the ``apply_model`` chunked/shifted inference driver (demucs/apply.py:124
semantics: random shifts, overlap-add with triangular weight). The v3/v4
hybrid (spectrogram-branch) variants are follow-up work; the chunk driver
is shared.

TPU-first: (B, T, C) layout; the LSTM scan carries only the recurrent
matmul; all chunks of a song batch into one device dispatch.
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from .layers import Conv1d, ConvTranspose1d, Linear
from ..ops.resample import resample_poly


class BiLSTM(nn.Module):
    """2-layer bidirectional LSTM with torch param naming + a linear merge
    (reference demucs.BLSTM)."""

    dim: int
    layers: int = 2
    dtype: Any = jnp.float32

    def _dir(self, x, layer, suffix, reverse):
        H = self.dim
        bound = 1.0 / np.sqrt(H)
        init = lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound)  # noqa: E731
        I = x.shape[-1]
        w_ih = self.param(f"lstm_weight_ih_l{layer}{suffix}", init, (4 * H, I))
        w_hh = self.param(f"lstm_weight_hh_l{layer}{suffix}", init, (4 * H, H))
        b_ih = self.param(f"lstm_bias_ih_l{layer}{suffix}", init, (4 * H,))
        b_hh = self.param(f"lstm_bias_hh_l{layer}{suffix}", init, (4 * H,))
        xg = jnp.matmul(x.astype(self.dtype), w_ih.T.astype(self.dtype)) + b_ih.astype(self.dtype)
        if reverse:
            xg = jnp.flip(xg, axis=1)
        w_hh_t = w_hh.T.astype(self.dtype)
        b = b_hh.astype(self.dtype)

        def step(carry, xt):
            h, c = carry
            g = xt + jnp.matmul(h, w_hh_t) + b
            i, f, gg, o = jnp.split(g, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        B = x.shape[0]
        h0 = (jnp.zeros((B, H), self.dtype), jnp.zeros((B, H), self.dtype))
        _, ys = jax.lax.scan(step, h0, jnp.swapaxes(xg, 0, 1))
        ys = jnp.swapaxes(ys, 0, 1)
        return jnp.flip(ys, axis=1) if reverse else ys

    @nn.compact
    def __call__(self, x):
        h = x
        for l in range(self.layers):
            fwd = self._dir(h, l, "", False)
            bwd = self._dir(h, l, "_reverse", True)
            h = jnp.concatenate([fwd, bwd], axis=-1)
        return Linear(2 * self.dim, self.dim, dtype=self.dtype, name="linear")(h)


class Demucs(nn.Module):
    sources: Sequence[str] = ("drums", "bass", "other", "vocals")
    audio_channels: int = 2
    channels: int = 64
    growth: float = 2.0
    depth: int = 6
    kernel_size: int = 8
    stride: int = 4
    context: int = 3
    lstm_layers: int = 2
    resample: bool = True
    normalize: bool = True
    dtype: Any = jnp.float32

    def valid_length(self, length: int) -> int:
        """Nearest length ≥ `length` that survives the conv chain exactly."""
        L = length
        if self.resample:
            L *= 2
        for _ in range(self.depth):
            L = math.ceil((L - self.kernel_size) / self.stride) + 1
            L = max(L, 1)
        for _ in range(self.depth):
            L = (L - 1) * self.stride + self.kernel_size
        if self.resample:
            L = math.ceil(L / 2)
        return int(L)

    @nn.compact
    def __call__(self, mix: jax.Array) -> jax.Array:
        """mix: (B, T, audio_channels) -> (B, n_sources, T, audio_channels)."""
        B, T, C = mix.shape
        x = mix
        if self.normalize:
            mono = mix.mean(axis=-1, keepdims=True)
            mean = mono.mean(axis=1, keepdims=True)
            std = mono.std(axis=1, keepdims=True) + 1e-5
            x = (x - mean) / std
        if self.resample:
            x = jnp.swapaxes(resample_poly(jnp.swapaxes(x, 1, 2), 2, 1), 1, 2)
        skips = []
        cin = self.audio_channels
        ch = self.channels
        for i in range(self.depth):
            x = Conv1d(cin, ch, self.kernel_size, stride=self.stride,
                       dtype=self.dtype, name=f"encoder_{i}_0")(x)
            x = jax.nn.gelu(x, approximate=False)
            x = Conv1d(ch, 2 * ch, 1, dtype=self.dtype, name=f"encoder_{i}_2")(x)
            a, b = jnp.split(x, 2, axis=-1)
            x = a * jax.nn.sigmoid(b)  # GLU
            skips.append(x)
            cin = ch
            ch = int(ch * self.growth)
        if self.lstm_layers:
            x = x + 0  # keep dtype
            x = BiLSTM(cin, self.lstm_layers, dtype=self.dtype, name="lstm")(x)
        n_src = len(self.sources)
        ch = cin
        for i in range(self.depth):
            skip = skips.pop()
            x = x + skip[:, : x.shape[1]]
            cout = int(ch / self.growth) if i < self.depth - 1 else n_src * self.audio_channels
            x = Conv1d(ch, 2 * ch, self.context, padding=(self.context - 1) // 2,
                       dtype=self.dtype, name=f"decoder_{i}_0")(x)
            a, b = jnp.split(x, 2, axis=-1)
            x = a * jax.nn.sigmoid(b)
            x = ConvTranspose1d(ch, cout, self.kernel_size, stride=self.stride,
                                dtype=self.dtype, name=f"decoder_{i}_2")(x)
            if i < self.depth - 1:
                x = jax.nn.gelu(x, approximate=False)
                ch = cout
        if self.resample:
            x = jnp.swapaxes(resample_poly(jnp.swapaxes(x, 1, 2), 1, 2), 1, 2)
        x = x[:, :T]
        out = x.reshape(B, x.shape[1], n_src, self.audio_channels)
        out = out.transpose(0, 2, 1, 3)
        if self.normalize:
            out = out * std[:, None] + mean[:, None]
        return out


def apply_model(
    apply_fn,
    mix: np.ndarray,
    segment_samples: int,
    overlap: float = 0.25,
    shifts: int = 1,
    max_shift: int = 22050,
    seed: int = 0,
) -> np.ndarray:
    """Chunked inference with random shifts + triangular overlap-add
    (reference demucs/apply.py:124-230 semantics).

    apply_fn: (B, T, C) -> (B, S, T, C) jitted model; mix: (C, T) numpy.
    """
    rng = np.random.default_rng(seed)
    C, T = mix.shape
    results = []
    for _ in range(max(shifts, 1)):
        offset = int(rng.integers(0, max_shift)) if shifts > 1 else 0
        shifted = np.pad(mix, ((0, 0), (max_shift - offset, offset)))
        out = _apply_chunks(apply_fn, shifted, segment_samples, overlap)
        results.append(out[:, :, max_shift - offset : max_shift - offset + T])
    return np.mean(results, axis=0)


def _apply_chunks(apply_fn, mix: np.ndarray, segment: int, overlap: float) -> np.ndarray:
    C, T = mix.shape
    stride = int(segment * (1 - overlap))
    starts = list(range(0, max(T - segment, 0) + 1, stride)) or [0]
    if starts[-1] + segment < T:
        starts.append(T - segment)
    chunks = []
    for s in starts:
        seg = mix[:, s : s + segment]
        if seg.shape[1] < segment:
            seg = np.pad(seg, ((0, 0), (0, segment - seg.shape[1])))
        chunks.append(seg.T)  # (T, C)
    batch = jnp.asarray(np.stack(chunks), jnp.float32)
    outs = np.asarray(apply_fn(batch))  # (N, S, T, C)
    n_src = outs.shape[1]
    acc = np.zeros((n_src, C, T), np.float32)
    weight_sum = np.zeros(T, np.float32)
    tri = np.concatenate([np.arange(1, segment // 2 + 1),
                          np.arange(segment - segment // 2, 0, -1)]).astype(np.float32)
    tri /= tri.max()
    for i, s in enumerate(starts):
        n = min(segment, T - s)
        acc[:, :, s : s + n] += (outs[i, :, :n].transpose(0, 2, 1)) * tri[:n]
        weight_sum[s : s + n] += tri[:n]
    return acc / np.maximum(weight_sum, 1e-8)
