"""Conv-TasNet time-domain separator (demucs v2 family member).

Reference: lib/uvr5_pack/demucs/tasnet_v2.py (Luo & Mesgarani's
Conv-TasNet as vendored by demucs v2; routed when 'tasnet' is in the
model name, lib/uvr5_pack/demucs/model_v2.py:52).

TPU-first design, not a translation:
  * channels-last (B, K, N) frames — every 1x1 conv in the reference
    becomes a dense matmul that tiles onto the MXU (N=256/H=512 fill the
    128-lane registers exactly);
  * the only non-matmul op per block is the P=3 dilated depthwise conv,
    expressed as 3 shifted adds (cheaper than lax depthwise conv for
    kernel 3, and XLA fuses it into the surrounding elementwise chain);
  * gLN/cLN are fused jnp reductions (no BatchNorm state);
  * the decoder's 50% overlap-add is two half-frame shifted sums via
    pad+reshape — no scatter (TPU scatters serialize, adds tile);
  * chunk batching and triangular overlap-add ride the shared
    models/demucs.apply_model driver, one device dispatch per song.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv1d, Linear

EPS = 1e-8


def _prelu(x: jax.Array, w: jax.Array) -> jax.Array:
    w = w.astype(x.dtype)
    return jnp.maximum(x, 0) + w * jnp.minimum(x, 0)


class _Norm(nn.Module):
    """gLN (over channels+time) or cLN (over channels per step) with the
    reference's (gamma, beta) parameters. Input (B, K, N) channels-last."""

    channels: int
    kind: str = "gLN"  # gLN | cLN | id

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.kind == "id":
            return x
        gamma = self.param("gamma", lambda k, s: jnp.ones(s, jnp.float32),
                           (self.channels,))
        beta = self.param("beta", lambda k, s: jnp.zeros(s, jnp.float32),
                          (self.channels,))
        axes = (1, 2) if self.kind == "gLN" else (2,)
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=axes, keepdims=True)
        var = jnp.square(x32 - mean).mean(axis=axes, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + EPS)
        return (gamma * y + beta).astype(x.dtype)


class _TemporalBlock(nn.Module):
    """1x1 -> PReLU -> norm -> dilated depthwise -> PReLU -> norm -> 1x1,
    residual around the whole block (reference TemporalBlock)."""

    bottleneck: int  # B
    hidden: int      # H
    kernel: int      # P
    dilation: int
    norm: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        res = x
        y = Linear(self.bottleneck, self.hidden, use_bias=False,
                   dtype=self.dtype, name="conv1x1")(x)
        y = _prelu(y, self.param("prelu1", lambda k, s: jnp.full(s, 0.25,
                                                                 jnp.float32), (1,)))
        y = _Norm(self.hidden, self.norm, name="norm1")(y)
        # dilated depthwise conv, kernel P, 'same' padding: for the small
        # P used by every shipped checkpoint, shifted adds beat a grouped
        # conv (each tap is one roll + fused multiply-add)
        dw = self.param("dw_weight", nn.initializers.normal(0.02),
                        (self.kernel, self.hidden), jnp.float32)
        pad = (self.kernel - 1) * self.dilation // 2
        yp = jnp.pad(y, ((0, 0), (pad, pad), (0, 0)))
        K = y.shape[1]
        acc = None
        for t in range(self.kernel):
            tap = jax.lax.dynamic_slice_in_dim(yp, t * self.dilation, K, axis=1)
            term = tap * dw[t].astype(y.dtype)
            acc = term if acc is None else acc + term
        y = acc
        y = _prelu(y, self.param("prelu2", lambda k, s: jnp.full(s, 0.25,
                                                                 jnp.float32), (1,)))
        y = _Norm(self.hidden, self.norm, name="norm2")(y)
        y = Linear(self.hidden, self.bottleneck, use_bias=False,
                   dtype=self.dtype, name="pointwise")(y)
        return res + y


class ConvTasNet(nn.Module):
    """mix (B, T, audio_channels) -> stems (B, n_sources, T, audio_channels).

    Defaults mirror the demucs v2 'tasnet' checkpoints (X=10,
    model_v2.py:53); the classic paper config uses X=8.
    """

    sources: Sequence[str] = ("drums", "bass", "other", "vocals")
    audio_channels: int = 2
    N: int = 256
    L: int = 20
    B: int = 256
    H: int = 512
    P: int = 3
    X: int = 10
    R: int = 4
    norm_type: str = "gLN"
    mask_nonlinear: str = "relu"
    samplerate: int = 44100
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mix: jax.Array) -> jax.Array:
        Bt, T, ac = mix.shape
        C = len(self.sources)
        step = self.L // 2
        # encoder: strided conv (50% frame overlap) + relu -> (B, K, N)
        w = jax.nn.relu(Conv1d(ac, self.N, self.L, stride=step, use_bias=False,
                               dtype=self.dtype, name="encoder_U")(
            mix.astype(self.dtype)))
        K = w.shape[1]

        # separator: cLN -> bottleneck -> R x X temporal blocks -> mask
        y = _Norm(self.N, "cLN", name="layer_norm")(w)
        y = Linear(self.N, self.B, use_bias=False, dtype=self.dtype,
                   name="bottleneck")(y)
        for r in range(self.R):
            for x_i in range(self.X):
                y = _TemporalBlock(self.B, self.H, self.P, 2 ** x_i,
                                   self.norm_type, dtype=self.dtype,
                                   name=f"block_{r}_{x_i}")(y)
        score = Linear(self.B, C * self.N, use_bias=False, dtype=self.dtype,
                       name="mask_conv")(y)
        score = score.reshape(Bt, K, C, self.N)
        if self.mask_nonlinear == "softmax":
            mask = jax.nn.softmax(score, axis=2)
        else:
            mask = jax.nn.relu(score)

        # decoder: masked frames -> basis signals -> 50% overlap-add
        src = w[:, :, None, :] * mask  # (B, K, C, N)
        frames = Linear(self.N, ac * self.L, use_bias=False, dtype=self.dtype,
                        name="basis_signals")(src)  # (B, K, C, ac*L)
        frames = frames.reshape(Bt, K, C, ac, self.L).transpose(0, 2, 3, 1, 4)
        first, second = frames[..., :step], frames[..., step:]
        z = jnp.zeros_like(first[..., :1, :])
        out = (jnp.concatenate([first, z], axis=-2)
               + jnp.concatenate([z, second], axis=-2))  # (B,C,ac,K+1,step)
        out = out.reshape(Bt, C, ac, (K + 1) * step)
        out = out[..., :T]
        if out.shape[-1] < T:
            out = jnp.pad(out, ((0, 0),) * 3 + ((0, T - out.shape[-1]),))
        return out.transpose(0, 1, 3, 2).astype(jnp.float32)
