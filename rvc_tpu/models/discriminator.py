"""GAN discriminators: multi-period + scale (reference models.py:1024-1146).

DiscriminatorS is a grouped-conv scale discriminator; DiscriminatorP folds
the waveform into (T/period, period) and runs 2-D convs down the time
axis. V1 uses periods [2,3,5,7,11,17], V2 adds [23,37].

TPU notes: all convs are weight-normalized (training parity); the period
fold is a reshape (reflect-pad to a multiple of the period). Activations
channels-last: 1-D (B, T, C); 2-D (B, T/p, p, C).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv1d, Conv2dTorch as _Conv2dBase, leaky_relu, LRELU_SLOPE


class Conv2dTorch(_Conv2dBase):
    """Discriminator 2-D conv: weight-normalized by default."""

    weight_norm: bool = True


class DiscriminatorS(nn.Module):
    dtype: Any = jnp.float32
    # width multiplier for tiny validation configs (dryruns/tests): scales
    # every internal channel count; 1.0 is the reference topology (and the
    # only value checkpoints exist for). Grouped convs collapse to groups=1
    # when scaled — group counts don't divide the shrunken widths.
    scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        """x: (B, T, 1) -> (logits_flat, feature_maps)."""
        fmap = []
        specs = [
            (1, 16, 15, 1, 1, 7),
            (16, 64, 41, 4, 4, 20),
            (64, 256, 41, 4, 16, 20),
            (256, 1024, 41, 4, 64, 20),
            (1024, 1024, 41, 4, 256, 20),
            (1024, 1024, 5, 1, 1, 2),
        ]
        c = (lambda n: n if n == 1 or self.scale == 1.0
             else max(1, int(n * self.scale)))
        for i, (ci, co, k, s, g, p) in enumerate(specs):
            x = Conv1d(c(ci), c(co), k, stride=s,
                       groups=g if self.scale == 1.0 else 1, padding=p,
                       weight_norm=True, dtype=self.dtype, name=f"convs_{i}")(x)
            x = leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = Conv1d(c(1024), 1, 3, padding=1, weight_norm=True, dtype=self.dtype,
                   name="conv_post")(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


class DiscriminatorP(nn.Module):
    period: int
    kernel_size: int = 5
    stride: int = 3
    dtype: Any = jnp.float32
    scale: float = 1.0  # width multiplier (see DiscriminatorS.scale)

    @nn.compact
    def __call__(self, x):
        """x: (B, T, 1) -> (logits_flat, feature_maps)."""
        B, T, C = x.shape
        if T % self.period != 0:
            n_pad = self.period - (T % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            T = T + n_pad
        x = x.reshape(B, T // self.period, self.period, C)
        fmap = []
        chans = [(1, 32), (32, 128), (128, 512), (512, 1024)]
        pad = (self.kernel_size - 1) // 2
        c = (lambda n: n if n == 1 or self.scale == 1.0
             else max(1, int(n * self.scale)))
        for i, (ci, co) in enumerate(chans):
            x = Conv2dTorch(c(ci), c(co), (self.kernel_size, 1), (self.stride, 1),
                            (pad, 0), dtype=self.dtype, name=f"convs_{i}")(x)
            x = leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = Conv2dTorch(c(1024), c(1024), (self.kernel_size, 1), (1, 1), (pad, 0),
                        dtype=self.dtype, name="convs_4")(x)
        x = leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = Conv2dTorch(c(1024), 1, (3, 1), (1, 1), (1, 0), dtype=self.dtype,
                        name="conv_post")(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


PERIODS_V1 = (2, 3, 5, 7, 11, 17)
PERIODS_V2 = (2, 3, 5, 7, 11, 17, 23, 37)


class MultiPeriodDiscriminator(nn.Module):
    """Scale + period ensemble. version 'v1'/'v2' picks the period set."""

    version: str = "v2"
    dtype: Any = jnp.float32
    scale: float = 1.0  # width multiplier (see DiscriminatorS.scale)

    @nn.compact
    def __call__(self, y, y_hat):
        periods = PERIODS_V2 if self.version == "v2" else PERIODS_V1
        discs = [DiscriminatorS(dtype=self.dtype, scale=self.scale,
                                name="discriminators_0")] + [
            DiscriminatorP(p, dtype=self.dtype, scale=self.scale,
                           name=f"discriminators_{i + 1}")
            for i, p in enumerate(periods)
        ]
        # real and fake ride ONE batched pass per sub-discriminator (convs
        # and leaky-relus are per-sample, so this is numerically identical
        # to two passes) — the train step is kernel-count-bound on TPU and
        # this halves the ensemble's ~300 conv launches per direction
        B = y.shape[0]
        both = jnp.concatenate([y, y_hat], axis=0)
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for d in discs:
            rg, frg = d(both)
            y_d_rs.append(rg[:B])
            y_d_gs.append(rg[B:])
            fmap_rs.append([m[:B] for m in frg])
            fmap_gs.append([m[B:] for m in frg])
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
