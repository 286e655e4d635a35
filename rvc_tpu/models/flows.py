"""Normalizing-flow blocks: residual coupling (the RVC flow) plus the
spline flows used by the VITS duration predictor.

Matches reference lib/infer_pack/modules.py:362-518 and transforms.py
(piecewise rational-quadratic spline). The coupling layer is mean-only in
RVC; Flip reverses the channel axis between couplings.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv1d, LayerNorm
from .wavenet import WN

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


class ResidualCouplingLayer(nn.Module):
    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    mean_only: bool = True
    fuse_wn: bool = False  # fused Pallas WN stack (ops/pallas_wavenet)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(half, self.hidden_channels, 1, dtype=self.dtype, name="pre")(x0) * x_mask
        h = WN(
            self.hidden_channels,
            self.kernel_size,
            self.dilation_rate,
            self.n_layers,
            gin_channels=self.gin_channels,
            fuse=self.fuse_wn,
            dtype=self.dtype,
            name="enc",
        )(h, x_mask, g=g)
        out_ch = half * (2 - int(self.mean_only))
        stats = Conv1d(self.hidden_channels, out_ch, 1, dtype=self.dtype, name="post")(h) * x_mask
        # ("post" is zero-initialized in the reference; import overwrites anyway)
        if self.mean_only:
            m, logs = stats, jnp.zeros_like(stats)
        else:
            m, logs = stats[..., :half], stats[..., half:]
        if not reverse:
            x1 = (m + x1 * jnp.exp(logs)) * x_mask
            logdet = jnp.sum(logs, axis=(1, 2))
            return jnp.concatenate([x0, x1], axis=-1), logdet
        x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], axis=-1), None


class ResidualCouplingBlock(nn.Module):
    """4 couplings with channel flips (reference models.ResidualCouplingBlock)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    n_flows: int = 4
    gin_channels: int = 0
    fuse_wn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False):
        layers = [
            ResidualCouplingLayer(
                self.channels,
                self.hidden_channels,
                self.kernel_size,
                self.dilation_rate,
                self.n_layers,
                gin_channels=self.gin_channels,
                mean_only=True,
                fuse_wn=self.fuse_wn,
                dtype=self.dtype,
                name=f"flows_{i * 2}",  # reference interleaves Flip modules (odd ids)
            )
            for i in range(self.n_flows)
        ]
        if not reverse:
            for layer in layers:
                x, _ = layer(x, x_mask, g=g, reverse=False)
                x = jnp.flip(x, axis=-1)
        else:
            for layer in reversed(layers):
                x = jnp.flip(x, axis=-1)
                x, _ = layer(x, x_mask, g=g, reverse=True)
        return x


class Log(nn.Module):
    @nn.compact
    def __call__(self, x, x_mask, reverse: bool = False):
        if not reverse:
            y = jnp.log(jnp.maximum(x, 1e-5)) * x_mask
            logdet = jnp.sum(-y, axis=(1, 2))
            return y, logdet
        return jnp.exp(x) * x_mask, None


class ElementwiseAffine(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x, x_mask, reverse: bool = False):
        m = self.param("m", lambda k, s: jnp.zeros(s, jnp.float32), (self.channels,))
        logs = self.param("logs", lambda k, s: jnp.zeros(s, jnp.float32), (self.channels,))
        if not reverse:
            y = (m + jnp.exp(logs) * x) * x_mask
            logdet = jnp.sum(logs * x_mask, axis=(1, 2))
            return y, logdet
        return (x - m) * jnp.exp(-logs) * x_mask, None


class DDSConv(nn.Module):
    """Dilated depth-separable conv stack (reference modules.DDSConv)."""

    channels: int
    kernel_size: int
    n_layers: int
    p_dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, g=None, deterministic=True):
        if g is not None:
            x = x + g
        for i in range(self.n_layers):
            dilation = self.kernel_size**i
            padding = (self.kernel_size * dilation - dilation) // 2
            y = Conv1d(
                self.channels,
                self.channels,
                self.kernel_size,
                groups=self.channels,
                dilation=dilation,
                padding=padding,
                dtype=self.dtype,
                name=f"convs_sep_{i}",
            )(x * x_mask)
            y = LayerNorm(self.channels, dtype=self.dtype, name=f"norms_1_{i}")(y)
            y = jax.nn.gelu(y, approximate=False)
            y = Conv1d(self.channels, self.channels, 1, dtype=self.dtype, name=f"convs_1x1_{i}")(y)
            y = LayerNorm(self.channels, dtype=self.dtype, name=f"norms_2_{i}")(y)
            y = jax.nn.gelu(y, approximate=False)
            if self.p_dropout > 0 and not deterministic:
                y = nn.Dropout(self.p_dropout, deterministic=False)(y)
            x = x + y
        return x * x_mask


def rational_quadratic_spline(
    inputs,
    unnormalized_widths,
    unnormalized_heights,
    unnormalized_derivatives,
    inverse: bool = False,
    tail_bound: float = 5.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
):
    """Piecewise rational-quadratic transform with linear tails
    (reference lib/infer_pack/transforms.py:12-209, Durkan et al. 2019).

    All element-wise + one-hot bin search — fully vectorized, no gathers
    with dynamic shapes. inputs and the unnormalized_* share leading dims;
    last dim of the unnormalized_* is num_bins.
    """
    num_bins = unnormalized_widths.shape[-1]
    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)

    # pad derivatives so boundary derivative == 1 (linear tails)
    constant = math.log(math.exp(1 - min_derivative) - 1)
    unnormalized_derivatives = jnp.pad(
        unnormalized_derivatives,
        [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)],
        constant_values=constant,
    )

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = min_bin_width + (1 - min_bin_width * num_bins) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths, [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = (2 * tail_bound) * cumwidths - tail_bound
    cumwidths = cumwidths.at[..., 0].set(-tail_bound)
    cumwidths = cumwidths.at[..., -1].set(tail_bound)
    bin_widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = min_bin_height + (1 - min_bin_height * num_bins) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights, [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = (2 * tail_bound) * cumheights - tail_bound
    cumheights = cumheights.at[..., 0].set(-tail_bound)
    cumheights = cumheights.at[..., -1].set(tail_bound)
    bin_heights = cumheights[..., 1:] - cumheights[..., :-1]

    x = jnp.clip(inputs, -tail_bound, tail_bound)
    grid = cumheights if inverse else cumwidths
    # one-hot bin membership: bin k contains x in [grid[k], grid[k+1})
    ge = (x[..., None] >= grid[..., :-1]).astype(x.dtype)
    idx_onehot = ge * (1.0 - jnp.pad(ge[..., 1:], [(0, 0)] * (ge.ndim - 1) + [(0, 1)]))

    def pick(t):
        return jnp.sum(t * idx_onehot, axis=-1)

    in_cumwidths = pick(cumwidths[..., :-1])
    in_bin_widths = pick(bin_widths)
    in_cumheights = pick(cumheights[..., :-1])
    in_bin_heights = pick(bin_heights)
    delta = in_bin_heights / in_bin_widths
    in_derivatives = pick(derivatives[..., :-1])
    in_derivatives_p1 = pick(derivatives[..., 1:])

    if inverse:
        a = (x - in_cumheights) * (
            in_derivatives + in_derivatives_p1 - 2 * delta
        ) + in_bin_heights * (delta - in_derivatives)
        b = in_bin_heights * in_derivatives - (x - in_cumheights) * (
            in_derivatives + in_derivatives_p1 - 2 * delta
        )
        c = -delta * (x - in_cumheights)
        disc = b * b - 4 * a * c
        root = (2 * c) / (-b - jnp.sqrt(jnp.maximum(disc, 0.0)))
        outputs = root * in_bin_widths + in_cumwidths
        theta_1m = root * (1 - root)
        denom = delta + (in_derivatives + in_derivatives_p1 - 2 * delta) * theta_1m
        dnum = delta**2 * (
            in_derivatives_p1 * root**2 + 2 * delta * theta_1m + in_derivatives * (1 - root) ** 2
        )
        logabsdet = -(jnp.log(dnum) - 2 * jnp.log(denom))
    else:
        theta = (x - in_cumwidths) / in_bin_widths
        theta_1m = theta * (1 - theta)
        num = in_bin_heights * (delta * theta**2 + in_derivatives * theta_1m)
        denom = delta + (in_derivatives + in_derivatives_p1 - 2 * delta) * theta_1m
        outputs = in_cumheights + num / denom
        dnum = delta**2 * (
            in_derivatives_p1 * theta**2 + 2 * delta * theta_1m + in_derivatives * (1 - theta) ** 2
        )
        logabsdet = jnp.log(dnum) - 2 * jnp.log(denom)

    outputs = jnp.where(inside, outputs, inputs)
    logabsdet = jnp.where(inside, logabsdet, 0.0)
    return outputs, logabsdet


class ConvFlow(nn.Module):
    """Spline coupling flow (reference modules.ConvFlow)."""

    in_channels: int
    filter_channels: int
    kernel_size: int
    n_layers: int
    num_bins: int = 10
    tail_bound: float = 5.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False):
        half = self.in_channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(half, self.filter_channels, 1, dtype=self.dtype, name="pre")(x0)
        h = DDSConv(
            self.filter_channels, self.kernel_size, self.n_layers, dtype=self.dtype, name="convs"
        )(h, x_mask, g=g)
        h = Conv1d(
            self.filter_channels, half * (self.num_bins * 3 - 1), 1, dtype=self.dtype, name="proj"
        )(h) * x_mask
        B, T, _ = x0.shape
        h = h.reshape(B, T, half, 3 * self.num_bins - 1)
        denom = math.sqrt(self.filter_channels)
        uw = h[..., : self.num_bins] / denom
        uh = h[..., self.num_bins : 2 * self.num_bins] / denom
        ud = h[..., 2 * self.num_bins :]
        x1t, logabsdet = rational_quadratic_spline(
            x1, uw, uh, ud, inverse=reverse, tail_bound=self.tail_bound
        )
        x = jnp.concatenate([x0, x1t], axis=-1) * x_mask
        logdet = jnp.sum(logabsdet * x_mask, axis=(1, 2))
        if not reverse:
            return x, logdet
        return x, None
