"""Gated dilated-conv WaveNet block (the VITS "WN").

Matches reference lib/infer_pack/modules.py:132-217: per-layer dilated
in_conv → fused add-tanh-sigmoid gate with a global conditioning slice →
1x1 res/skip conv; all convs weight-normalized. Used by the posterior
encoder and the coupling flows.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv1d


def gated_activation(x: jnp.ndarray, g: jnp.ndarray, channels: int) -> jnp.ndarray:
    """tanh(a) * sigmoid(b) over the channel split (commons.fused_add_tanh_sigmoid_multiply)."""
    s = x + g
    return jnp.tanh(s[..., :channels]) * nn.sigmoid(s[..., channels:])


class WN(nn.Module):
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, g=None, deterministic=True):
        # x: (B, T, H); g: (B, 1, gin) or (B, T, gin) or None
        output = jnp.zeros_like(x)
        if g is not None:
            g_all = Conv1d(
                self.gin_channels,
                2 * self.hidden_channels * self.n_layers,
                1,
                weight_norm=True,
                dtype=self.dtype,
                name="cond_layer",
            )(g)
        for i in range(self.n_layers):
            dilation = self.dilation_rate**i
            padding = (self.kernel_size * dilation - dilation) // 2
            x_in = Conv1d(
                self.hidden_channels,
                2 * self.hidden_channels,
                self.kernel_size,
                dilation=dilation,
                padding=padding,
                weight_norm=True,
                dtype=self.dtype,
                name=f"in_layers_{i}",
            )(x)
            if g is not None:
                off = i * 2 * self.hidden_channels
                g_l = g_all[..., off : off + 2 * self.hidden_channels]
            else:
                g_l = jnp.zeros_like(x_in)
            acts = gated_activation(x_in, g_l, self.hidden_channels)
            if self.p_dropout > 0 and not deterministic:
                acts = nn.Dropout(self.p_dropout, deterministic=False)(acts)
            res_skip_ch = (
                2 * self.hidden_channels if i < self.n_layers - 1 else self.hidden_channels
            )
            res_skip = Conv1d(
                self.hidden_channels,
                res_skip_ch,
                1,
                weight_norm=True,
                dtype=self.dtype,
                name=f"res_skip_layers_{i}",
            )(acts)
            if i < self.n_layers - 1:
                x = (x + res_skip[..., : self.hidden_channels]) * x_mask
                output = output + res_skip[..., self.hidden_channels :]
            else:
                output = output + res_skip
        return output * x_mask
