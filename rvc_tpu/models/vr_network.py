"""UVR5 "VR architecture" magnitude-mask networks.

Reference: lib/uvr5_pack/vr_network/{nets.py,layers.py} — CascadedASPPNet:
two half-band ASPP U-nets cascaded into full-band refiners, sigmoid mask,
aggressiveness exponent (nets.py:104-113), 128-frame edge offset.

Channels-last (B, F, T, C)?  We use (B, T, F, C) like the rest of the
framework and transpose at the host boundary (the reference is
(B, C, F, T)). Bilinear 2× upsampling matches torch
F.interpolate(align_corners=True).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import BatchNorm, Conv2dTorch


def _bilinear_2x(x: jax.Array) -> jax.Array:
    """2× bilinear upsample (align_corners=True) over (B, H, W, C)."""
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), method="bilinear")


def _bilinear_resize(x: jax.Array, h: int, w: int) -> jax.Array:
    B, _, _, C = x.shape
    return jax.image.resize(x, (B, h, w, C), method="bilinear")


def crop_center_tf(skip: jax.Array, target_t: int) -> jax.Array:
    """Center-crop the time axis of (B, T, F, C)."""
    T = skip.shape[1]
    if T == target_t:
        return skip
    s = (T - target_t) // 2
    return skip[:, s : s + target_t]


class Conv2DBNActiv(nn.Module):
    nin: int
    nout: int
    ksize: int = 3
    stride: int = 1
    pad: int = 1
    activ: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Conv2dTorch(self.nin, self.nout, (self.ksize, self.ksize),
                        (self.stride, self.stride), (self.pad, self.pad),
                        use_bias=False, dtype=self.dtype, name="conv_0")(x)
        h = BatchNorm(self.nout, dtype=self.dtype, name="conv_1")(h)
        return jax.nn.relu(h) if self.activ == "relu" else jnp.where(h >= 0, h, 0.01 * h)


class Conv2DBNActivDil(nn.Module):
    """Conv+BN+act with dilation support (used via SeperableConv too)."""

    nin: int
    nout: int
    ksize: int
    stride: int
    pad: int
    dilation: int
    separable: bool = False
    activ: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.separable:
            w_shape = (self.nin, 1, self.ksize, self.ksize)
            import math

            bound = 1.0 / math.sqrt(self.ksize * self.ksize)
            w = self.param("conv_0_weight",
                           lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
                           w_shape)
            h = jax.lax.conv_general_dilated(
                x.astype(self.dtype), w.astype(self.dtype),
                window_strides=(self.stride, self.stride),
                padding=[(self.pad, self.pad)] * 2,
                rhs_dilation=(self.dilation, self.dilation),
                dimension_numbers=("NHWC", "OIHW", "NHWC"),
                feature_group_count=self.nin,
            )
            h = Conv2dTorch(self.nin, self.nout, (1, 1), use_bias=False,
                            dtype=self.dtype, name="conv_1")(h)
            h = BatchNorm(self.nout, dtype=self.dtype, name="conv_2")(h)
        else:
            import math

            w_shape = (self.nout, self.nin, self.ksize, self.ksize)
            bound = 1.0 / math.sqrt(self.nin * self.ksize * self.ksize)
            w = self.param("conv_0_weight",
                           lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
                           w_shape)
            h = jax.lax.conv_general_dilated(
                x.astype(self.dtype), w.astype(self.dtype),
                window_strides=(self.stride, self.stride),
                padding=[(self.pad, self.pad)] * 2,
                rhs_dilation=(self.dilation, self.dilation),
                dimension_numbers=("NHWC", "OIHW", "NHWC"),
            )
            h = BatchNorm(self.nout, dtype=self.dtype, name="conv_1")(h)
        return jax.nn.relu(h)


class EncoderVR(nn.Module):
    nin: int
    nout: int
    stride: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        skip = Conv2DBNActiv(self.nin, self.nout, 3, 1, 1, activ="leaky",
                             dtype=self.dtype, name="conv1")(x)
        h = Conv2DBNActiv(self.nout, self.nout, 3, self.stride, 1, activ="leaky",
                          dtype=self.dtype, name="conv2")(skip)
        return h, skip


class DecoderVR(nn.Module):
    nin: int
    nout: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        x = _bilinear_2x(x)
        if skip is not None:
            skip = crop_center_tf(skip, x.shape[1])
            # frequency axis can be off by one after odd-sized pooling
            f = min(x.shape[2], skip.shape[2])
            x = jnp.concatenate([x[:, :, :f], skip[:, :, :f]], axis=-1)
        return Conv2DBNActiv(self.nin, self.nout, 3, 1, 1, dtype=self.dtype,
                             name="conv")(x)


class ASPPModule(nn.Module):
    nin: int
    nout: int
    dilations: Sequence[int] = (4, 8, 16)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, F, C = x.shape
        # torch AdaptiveAvgPool2d((1, None)) on (B, C, bins, frames)
        # collapses the frequency axis; ours is axis 2.
        pooled = x.mean(axis=2, keepdims=True)
        feat1 = Conv2DBNActiv(self.nin, self.nin, 1, 1, 0, dtype=self.dtype,
                              name="conv1_1")(pooled)
        feat1 = jnp.broadcast_to(feat1, x.shape)
        feat2 = Conv2DBNActiv(self.nin, self.nin, 1, 1, 0, dtype=self.dtype,
                              name="conv2")(x)
        feats = [feat1, feat2]
        for i, d in enumerate(self.dilations):
            feats.append(
                Conv2DBNActivDil(self.nin, self.nin, 3, 1, d, d, separable=True,
                                 dtype=self.dtype, name=f"conv{i + 3}")(x)
            )
        out = jnp.concatenate(feats, axis=-1)
        return Conv2DBNActiv(self.nin * 5, self.nout, 1, 1, 0, dtype=self.dtype,
                             name="bottleneck_0")(out)


class BaseASPPNet(nn.Module):
    nin: int
    ch: int
    dilations: Sequence[int] = (4, 8, 16)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = self.ch
        h, e1 = EncoderVR(self.nin, ch, dtype=self.dtype, name="enc1")(x)
        h, e2 = EncoderVR(ch, ch * 2, dtype=self.dtype, name="enc2")(h)
        h, e3 = EncoderVR(ch * 2, ch * 4, dtype=self.dtype, name="enc3")(h)
        h, e4 = EncoderVR(ch * 4, ch * 8, dtype=self.dtype, name="enc4")(h)
        h = ASPPModule(ch * 8, ch * 16, self.dilations, dtype=self.dtype, name="aspp")(h)
        h = DecoderVR(ch * (8 + 16), ch * 8, dtype=self.dtype, name="dec4")(h, e4)
        h = DecoderVR(ch * (4 + 8), ch * 4, dtype=self.dtype, name="dec3")(h, e3)
        h = DecoderVR(ch * (2 + 4), ch * 2, dtype=self.dtype, name="dec2")(h, e2)
        h = DecoderVR(ch * (1 + 2), ch, dtype=self.dtype, name="dec1")(h, e1)
        return h


class CascadedASPPNet(nn.Module):
    """The 4-band VR separator (reference nets.py:39-122).

    Input/output: (B, T, bins, 2) magnitude spectrogram (channels = stereo).
    Returns the sigmoid mask (apply to the mix spectrogram on the host or
    fused downstream).
    """

    n_fft: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, aggressiveness: dict | None = None):
        max_bin = self.n_fft // 2
        output_bin = self.n_fft // 2 + 1
        mix = x
        x = x[:, :, :max_bin]
        bandw = x.shape[2] // 2
        aux1 = jnp.concatenate(
            [
                BaseASPPNet(2, 32, dtype=self.dtype, name="stg1_low_band_net")(x[:, :, :bandw]),
                BaseASPPNet(2, 32, dtype=self.dtype, name="stg1_high_band_net")(x[:, :, bandw:]),
            ],
            axis=2,
        )
        h = jnp.concatenate([x, aux1], axis=-1)
        aux2 = BaseASPPNet(16, 32, dtype=self.dtype, name="stg2_full_band_net")(
            Conv2DBNActiv(34, 16, 1, 1, 0, dtype=self.dtype, name="stg2_bridge")(h)
        )
        h = jnp.concatenate([x, aux1, aux2], axis=-1)
        h = BaseASPPNet(32, 64, dtype=self.dtype, name="stg3_full_band_net")(
            Conv2DBNActiv(66, 32, 1, 1, 0, dtype=self.dtype, name="stg3_bridge")(h)
        )
        mask = jax.nn.sigmoid(
            Conv2dTorch(64, 2, (1, 1), use_bias=False, dtype=self.dtype, name="out")(h)
        )
        # replicate-pad the frequency axis up to output_bin
        pad_f = output_bin - mask.shape[2]
        if pad_f > 0:
            mask = jnp.concatenate(
                [mask, jnp.repeat(mask[:, :, -1:], pad_f, axis=2)], axis=2
            )
        if aggressiveness is not None:
            sb = aggressiveness["split_bin"]
            v = aggressiveness["value"]
            low = jnp.power(mask[:, :, :sb], 1 + v / 3)
            high = jnp.power(mask[:, :, sb:], 1 + v)
            mask = jnp.concatenate([low, high], axis=2)
        return mask
