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


def _interp_axis_align(x: jax.Array, axis: int, out_len: int) -> jax.Array:
    """1-D linear interpolation with torch align_corners=True semantics."""
    n = x.shape[axis]
    if n == 1:
        reps = [1] * x.ndim
        reps[axis] = out_len
        return jnp.tile(x, reps)
    pos = jnp.arange(out_len) * ((n - 1) / (out_len - 1))
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n - 1)
    w = (pos - lo).astype(x.dtype)
    xl = jnp.take(x, lo, axis=axis)
    xh = jnp.take(x, hi, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_len
    w = w.reshape(shape)
    return xl * (1 - w) + xh * w


def _bilinear_2x(x: jax.Array) -> jax.Array:
    """2× bilinear upsample matching torch F.interpolate(scale_factor=2,
    mode='bilinear', align_corners=True) over (B, H, W, C). (jax.image
    .resize is half-pixel / align_corners=False — systematically offset.)"""
    B, H, W, C = x.shape
    x = _interp_axis_align(x, 1, 2 * H)
    return _interp_axis_align(x, 2, 2 * W)


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
    pad: Any
    dilation: Any
    separable: bool = False
    activ: str = "relu"
    dtype: Any = jnp.float32

    def _dil(self):
        d = self.dilation
        return d if isinstance(d, tuple) else (d, d)

    def _pad(self):
        p = self.pad
        return p if isinstance(p, tuple) else (p, p)

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
                padding=[(self._pad()[0],) * 2, (self._pad()[1],) * 2],
                rhs_dilation=self._dil(),
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
                padding=[(self._pad()[0],) * 2, (self._pad()[1],) * 2],
                rhs_dilation=self._dil(),
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


class LSTMModule(nn.Module):
    """Frequency-summary BiLSTM branch (reference layers_new.LSTMModule)."""

    nin_conv: int
    nin_lstm: int
    nout_lstm: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import numpy as np

        from .demucs import BiLSTM as _BiLSTM  # torch-naming LSTM scan

        B, T, F, C = x.shape
        h = Conv2DBNActiv(self.nin_conv, 1, 1, 1, 0, dtype=self.dtype, name="conv")(x)
        h = h[..., 0]  # (B, T, F)
        # reference LSTM is over frames with nbins features
        from .layers import Linear

        lstm = _OneLayerBiLSTM(self.nin_lstm, self.nout_lstm // 2, dtype=self.dtype,
                               name="lstm")
        h = lstm(h)  # (B, T, nout_lstm)
        h = Linear(self.nout_lstm, self.nin_lstm, dtype=self.dtype, name="dense_0")(h)
        h = _BatchNorm1dOverFeatures(self.nin_lstm, dtype=self.dtype, name="dense_1")(h)
        h = jax.nn.relu(h)
        return h[..., None]  # (B, T, nin_lstm, 1)


class _OneLayerBiLSTM(nn.Module):
    input_size: int
    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import numpy as np

        def direction(suffix, reverse):
            bound = 1.0 / np.sqrt(self.hidden)
            init = lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound)  # noqa: E731
            w_ih = self.param(f"weight_ih_l0{suffix}", init, (4 * self.hidden, self.input_size))
            w_hh = self.param(f"weight_hh_l0{suffix}", init, (4 * self.hidden, self.hidden))
            b_ih = self.param(f"bias_ih_l0{suffix}", init, (4 * self.hidden,))
            b_hh = self.param(f"bias_hh_l0{suffix}", init, (4 * self.hidden,))
            xg = jnp.matmul(x.astype(self.dtype), w_ih.T.astype(self.dtype)) + b_ih
            if reverse:
                xg = jnp.flip(xg, axis=1)
            w_hh_t = w_hh.T.astype(self.dtype)

            def step(carry, xt):
                h, c = carry
                g = xt + jnp.matmul(h, w_hh_t) + b_hh
                i, f, gg, o = jnp.split(g, 4, axis=-1)
                c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
                h = jax.nn.sigmoid(o) * jnp.tanh(c)
                return (h, c), h

            B = x.shape[0]
            h0 = (jnp.zeros((B, self.hidden), self.dtype),
                  jnp.zeros((B, self.hidden), self.dtype))
            _, ys = jax.lax.scan(step, h0, jnp.swapaxes(xg, 0, 1))
            ys = jnp.swapaxes(ys, 0, 1)
            return jnp.flip(ys, axis=1) if reverse else ys

        return jnp.concatenate([direction("", False), direction("_reverse", True)], -1)


class _BatchNorm1dOverFeatures(nn.Module):
    """Inference BatchNorm1d over the feature axis, torch param names."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", lambda k, s: jnp.ones(s, jnp.float32), (self.features,))
        b = self.param("bias", lambda k, s: jnp.zeros(s, jnp.float32), (self.features,))
        mean = self.param("running_mean", lambda k, s: jnp.zeros(s, jnp.float32),
                          (self.features,))
        var = self.param("running_var", lambda k, s: jnp.ones(s, jnp.float32),
                         (self.features,))
        scale = w * jax.lax.rsqrt(var + 1e-5)
        return (x.astype(jnp.float32) * scale + (b - mean * scale)).astype(self.dtype)


class EncoderNew(nn.Module):
    """layers_new.Encoder: stride conv first, then refine conv."""

    nin: int
    nout: int
    stride: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Conv2DBNActiv(self.nin, self.nout, 3, self.stride, 1, activ="leaky",
                          dtype=self.dtype, name="conv1")(x)
        return Conv2DBNActiv(self.nout, self.nout, 3, 1, 1, activ="leaky",
                             dtype=self.dtype, name="conv2")(h)


class BaseNet(nn.Module):
    """VR 'new' U-net with dilated ASPP + LSTM branch (reference
    nets_new.BaseNet)."""

    nin: int
    nout: int
    nin_lstm: int
    nout_lstm: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = self.nout
        e1 = Conv2DBNActiv(self.nin, n, 3, 1, 1, dtype=self.dtype, name="enc1")(x)
        e2 = EncoderNew(n, n * 2, dtype=self.dtype, name="enc2")(e1)
        e3 = EncoderNew(n * 2, n * 4, dtype=self.dtype, name="enc3")(e2)
        e4 = EncoderNew(n * 4, n * 6, dtype=self.dtype, name="enc4")(e3)
        e5 = EncoderNew(n * 6, n * 8, dtype=self.dtype, name="enc5")(e4)
        h = ASPPModuleNew(n * 8, n * 8, ((4, 2), (8, 4), (12, 6)), dtype=self.dtype,
                          name="aspp")(e5)
        h = DecoderVR(n * (6 + 8), n * 6, dtype=self.dtype, name="dec4")(h, e4)
        h = DecoderVR(n * (4 + 6), n * 4, dtype=self.dtype, name="dec3")(h, e3)
        h = DecoderVR(n * (2 + 4), n * 2, dtype=self.dtype, name="dec2")(h, e2)
        lstm_out = LSTMModule(n * 2, self.nin_lstm, self.nout_lstm, dtype=self.dtype,
                              name="lstm_dec2")(h)
        # lstm branch outputs (B, T, nin_lstm, 1); frequency dims match h's F
        f = min(h.shape[2], lstm_out.shape[2])
        h = jnp.concatenate([h[:, :, :f], lstm_out[:, : h.shape[1], :f]], axis=-1)
        h = DecoderVR(n * (1 + 2) + 1, n, dtype=self.dtype, name="dec1")(h, e1)
        return h


class ASPPModuleNew(nn.Module):
    """nets_new ASPP: anisotropic dilations, non-separable convs."""

    nin: int
    nout: int
    dilations: Sequence[tuple] = ((4, 2), (8, 4), (12, 6))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pooled = x.mean(axis=2, keepdims=True)
        feat1 = Conv2DBNActiv(self.nin, self.nout, 1, 1, 0, dtype=self.dtype,
                              name="conv1_1")(pooled)
        feat1 = jnp.broadcast_to(feat1, (*x.shape[:3], self.nout))
        feat2 = Conv2DBNActiv(self.nin, self.nout, 1, 1, 0, dtype=self.dtype,
                              name="conv2")(x)
        feats = [feat1, feat2]
        for i, d in enumerate(self.dilations):
            # reference dilations are (freq, time); our spatial dims are (T, F)
            dil = (d[1], d[0])
            feats.append(
                Conv2DBNActivDil(self.nin, self.nout, 3, 1, dil, dil,
                                 dtype=self.dtype, name=f"conv{i + 3}")(x)
            )
        return Conv2DBNActiv(self.nout * 5, self.nout, 1, 1, 0, dtype=self.dtype,
                             name="bottleneck")(jnp.concatenate(feats, axis=-1))


class CascadedNet(nn.Module):
    """VR 'new' cascade (reference nets_new.CascadedNet) — the DeEcho /
    DeReverb model family. Input (B, T, bins, 2); returns the sigmoid mask.
    offset = 64 frames."""

    n_fft: int
    nout: int = 32
    nout_lstm: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        max_bin = self.n_fft // 2
        output_bin = self.n_fft // 2 + 1
        nin_lstm = max_bin // 2
        nout = self.nout
        x = x[:, :, :max_bin]
        bandw = x.shape[2] // 2
        l1_in, h1_in = x[:, :, :bandw], x[:, :, bandw:]
        l1 = BaseNet(2, nout // 2, nin_lstm // 2, self.nout_lstm, dtype=self.dtype,
                     name="stg1_low_band_net_0")(l1_in)
        l1 = Conv2DBNActiv(nout // 2, nout // 4, 1, 1, 0, dtype=self.dtype,
                           name="stg1_low_band_net_1")(l1)
        h1 = BaseNet(2, nout // 4, nin_lstm // 2, self.nout_lstm // 2,
                     dtype=self.dtype, name="stg1_high_band_net")(h1_in)
        aux1 = jnp.concatenate([l1, h1], axis=2)
        l2_in = jnp.concatenate([l1_in, l1], axis=-1)
        h2_in = jnp.concatenate([h1_in, h1], axis=-1)
        l2 = BaseNet(nout // 4 + 2, nout, nin_lstm // 2, self.nout_lstm,
                     dtype=self.dtype, name="stg2_low_band_net_0")(l2_in)
        l2 = Conv2DBNActiv(nout, nout // 2, 1, 1, 0, dtype=self.dtype,
                           name="stg2_low_band_net_1")(l2)
        h2 = BaseNet(nout // 4 + 2, nout // 2, nin_lstm // 2, self.nout_lstm // 2,
                     dtype=self.dtype, name="stg2_high_band_net")(h2_in)
        aux2 = jnp.concatenate([l2, h2], axis=2)
        f3_in = jnp.concatenate([x, aux1, aux2], axis=-1)
        f3 = BaseNet(3 * nout // 4 + 2, nout, nin_lstm, self.nout_lstm,
                     dtype=self.dtype, name="stg3_full_band_net")(f3_in)
        mask = jax.nn.sigmoid(
            Conv2dTorch(nout, 2, (1, 1), use_bias=False, dtype=self.dtype,
                        name="out")(f3)
        )
        pad_f = output_bin - mask.shape[2]
        if pad_f > 0:
            mask = jnp.concatenate(
                [mask, jnp.repeat(mask[:, :, -1:], pad_f, axis=2)], axis=2)
        return mask
