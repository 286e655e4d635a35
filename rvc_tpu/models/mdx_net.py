"""MDX-Net separation: complex-as-channels spectrogram + Conv-TDF U-net.

The reference runs these models through onnxruntime (lib/mdx.py:80-147);
here the network is native Flax (KUIELab Conv-TDF lineage, the
architecture the UVR MDX ONNX graphs implement) and the spectrogram
pack/unpack matches reference ``MDXParams.stft/istft`` (lib/mdx.py:36-52):
stereo complex STFT → 4 channels (2 ch × re/im), cropped to dim_f bins.

TPU layout: spectrogram tensors are (B, T, F, C) channels-last; the TDF
bottleneck (Linear along frequency) becomes a matmul on the F axis —
MXU-native. Chunk/margin batching (reference lib/mdx.py:90-132) stacks all
chunks into one batch.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..ops.stft import stft as _stft, istft as _istft
from .layers import Conv2dTorch, ConvTranspose2dTorch, Linear


class MDXSpectrogram:
    """Complex-as-channels STFT pack/unpack (reference MDXParams)."""

    def __init__(self, dim_f: int, dim_t: int, n_fft: int, hop: int = 1024):
        self.dim_f = dim_f
        self.dim_t = dim_t
        self.dim_c = 4
        self.n_fft = n_fft
        self.hop = hop
        self.n_bins = n_fft // 2 + 1
        self.trim = n_fft // 2
        self.chunk_size = hop * (dim_t - 1)
        self.gen_size = self.chunk_size - 2 * self.trim

    def pack(self, x: jax.Array) -> jax.Array:
        """(B, 2, chunk_size) stereo -> (B, T=dim_t, F=dim_f, C=4)."""
        B = x.shape[0]
        flat = x.reshape(-1, self.chunk_size)
        real, imag = _stft(flat, self.n_fft, self.hop, self.n_fft, center=True)
        # (B*2, T, bins) -> (B, T, bins, 4) with channel order [L.re, L.im, R.re, R.im]
        real = real.reshape(B, 2, self.dim_t, self.n_bins)
        imag = imag.reshape(B, 2, self.dim_t, self.n_bins)
        spec = jnp.stack([real[:, 0], imag[:, 0], real[:, 1], imag[:, 1]], axis=-1)
        return spec[:, :, : self.dim_f]

    def unpack(self, spec: jax.Array) -> jax.Array:
        """(B, T, dim_f, 4) -> (B, 2, chunk_size)."""
        B, T, F, C = spec.shape
        spec = jnp.pad(spec, ((0, 0), (0, 0), (0, self.n_bins - F), (0, 0)))
        real = jnp.stack([spec[..., 0], spec[..., 2]], axis=1).reshape(-1, T, self.n_bins)
        imag = jnp.stack([spec[..., 1], spec[..., 3]], axis=1).reshape(-1, T, self.n_bins)
        wave = _istft(real, imag, self.n_fft, self.hop, center=True)
        return wave.reshape(B, 2, -1)


class GroupNorm2d(nn.Module):
    """GroupNorm over channels-last (B, H, W, C), torch param names."""

    groups: int
    channels: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", lambda k, s: jnp.ones(s, jnp.float32), (self.channels,))
        b = self.param("bias", lambda k, s: jnp.zeros(s, jnp.float32), (self.channels,))
        B, H, W, C = x.shape
        xf = x.astype(jnp.float32).reshape(B, H, W, self.groups, C // self.groups)
        mu = xf.mean(axis=(1, 2, 4), keepdims=True)
        var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
        xf = (xf - mu) * jax.lax.rsqrt(var + self.eps)
        return (xf.reshape(B, H, W, C) * w + b).astype(self.dtype)


class InstanceNorm2d(nn.Module):
    """Affine instance norm over (H, W) per channel, torch param names."""

    channels: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", lambda k, s: jnp.ones(s, jnp.float32), (self.channels,))
        b = self.param("bias", lambda k, s: jnp.zeros(s, jnp.float32), (self.channels,))
        xf = x.astype(jnp.float32)
        mu = xf.mean(axis=(1, 2), keepdims=True)
        var = jnp.var(xf, axis=(1, 2), keepdims=True)
        return (((xf - mu) * jax.lax.rsqrt(var + self.eps)) * w + b).astype(self.dtype)


def _make_norm(norm_type: str, channels: int, dtype, name: str):
    if norm_type == "BatchNorm":
        from .layers import BatchNorm

        return BatchNorm(channels, dtype=dtype, name=name)
    if norm_type == "InstanceNorm":
        return InstanceNorm2d(channels, dtype=dtype, name=name)
    if norm_type.startswith("GroupNorm"):
        g = int(norm_type.replace("GroupNorm", ""))
        return GroupNorm2d(g, channels, dtype=dtype, name=name)
    return lambda x: x


def _act(act_type: str):
    if act_type == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if act_type == "relu":
        return jax.nn.relu
    if act_type.startswith("elu"):
        alpha = float(act_type.replace("elu", "") or 1.0)
        return lambda x: jax.nn.elu(x, alpha)
    raise ValueError(act_type)


class TFCTDF(nn.Module):
    """l × (TFC conv → TDF frequency bottleneck → TFC conv) residual blocks
    (reference karafan/tfc_tdf.py:125-146). Input (B, T, F, C)."""

    in_c: int
    c: int
    l: int
    f: int
    bn: int
    norm: str
    act: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = _act(self.act)
        cin = self.in_c
        for i in range(self.l):
            s = Conv2dTorch(cin, self.c, (1, 1), use_bias=False, dtype=self.dtype,
                            name=f"blocks_{i}_shortcut")(x)
            h = _make_norm(self.norm, cin, self.dtype, f"blocks_{i}_tfc1_0")(x)
            h = act(h)
            h = Conv2dTorch(cin, self.c, (3, 3), padding=(1, 1), use_bias=False,
                            dtype=self.dtype, name=f"blocks_{i}_tfc1_2")(h)
            # TDF: linear along the frequency axis (F is axis 2 in NHWC);
            # torch applies Linear to the last axis of (B, C, T, F) — same F.
            t = _make_norm(self.norm, self.c, self.dtype, f"blocks_{i}_tdf_0")(h)
            t = act(t)
            t = jnp.swapaxes(t, 2, 3)  # (B, T, C, F)
            t = Linear(self.f, self.f // self.bn, use_bias=False, dtype=self.dtype,
                       name=f"blocks_{i}_tdf_2")(t)
            t = jnp.swapaxes(t, 2, 3)
            t = _make_norm(self.norm, self.c, self.dtype, f"blocks_{i}_tdf_3")(t)
            t = act(t)
            t = jnp.swapaxes(t, 2, 3)
            t = Linear(self.f // self.bn, self.f, use_bias=False, dtype=self.dtype,
                       name=f"blocks_{i}_tdf_5")(t)
            t = jnp.swapaxes(t, 2, 3)
            h = h + t
            h = _make_norm(self.norm, self.c, self.dtype, f"blocks_{i}_tfc2_0")(h)
            h = act(h)
            h = Conv2dTorch(self.c, self.c, (3, 3), padding=(1, 1), use_bias=False,
                            dtype=self.dtype, name=f"blocks_{i}_tfc2_2")(h)
            x = h + s
            cin = self.c
        return x


class TFCTDFNet(nn.Module):
    """Full-band MDX23C-style U-net (reference TFC_TDF_net,
    karafan/tfc_tdf.py:148-235). Operates on packed complex-as-channel
    subband spectrograms (B, T, F/k, C=k*ch*2)."""

    num_targets: int = 1
    num_subbands: int = 4
    num_channels_audio: int = 2
    num_scales: int = 5
    scale: tuple[int, int] = (2, 2)
    num_blocks_per_scale: int = 2
    c: int = 32  # initial conv width
    g: int = 32  # growth per scale
    bn: int = 4  # bottleneck factor
    dim_f: int = 2048
    norm: str = "InstanceNorm"
    act: str = "gelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, spec: jax.Array) -> jax.Array:
        """spec: (B, T, F, dim_c) packed; returns per-target masks*spec
        packed the same way: (B, targets, T, F, dim_c)."""
        dim_c = self.num_subbands * self.num_channels_audio * 2
        f = self.dim_f // self.num_subbands
        act = _act(self.act)

        # cac2cws: fold subbands into channels: (B,T,F,c) -> (B,T,F/k,c*k)
        k = self.num_subbands
        B, T, F, C = spec.shape
        # torch folds as (b, c, k, f//k, t) → channel-major; replicate:
        xt = spec.transpose(0, 3, 2, 1)  # (B, C, F, T)
        xt = xt.reshape(B, C, k, F // k, T).reshape(B, C * k, F // k, T)
        x = xt.transpose(0, 3, 2, 1)  # (B, T, F/k, C*k)

        mix = x
        x = Conv2dTorch(dim_c, self.c, (1, 1), use_bias=False, dtype=self.dtype,
                        name="first_conv")(x)
        first_out = x

        c = self.c
        skips = []
        for i in range(self.num_scales):
            x = TFCTDF(c, c, self.num_blocks_per_scale, f, self.bn, self.norm,
                       self.act, dtype=self.dtype, name=f"encoder_blocks_{i}_tfc_tdf")(x)
            skips.append(x)
            # downscale: norm, act, conv stride=scale
            x = _make_norm(self.norm, c, self.dtype, f"encoder_blocks_{i}_downscale_0")(x)
            x = act(x)
            x = Conv2dTorch(c, c + self.g, self.scale, self.scale, (0, 0),
                            use_bias=False, dtype=self.dtype,
                            name=f"encoder_blocks_{i}_downscale_2")(x)
            f //= self.scale[1]
            c += self.g

        x = TFCTDF(c, c, self.num_blocks_per_scale, f, self.bn, self.norm, self.act,
                   dtype=self.dtype, name="bottleneck_block")(x)

        for i in range(self.num_scales):
            x = _make_norm(self.norm, c, self.dtype, f"decoder_blocks_{i}_upscale_0")(x)
            x = act(x)
            x = ConvTranspose2dTorch(c, c - self.g, self.scale, self.scale,
                                     use_bias=False, dtype=self.dtype,
                                     name=f"decoder_blocks_{i}_upscale_2")(x)
            f *= self.scale[1]
            c -= self.g
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = TFCTDF(2 * c, c, self.num_blocks_per_scale, f, self.bn, self.norm,
                       self.act, dtype=self.dtype, name=f"decoder_blocks_{i}_tfc_tdf")(x)

        x = x * first_out
        x = jnp.concatenate([mix, x], axis=-1)
        x = Conv2dTorch(c + dim_c, c, (1, 1), use_bias=False, dtype=self.dtype,
                        name="final_conv_0")(x)
        x = act(x)
        x = Conv2dTorch(c, self.num_targets * dim_c, (1, 1), use_bias=False,
                        dtype=self.dtype, name="final_conv_2")(x)

        # cws2cac back to full-band channels
        Bt, Tt, Fk, Ck = x.shape
        xt = x.transpose(0, 3, 2, 1)  # (B, Ck, F/k, T)
        xt = xt.reshape(B, self.num_targets, Ck // self.num_targets, Fk, Tt)
        xt = xt.reshape(B, self.num_targets, (Ck // self.num_targets) // k, k * Fk, Tt)
        return xt.transpose(0, 1, 4, 3, 2)  # (B, targets, T, F, c)


class ConvTDFNetTrim(nn.Module):
    """MDX v2 single-target net (the UVR ONNX architecture, KUIELab
    Conv-TDF): first 1x1 conv, n down scales with TFC_TDF, bottleneck,
    mirrored up path, final 1x1 conv to 4 channels."""

    num_blocks: int = 11
    l: int = 3
    g: int = 32
    bn: int = 8
    dim_f: int = 3072
    norm: str = "GroupNorm2"
    act: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, spec: jax.Array) -> jax.Array:
        """(B, T, dim_f, 4) -> (B, T, dim_f, 4) predicted target spectrum."""
        n = self.num_blocks // 2
        act = _act(self.act)
        f = self.dim_f
        c = self.g
        x = Conv2dTorch(4, c, (1, 1), use_bias=False, dtype=self.dtype,
                        name="first_conv")(spec)
        skips = []
        for i in range(n):
            x = TFCTDF(c, c, self.l, f, self.bn, self.norm, self.act,
                       dtype=self.dtype, name=f"ds_dense_{i}")(x)
            skips.append(x)
            x = Conv2dTorch(c, c + self.g, (2, 2), (2, 2), use_bias=False,
                            dtype=self.dtype, name=f"ds_{i}")(x)
            x = act(x)
            f //= 2
            c += self.g
        x = TFCTDF(c, c, self.l, f, self.bn, self.norm, self.act,
                   dtype=self.dtype, name="mid_dense")(x)
        for i in range(n):
            x = ConvTranspose2dTorch(c, c - self.g, (2, 2), (2, 2), use_bias=False,
                                     dtype=self.dtype, name=f"us_{i}")(x)
            x = act(x)
            f *= 2
            c -= self.g
            x = x + skips.pop()
            x = TFCTDF(c, c, self.l, f, self.bn, self.norm, self.act,
                       dtype=self.dtype, name=f"us_dense_{i}")(x)
        x = Conv2dTorch(c, 4, (1, 1), use_bias=False, dtype=self.dtype,
                        name="final_conv")(x)
        return x


# ---------------------------------------------------------------------------
# UVR "mixer mode" (reference lib/uvr5_pack/mdxnet.py:126-140 Mixer)
# ---------------------------------------------------------------------------


def load_mixer(path: str) -> np.ndarray:
    """Load the pretrained stem mixer (mixer.ckpt / mixer_val.ckpt): a
    single bias-free linear (4 stems + original, 2 channels each → 4
    stems × 2ch). Returns the (8, 10) weight matrix."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    w = sd["linear.weight"].numpy().astype(np.float32)
    if w.shape != (8, 10):
        raise ValueError(f"unexpected mixer weight shape {w.shape}")
    return w


def apply_mixer(weight: np.ndarray, stems: jnp.ndarray,
                original: jnp.ndarray) -> jnp.ndarray:
    """stems (4, 2, T) + original mix (2, T) → remixed stems (4, 2, T).

    Equivalent to the reference Mixer.forward (reshape → per-sample linear
    over the 10 source channels → reshape): expressed as ONE (8,10)×(10,T)
    matmul — MXU-friendly, no transposes materialized."""
    T = stems.shape[-1]
    x = jnp.concatenate([stems.reshape(8, T), original], axis=0)  # (10, T)
    # HIGHEST: a (8,10)x(10,T) matmul is negligible compute, but the TPU
    # MXU's default bf16 passes cost ~1e-2 abs error vs the torch reference
    # — this is a parity-gated op (scripts/parity_real.py gate_mixer).
    out = jnp.matmul(jnp.asarray(weight), x,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(4, 2, T)
