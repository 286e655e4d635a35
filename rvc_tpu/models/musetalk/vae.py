"""Stable-Diffusion VAE (AutoencoderKL) in Flax — the MuseTalk image codec.

The reference wraps diffusers' AutoencoderKL ("sd-vae-ft-mse", reference
lib/musetalk/models/vae.py): half-masked 256×256 preprocess, encode
×0.18215, decode to uint8. This is a from-scratch Flax implementation of
that architecture (conv stem → 4 down stages of 2 resnets → mid resnet/
attention/resnet → moments; mirrored decoder), with parameter names
mapping 1:1 to the diffusers checkpoint layout for weight import.

Layout: NHWC; convs are torch-layout Conv2dTorch for direct import.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..layers import Conv2dTorch, Linear


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215


class GroupNorm(nn.Module):
    groups: int
    channels: int
    eps: float = 1e-6
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


class ResnetBlock(nn.Module):
    in_ch: int
    out_ch: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GroupNorm(self.groups, self.in_ch, dtype=self.dtype, name="norm1")(x)
        h = jax.nn.silu(h)
        h = Conv2dTorch(self.in_ch, self.out_ch, (3, 3), padding=(1, 1),
                        dtype=self.dtype, name="conv1")(h)
        h = GroupNorm(self.groups, self.out_ch, dtype=self.dtype, name="norm2")(h)
        h = jax.nn.silu(h)
        h = Conv2dTorch(self.out_ch, self.out_ch, (3, 3), padding=(1, 1),
                        dtype=self.dtype, name="conv2")(h)
        if self.in_ch != self.out_ch:
            x = Conv2dTorch(self.in_ch, self.out_ch, (1, 1), dtype=self.dtype,
                            name="conv_shortcut")(x)
        return x + h


class AttentionBlock(nn.Module):
    """Single-head spatial self-attention (diffusers 'Attention' in VAE mid)."""

    channels: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNorm(self.groups, C, dtype=self.dtype, name="group_norm")(x)
        flat = h.reshape(B, H * W, C)
        q = Linear(C, C, dtype=self.dtype, name="to_q")(flat)
        k = Linear(C, C, dtype=self.dtype, name="to_k")(flat)
        v = Linear(C, C, dtype=self.dtype, name="to_v")(flat)
        scores = jnp.einsum("btc,bsc->bts", q, k) / jnp.sqrt(jnp.float32(C)).astype(q.dtype)
        p = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(self.dtype)
        o = jnp.einsum("bts,bsc->btc", p, v)
        o = Linear(C, C, dtype=self.dtype, name="to_out_0")(o)
        return x + o.reshape(B, H, W, C)


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        chans = cfg.block_out_channels
        h = Conv2dTorch(cfg.in_channels, chans[0], (3, 3), padding=(1, 1),
                        dtype=self.dtype, name="conv_in")(x)
        cin = chans[0]
        for i, cout in enumerate(chans):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(cin if j == 0 else cout, cout, cfg.norm_num_groups,
                                dtype=self.dtype,
                                name=f"down_blocks_{i}_resnets_{j}")(h)
            cin = cout
            if i < len(chans) - 1:
                # asymmetric pad (0,1,0,1) + stride-2 conv (diffusers Downsample2D)
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = Conv2dTorch(cout, cout, (3, 3), (2, 2), (0, 0), dtype=self.dtype,
                                name=f"down_blocks_{i}_downsamplers_0_conv")(h)
        h = ResnetBlock(cin, cin, cfg.norm_num_groups, dtype=self.dtype,
                        name="mid_block_resnets_0")(h)
        h = AttentionBlock(cin, cfg.norm_num_groups, dtype=self.dtype,
                           name="mid_block_attentions_0")(h)
        h = ResnetBlock(cin, cin, cfg.norm_num_groups, dtype=self.dtype,
                        name="mid_block_resnets_1")(h)
        h = GroupNorm(cfg.norm_num_groups, cin, dtype=self.dtype, name="conv_norm_out")(h)
        h = jax.nn.silu(h)
        return Conv2dTorch(cin, 2 * cfg.latent_channels, (3, 3), padding=(1, 1),
                           dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        chans = list(reversed(cfg.block_out_channels))
        h = Conv2dTorch(cfg.latent_channels, chans[0], (3, 3), padding=(1, 1),
                        dtype=self.dtype, name="conv_in")(z)
        cin = chans[0]
        h = ResnetBlock(cin, cin, cfg.norm_num_groups, dtype=self.dtype,
                        name="mid_block_resnets_0")(h)
        h = AttentionBlock(cin, cfg.norm_num_groups, dtype=self.dtype,
                           name="mid_block_attentions_0")(h)
        h = ResnetBlock(cin, cin, cfg.norm_num_groups, dtype=self.dtype,
                        name="mid_block_resnets_1")(h)
        for i, cout in enumerate(chans):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock(cin if j == 0 else cout, cout, cfg.norm_num_groups,
                                dtype=self.dtype, name=f"up_blocks_{i}_resnets_{j}")(h)
            cin = cout
            if i < len(chans) - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
                h = Conv2dTorch(cout, cout, (3, 3), padding=(1, 1), dtype=self.dtype,
                                name=f"up_blocks_{i}_upsamplers_0_conv")(h)
        h = GroupNorm(cfg.norm_num_groups, cin, dtype=self.dtype, name="conv_norm_out")(h)
        h = jax.nn.silu(h)
        return Conv2dTorch(cin, cfg.out_channels, (3, 3), padding=(1, 1),
                           dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    cfg: VAEConfig = VAEConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, dtype=self.dtype)
        self.decoder = Decoder(self.cfg, dtype=self.dtype)
        self.quant_conv = Conv2dTorch(2 * self.cfg.latent_channels,
                                      2 * self.cfg.latent_channels, (1, 1),
                                      dtype=self.dtype)
        self.post_quant_conv = Conv2dTorch(self.cfg.latent_channels,
                                           self.cfg.latent_channels, (1, 1),
                                           dtype=self.dtype)

    def encode_moments(self, x):
        """x: (B, H, W, 3) in [-1, 1] -> (mean, logvar) latents (B, h, w, 4)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x):
        """Deterministic encode (mode of the posterior), ×scaling_factor —
        MuseTalk uses latents = vae.encode(x).latent_dist.sample()·0.18215;
        the mode is the standard inference choice."""
        mean, _ = self.encode_moments(x)
        return mean * self.cfg.scaling_factor

    def decode(self, z):
        """z (B, h, w, 4) scaled latents -> image (B, H, W, 3) in [-1, 1]."""
        z = z / self.cfg.scaling_factor
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x):
        return self.decode(self.encode(x))


def preprocess_image(img: np.ndarray, half_mask: bool = False,
                     size: int = 256) -> np.ndarray:
    """uint8 RGB (H, W, 3) -> normalized (1, size, size, 3) in [-1, 1]
    with optional top-half mask (reference vae.py preprocess_img)."""
    import cv2

    img = cv2.resize(img, (size, size), interpolation=cv2.INTER_LANCZOS4)
    x = img.astype(np.float32) / 255.0
    if half_mask:
        mask = np.zeros((size, size, 1), np.float32)
        mask[: size // 2] = 1.0
        x = x * mask
    x = (x - 0.5) / 0.5
    return x[None]


def postprocess_image(x: np.ndarray) -> np.ndarray:
    """(B, H, W, 3) in [-1, 1] -> uint8 RGB."""
    x = np.clip((np.asarray(x, np.float32) / 2 + 0.5), 0, 1)
    return (x * 255).round().astype(np.uint8)


# -- diffusers checkpoint import --------------------------------------------

_VAE_RENAMES = [
    (r"\.to_out\.0\.", r".to_out_0."),
    (r"mid_block\.resnets\.(\d+)", r"mid_block_resnets_\1"),
    (r"mid_block\.attentions\.(\d+)", r"mid_block_attentions_\1"),
    (r"down_blocks\.(\d+)\.resnets\.(\d+)", r"down_blocks_\1_resnets_\2"),
    (r"down_blocks\.(\d+)\.downsamplers\.0\.conv", r"down_blocks_\1_downsamplers_0_conv"),
    (r"up_blocks\.(\d+)\.resnets\.(\d+)", r"up_blocks_\1_resnets_\2"),
    (r"up_blocks\.(\d+)\.upsamplers\.0\.conv", r"up_blocks_\1_upsamplers_0_conv"),
    # older diffusers attention names
    (r"\.query\.", r".to_q."), (r"\.key\.", r".to_k."), (r"\.value\.", r".to_v."),
    (r"\.proj_attn\.", r".to_out_0."),
]


def vae_params_from_state_dict(state_dict) -> dict:
    from ...compat.torch_import import build_tree

    return {"params": build_tree(state_dict, renames=_VAE_RENAMES)}
