"""UNet2DConditionModel in Flax — the MuseTalk lip-sync generator.

The reference instantiates diffusers' UNet2DConditionModel from a JSON
config and runs a single denoise-free step at timestep 0 conditioned on
position-encoded Whisper features (reference lib/musetalk/models/unet.py,
musetalk_nodes.py:271-276). This is a from-scratch Flax implementation of
the SD-1.5 UNet topology (time embedding → conv_in → CrossAttnDown ×3 +
Down → mid → mirrored up path → conv_out) with diffusers-compatible
parameter naming.

NHWC activations; torch-layout conv weights (models/layers.Conv2dTorch).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..layers import Conv2dTorch, Linear
from .vae import GroupNorm


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 8
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 384
    attention_head_dim: int = 8
    down_block_types: Sequence[str] = (
        "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Sequence[str] = (
        "UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
    )
    norm_num_groups: int = 32

    @classmethod
    def from_json(cls, path: str) -> "UNetConfig":
        import json

        d = json.load(open(path))
        keys = {f.name for f in __import__("dataclasses").fields(cls)}
        return cls(**{k: tuple(v) if isinstance(v, list) else v
                      for k, v in d.items() if k in keys})


def timestep_embedding(timesteps: jax.Array, dim: int) -> jax.Array:
    """Sinusoidal embedding, diffusers Timesteps(flip_sin_to_cos=True,
    downscale_freq_shift=0)."""
    half = dim // 2
    exponent = -math.log(10000.0) * jnp.arange(half) / half
    emb = timesteps[:, None].astype(jnp.float32) * jnp.exp(exponent)[None]
    return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)


class ResnetBlock2D(nn.Module):
    in_ch: int
    out_ch: int
    temb_ch: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        h = GroupNorm(self.groups, self.in_ch, eps=1e-5, dtype=self.dtype, name="norm1")(x)
        h = jax.nn.silu(h)
        h = Conv2dTorch(self.in_ch, self.out_ch, (3, 3), padding=(1, 1),
                        dtype=self.dtype, name="conv1")(h)
        t = Linear(self.temb_ch, self.out_ch, dtype=self.dtype, name="time_emb_proj")(
            jax.nn.silu(temb))
        h = h + t[:, None, None, :]
        h = GroupNorm(self.groups, self.out_ch, eps=1e-5, dtype=self.dtype, name="norm2")(h)
        h = jax.nn.silu(h)
        h = Conv2dTorch(self.out_ch, self.out_ch, (3, 3), padding=(1, 1),
                        dtype=self.dtype, name="conv2")(h)
        if self.in_ch != self.out_ch:
            x = Conv2dTorch(self.in_ch, self.out_ch, (1, 1), dtype=self.dtype,
                            name="conv_shortcut")(x)
        return x + h


class CrossAttention(nn.Module):
    query_dim: int
    context_dim: int
    heads: int
    dim_head: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.heads * self.dim_head
        q = Linear(self.query_dim, inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = Linear(self.context_dim, inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = Linear(self.context_dim, inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        B, T, _ = q.shape
        S = k.shape[1]
        q = q.reshape(B, T, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(self.dim_head)
        p = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(self.dtype)
        o = jnp.einsum("bhts,bhsd->bhtd", p, v).transpose(0, 2, 1, 3).reshape(B, T, inner)
        return Linear(inner, self.query_dim, dtype=self.dtype, name="to_out_0")(o)


class LayerNormT(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", lambda k, s: jnp.ones(s, jnp.float32), (self.dim,))
        b = self.param("bias", lambda k, s: jnp.zeros(s, jnp.float32), (self.dim,))
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = jnp.var(xf, -1, keepdims=True)
        return (((xf - mu) * jax.lax.rsqrt(var + 1e-5)) * w + b).astype(self.dtype)


class BasicTransformerBlock(nn.Module):
    dim: int
    context_dim: int
    heads: int
    dim_head: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        h = LayerNormT(self.dim, dtype=self.dtype, name="norm1")(x)
        x = x + CrossAttention(self.dim, self.dim, self.heads, self.dim_head,
                               dtype=self.dtype, name="attn1")(h)
        h = LayerNormT(self.dim, dtype=self.dtype, name="norm2")(x)
        x = x + CrossAttention(self.dim, self.context_dim, self.heads, self.dim_head,
                               dtype=self.dtype, name="attn2")(h, context)
        h = LayerNormT(self.dim, dtype=self.dtype, name="norm3")(x)
        # GEGLU feed-forward
        gate = Linear(self.dim, self.dim * 8, dtype=self.dtype, name="ff_net_0_proj")(h)
        a, g = jnp.split(gate, 2, axis=-1)
        h = a * jax.nn.gelu(g, approximate=False)
        x = x + Linear(self.dim * 4, self.dim, dtype=self.dtype, name="ff_net_2")(h)
        return x


class Transformer2D(nn.Module):
    channels: int
    context_dim: int
    heads: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        res = x
        h = GroupNorm(self.groups, C, eps=1e-6, dtype=self.dtype, name="norm")(x)
        h = Conv2dTorch(C, C, (1, 1), dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(B, H * W, C)
        h = BasicTransformerBlock(C, self.context_dim, self.heads, C // self.heads,
                                  dtype=self.dtype, name="transformer_blocks_0")(h, context)
        h = h.reshape(B, H, W, C)
        h = Conv2dTorch(C, C, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return h + res


class UNet2DCondition(nn.Module):
    cfg: UNetConfig = field(default_factory=UNetConfig)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states):
        """sample: (B, H, W, in_ch); timesteps: (B,); context: (B, S, cross_dim)."""
        cfg = self.cfg
        chans = cfg.block_out_channels
        temb_ch = chans[0] * 4
        # diffusers SD1.5-style configs: attention_head_dim is the head COUNT
        n_heads = cfg.attention_head_dim

        temb = timestep_embedding(jnp.atleast_1d(timesteps), chans[0])
        temb = Linear(chans[0], temb_ch, dtype=self.dtype, name="time_embedding_linear_1")(temb)
        temb = jax.nn.silu(temb)
        temb = Linear(temb_ch, temb_ch, dtype=self.dtype, name="time_embedding_linear_2")(temb)

        h = Conv2dTorch(cfg.in_channels, chans[0], (3, 3), padding=(1, 1),
                        dtype=self.dtype, name="conv_in")(sample)

        skips = [h]
        cin = chans[0]
        for i, (btype, cout) in enumerate(zip(cfg.down_block_types, chans)):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(cin if j == 0 else cout, cout, temb_ch,
                                  cfg.norm_num_groups, dtype=self.dtype,
                                  name=f"down_blocks_{i}_resnets_{j}")(h, temb)
                if btype == "CrossAttnDownBlock2D":
                    h = Transformer2D(cout, cfg.cross_attention_dim, n_heads,
                                      groups=cfg.norm_num_groups, dtype=self.dtype,
                                      name=f"down_blocks_{i}_attentions_{j}")(
                        h, encoder_hidden_states)
                skips.append(h)
            cin = cout
            if i < len(chans) - 1:
                h = Conv2dTorch(cout, cout, (3, 3), (2, 2), (1, 1), dtype=self.dtype,
                                name=f"down_blocks_{i}_downsamplers_0_conv")(h)
                skips.append(h)

        h = ResnetBlock2D(cin, cin, temb_ch, cfg.norm_num_groups, dtype=self.dtype,
                          name="mid_block_resnets_0")(h, temb)
        h = Transformer2D(cin, cfg.cross_attention_dim, n_heads,
                          groups=cfg.norm_num_groups, dtype=self.dtype,
                          name="mid_block_attentions_0")(h, encoder_hidden_states)
        h = ResnetBlock2D(cin, cin, temb_ch, cfg.norm_num_groups, dtype=self.dtype,
                          name="mid_block_resnets_1")(h, temb)

        up_chans = list(reversed(chans))
        for i, btype in enumerate(cfg.up_block_types):
            cout = up_chans[i]
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                res_in = (cin if j == 0 else cout) + skip.shape[-1]
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock2D(res_in, cout, temb_ch, cfg.norm_num_groups,
                                  dtype=self.dtype,
                                  name=f"up_blocks_{i}_resnets_{j}")(h, temb)
                if btype == "CrossAttnUpBlock2D":
                    h = Transformer2D(cout, cfg.cross_attention_dim, n_heads,
                                      groups=cfg.norm_num_groups, dtype=self.dtype,
                                      name=f"up_blocks_{i}_attentions_{j}")(
                        h, encoder_hidden_states)
            cin = cout
            if i < len(cfg.up_block_types) - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
                h = Conv2dTorch(cout, cout, (3, 3), padding=(1, 1), dtype=self.dtype,
                                name=f"up_blocks_{i}_upsamplers_0_conv")(h)

        h = GroupNorm(cfg.norm_num_groups, cin, eps=1e-5, dtype=self.dtype,
                      name="conv_norm_out")(h)
        h = jax.nn.silu(h)
        return Conv2dTorch(cin, cfg.out_channels, (3, 3), padding=(1, 1),
                           dtype=self.dtype, name="conv_out")(h)


def positional_encoding(x: jax.Array, d_model: int = 384) -> jax.Array:
    """Sinusoidal PE over whisper features (reference unet.py PositionalEncoding)."""
    B, T, D = x.shape
    position = np.arange(T)[:, None].astype(np.float32)
    div = np.exp(np.arange(0, d_model, 2).astype(np.float32) * (-math.log(10000.0) / d_model))
    pe = np.zeros((T, d_model), np.float32)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return x + jnp.asarray(pe)[None]


_UNET_RENAMES = [
    (r"time_embedding\.linear_1", r"time_embedding_linear_1"),
    (r"time_embedding\.linear_2", r"time_embedding_linear_2"),
    (r"(down_blocks|up_blocks)\.(\d+)\.resnets\.(\d+)", r"\1_\2_resnets_\3"),
    (r"(down_blocks|up_blocks)\.(\d+)\.attentions\.(\d+)", r"\1_\2_attentions_\3"),
    (r"(down_blocks)\.(\d+)\.downsamplers\.0\.conv", r"\1_\2_downsamplers_0_conv"),
    (r"(up_blocks)\.(\d+)\.upsamplers\.0\.conv", r"\1_\2_upsamplers_0_conv"),
    (r"mid_block\.resnets\.(\d+)", r"mid_block_resnets_\1"),
    (r"mid_block\.attentions\.(\d+)", r"mid_block_attentions_\1"),
    (r"\.transformer_blocks\.0\.", r".transformer_blocks_0."),
    (r"\.ff\.net\.0\.proj", r".ff_net_0_proj"),
    (r"\.ff\.net\.2", r".ff_net_2"),
    (r"\.to_out\.0\.", r".to_out_0."),
]


def unet_params_from_state_dict(state_dict) -> dict:
    from ...compat.torch_import import build_tree

    return {"params": build_tree(state_dict, renames=_UNET_RENAMES)}
