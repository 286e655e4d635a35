"""HuBERT / ContentVec content encoder in Flax.

Replicates the HF ``HubertModel`` (+ a ``final_proj`` head) that the
reference loads from ``content-vec-best.safetensors`` (reference
lib/infer_pack/loaders.py:10-61): 7-layer conv feature extractor
(group-norm on layer 0), feature projection, conv positional embedding,
12 post-norm transformer layers.

``extract_features(source, version)`` matches the reference exactly:
v1 → hidden state after 8 transformer layers, through final_proj (256-d);
v2 → hidden state after 11 layers (768-d). (The reference indexes
``hidden_states[output_layer-1]`` where entry k is the output after k
layers — verified against transformers; so the 12th layer is never used
at inference.)

Parameter tree mirrors the HF state_dict (feature_extractor.conv_layers.N,
encoder.layers.N.attention..., final_proj) so safetensors import is a pure
key-path mapping (see compat/torch_import.py).

TPU notes: audio enters as (B, T); convs run channels-last; attention is
plain dense QKV — XLA fuses it; whole thing jits into the conversion
megakernel. bf16-friendly (layernorms in fp32).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv1d, Linear


@dataclass(frozen=True)
class HubertConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Sequence[int] = (512, 512, 512, 512, 512, 512, 512)
    conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    classifier_proj_size: int = 256
    layer_norm_eps: float = 1e-5
    feat_extract_norm: str = "group"

    @classmethod
    def from_hf_dict(cls, d: dict) -> "HubertConfig":
        keys = {f.name for f in __import__("dataclasses").fields(cls)}
        return cls(**{k: tuple(v) if isinstance(v, list) else v for k, v in d.items() if k in keys})


class TLayerNorm(nn.Module):
    """LayerNorm with HF param names (weight/bias)."""

    dim: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", lambda k, s: jnp.ones(s, jnp.float32), (self.dim,))
        b = self.param("bias", lambda k, s: jnp.zeros(s, jnp.float32), (self.dim,))
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + self.eps) * w + b).astype(self.dtype)


class GroupNormPerChannel(nn.Module):
    """GroupNorm with num_groups == num_channels (per-channel instance norm
    over time), as HF uses on conv layer 0. Input (B, T, C).

    Accepts an optional (B, T, 1) validity mask so that zero-padded batch
    tails (the batched-chunk pipeline pads every chunk to a bucket length)
    do not shift the normalization statistics — without this, padding
    changes *valid* outputs, unlike the reference's one-chunk-at-a-time
    loop.
    """

    channels: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        w = self.param("weight", lambda k, s: jnp.ones(s, jnp.float32), (self.channels,))
        b = self.param("bias", lambda k, s: jnp.zeros(s, jnp.float32), (self.channels,))
        xf = x.astype(jnp.float32)
        if mask is None:
            mu = xf.mean(axis=1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mu), axis=1, keepdims=True)
        else:
            m = mask.astype(jnp.float32)
            denom = jnp.maximum(m.sum(axis=1, keepdims=True), 1.0)
            mu = (xf * m).sum(axis=1, keepdims=True) / denom
            var = (jnp.square(xf - mu) * m).sum(axis=1, keepdims=True) / denom
        return ((xf - mu) * jax.lax.rsqrt(var + self.eps) * w + b).astype(self.dtype)


def conv_output_lengths(cfg: HubertConfig, lengths: jax.Array) -> jax.Array:
    """Valid frame counts through the conv stack for given sample lengths."""
    out = lengths
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        out = (out - k) // s + 1
    return out


class FeatureExtractor(nn.Module):
    cfg: HubertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, lengths=None):
        # x: (B, T) waveform -> (B, frames, conv_dim[-1])
        h = x[..., None].astype(self.dtype)  # (B, T, 1)
        in_dim = 1
        cur_len = lengths
        for i, (dim, k, s) in enumerate(
            zip(self.cfg.conv_dim, self.cfg.conv_kernel, self.cfg.conv_stride)
        ):
            # NOT pack_stride: measured slower here (r5 A/B, plain 3.10 vs
            # packed 4.66 ms on layer 1) — XLA's strided lowering at C=512
            # beats the 4/3-tap-inflated packed matmul; ~half the frontend
            # is gelu anyway
            h = Conv1d(in_dim, dim, k, stride=s, use_bias=False, dtype=self.dtype,
                       name=f"conv_layers_{i}_conv")(h)
            if cur_len is not None:
                cur_len = (cur_len - k) // s + 1
            if i == 0 and self.cfg.feat_extract_norm == "group":
                mask = None
                if cur_len is not None:
                    t = jnp.arange(h.shape[1])[None, :, None]
                    mask = (t < cur_len[:, None, None]).astype(h.dtype)
                h = GroupNormPerChannel(dim, dtype=self.dtype,
                                        name="conv_layers_0_layer_norm")(h, mask)
            h = jax.nn.gelu(h, approximate=False)
            in_dim = dim
        return h


class SelfAttention(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias=None):
        d_k = self.dim // self.heads
        q = Linear(self.dim, self.dim, dtype=self.dtype, name="q_proj")(x) / math.sqrt(d_k)
        k = Linear(self.dim, self.dim, dtype=self.dtype, name="k_proj")(x)
        v = Linear(self.dim, self.dim, dtype=self.dtype, name="v_proj")(x)
        B, T, _ = x.shape
        q = q.reshape(B, T, self.heads, d_k).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, self.heads, d_k).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, self.heads, d_k).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhtd,bhsd->bhts", q, k)
        if attn_bias is not None:
            scores = scores + attn_bias
        p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        o = jnp.einsum("bhts,bhsd->bhtd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, T, self.dim)
        return Linear(self.dim, self.dim, dtype=self.dtype, name="out_proj")(o)


class EncoderLayer(nn.Module):
    cfg: HubertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias=None):
        c = self.cfg
        h = SelfAttention(c.hidden_size, c.num_attention_heads, dtype=self.dtype,
                          name="attention")(x, attn_bias)
        x = TLayerNorm(c.hidden_size, c.layer_norm_eps, dtype=self.dtype, name="layer_norm")(x + h)
        f = Linear(c.hidden_size, c.intermediate_size, dtype=self.dtype,
                   name="feed_forward_intermediate_dense")(x)
        f = jax.nn.gelu(f, approximate=False)
        f = Linear(c.intermediate_size, c.hidden_size, dtype=self.dtype,
                   name="feed_forward_output_dense")(f)
        return TLayerNorm(c.hidden_size, c.layer_norm_eps, dtype=self.dtype,
                          name="final_layer_norm")(x + f)


class HubertEncoder(nn.Module):
    """HuBERT with final_proj (the ContentVec checkpoint layout)."""

    cfg: HubertConfig = field(default_factory=HubertConfig)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, source: jax.Array, output_layer: int = 12,
                 final_proj: bool = False, lengths: jax.Array | None = None) -> jax.Array:
        """source: (B, T) 16 kHz waveform. Returns (B, frames, C) where
        frames = conv-downsampled length (stride 320) and C is 768 (or 256
        when final_proj=True). Matches reference
        ``extract_features`` with output_layer 9 (v1, final_proj) / 12 (v2).

        ``lengths`` (B,) valid sample counts: masks the group norm and the
        attention so zero-padded batch tails don't perturb valid frames.
        """
        c = self.cfg
        feats = FeatureExtractor(c, dtype=self.dtype, name="feature_extractor")(source, lengths)
        attn_bias = None
        if lengths is not None:
            frame_len = conv_output_lengths(c, lengths)
            t = jnp.arange(feats.shape[1])
            key_valid = t[None, :] < frame_len[:, None]  # (B, T')
            attn_bias = jnp.where(key_valid, 0.0, -1e9)[:, None, None, :]
        h = TLayerNorm(c.conv_dim[-1], c.layer_norm_eps, dtype=self.dtype,
                       name="feature_projection_layer_norm")(feats)
        h = Linear(c.conv_dim[-1], c.hidden_size, dtype=self.dtype,
                   name="feature_projection_projection")(h)
        # conv positional embedding (groups=16, weight-normalized, gelu)
        pos = Conv1d(
            c.hidden_size, c.hidden_size, c.num_conv_pos_embeddings,
            padding=c.num_conv_pos_embeddings // 2,
            groups=c.num_conv_pos_embedding_groups,
            weight_norm=True, dtype=self.dtype, name="encoder_pos_conv_embed_conv",
        )(h)
        if c.num_conv_pos_embeddings % 2 == 0:
            pos = pos[:, :-1]
        pos = jax.nn.gelu(pos, approximate=False)
        h = h + pos
        h = TLayerNorm(c.hidden_size, c.layer_norm_eps, dtype=self.dtype,
                       name="encoder_layer_norm")(h)
        # Reference semantics: hidden_states[output_layer-1] == output after
        # (output_layer-1) transformer layers.
        n_run = output_layer - 1
        for i in range(n_run):
            h = EncoderLayer(c, dtype=self.dtype, name=f"encoder_layers_{i}")(h, attn_bias)
        if final_proj:
            h = Linear(c.hidden_size, c.classifier_proj_size, dtype=self.dtype,
                       name="final_proj")(h)
        return h

    def extract_features(self, source: jax.Array, version: str = "v2",
                         lengths: jax.Array | None = None) -> jax.Array:
        if version == "v1":
            return self(source, output_layer=9, final_proj=True, lengths=lengths)
        return self(source, output_layer=12, final_proj=False, lengths=lengths)
