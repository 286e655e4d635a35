"""Relative-position transformer encoder (the VITS text-encoder core).

Semantics follow the reference ``attentions.Encoder`` /
``MultiHeadAttention`` (lib/infer_pack/attentions.py:9-356): post-norm
blocks, windowed relative-position attention (window_size=10, shared
across heads), masked conv FFN. The relative-logits "skew" is the standard
pad/reshape trick — pure reshapes, XLA-friendly.

Channels-last (B, T, C); Q/K/V/O projections are 1x1 convs in the
reference and plain dense matmuls here (identical math, MXU-ideal).
Parameter names mirror the reference state_dict for .pth import
(conv_q/conv_k/conv_v/conv_o with (O, I, 1) conv weights).
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv1d, LayerNorm, leaky_relu


def _rel_to_abs(x: jax.Array) -> jax.Array:
    """(B, H, L, 2L-1) relative logits -> (B, H, L, L) absolute."""
    B, H, L, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x = x.reshape(B, H, L * 2 * L)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, L - 1)))
    x = x.reshape(B, H, L + 1, 2 * L - 1)
    return x[:, :, :L, L - 1 :]


def _abs_to_rel(x: jax.Array) -> jax.Array:
    """(B, H, L, L) -> (B, H, L, 2L-1)."""
    B, H, L, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, L - 1)))
    x = x.reshape(B, H, L * L + L * (L - 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (L, 0)))
    x = x.reshape(B, H, L, 2 * L)
    return x[:, :, :, 1:]


def _band_to_dense(band: jax.Array, T_s: int, w: int) -> jax.Array:
    """(B, H, T, 2w+1) banded logits -> (B, H, T, T_s) dense, where
    band[..., t, m] lands at key column j = t + m - w (zeros elsewhere).

    Pure pad/reshape (the skew trick applied at band width instead of the
    textbook 2T-1): row t of the padded band shifts right by t when the
    trailing dim shrinks by one, which is exactly the diagonal alignment.
    (A take_along_axis formulation was measured 13× SLOWER on TPU —
    per-row minor-dim gathers do not vectorize; keep the relayouts.)
    """
    B, H, T, W = band.shape
    padded = jnp.pad(band, ((0, 0), (0, 0), (0, 0), (0, T_s)))  # (B,H,T,W+T_s)
    flat = padded.reshape(B, H, T * (W + T_s))
    flat = flat[:, :, : T * (W + T_s - 1)]
    shifted = flat.reshape(B, H, T, W + T_s - 1)  # shifted[t, t+m] = band[t, m]
    return shifted[:, :, :, w : w + T_s]


def _dense_to_band(p: jax.Array, w: int) -> jax.Array:
    """(B, H, T, S) dense -> (B, H, T, 2w+1) band: out[t, m] = p[t, t+m-w]
    (zeros out of range). Inverse alignment of _band_to_dense."""
    B, H, T, S = p.shape
    W = 2 * w + 1
    padded = jnp.pad(p, ((0, 0), (0, 0), (0, 0), (w, w)))  # (B,H,T,S+2w)
    flat = padded.reshape(B, H, T * (S + 2 * w))
    flat = jnp.pad(flat, ((0, 0), (0, 0), (0, T)))
    shifted = flat.reshape(B, H, T, S + 2 * w + 1)  # shifted[t, c] = padded[t, c+t]
    return shifted[:, :, :, :W]


def _window_embeddings(emb: jax.Array, length: int, window: int) -> jax.Array:
    """Slice/pad the (heads, 2*window+1, d) table to (heads, 2*length-1, d)."""
    pad = max(length - (window + 1), 0)
    start = max((window + 1) - length, 0)
    if pad > 0:
        emb = jnp.pad(emb, ((0, 0), (pad, pad), (0, 0)))
    return emb[:, start : start + 2 * length - 1]


class MultiHeadAttention(nn.Module):
    channels: int
    out_channels: int
    n_heads: int
    window_size: int | None = None
    heads_share: bool = True
    p_dropout: float = 0.0
    fuse: bool = False  # Pallas banded attention (ops/pallas_attention)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, c: jax.Array, attn_mask=None, deterministic=True,
                 lengths=None):
        H = self.n_heads
        d_k = self.channels // H
        conv = lambda name, out: Conv1d(  # noqa: E731
            self.channels, out, 1, dtype=self.dtype, name=name
        )
        q = conv("conv_q", self.channels)(x)
        k = conv("conv_k", self.channels)(c)
        v = conv("conv_v", self.channels)(c)

        B, T_t, _ = q.shape
        T_s = k.shape[1]

        if (self.fuse and self.window_size is not None and self.heads_share
                and x is c and lengths is not None
                and (deterministic or self.p_dropout == 0)):
            # ONE Pallas launch: scores never touch HBM (the XLA path's
            # skew relayouts + f32 softmax traffic were 1.6 of the 1.86 ms
            # per layer at song shapes). Numerically identical — see
            # ops/pallas_attention.
            from ..ops.pallas_attention import banded_rel_attention

            w = self.window_size
            rel_std = d_k**-0.5
            emb_rel_k = self.param(
                "emb_rel_k",
                lambda key, s: rel_std * jax.random.normal(key, s, jnp.float32),
                (1, 2 * w + 1, d_k),
            )
            emb_rel_v = self.param(
                "emb_rel_v",
                lambda key, s: rel_std * jax.random.normal(key, s, jnp.float32),
                (1, 2 * w + 1, d_k),
            )
            qh = q.reshape(B, T_t, H, d_k).transpose(0, 2, 1, 3)
            kh = k.reshape(B, T_s, H, d_k).transpose(0, 2, 1, 3)
            vh = v.reshape(B, T_s, H, d_k).transpose(0, 2, 1, 3)
            out = banded_rel_attention(
                qh, kh, vh,
                emb_rel_k[0].astype(self.dtype),
                emb_rel_v[0].astype(self.dtype),
                lengths, window=w, scale=1.0 / math.sqrt(d_k),
                interpret=jax.default_backend() not in ("tpu", "axon"),
            )
            out = out.transpose(0, 2, 1, 3).reshape(B, T_t, self.channels)
            return Conv1d(self.channels, self.out_channels, 1,
                          dtype=self.dtype, name="conv_o")(out)
        # (B, T, C) -> (B, H, T, d_k); channel blocking matches torch's
        # view(b, heads, d_k, t) over a (B, C, T) tensor.
        qh = q.reshape(B, T_t, H, d_k).transpose(0, 2, 1, 3)
        kh = k.reshape(B, T_s, H, d_k).transpose(0, 2, 1, 3)
        vh = v.reshape(B, T_s, H, d_k).transpose(0, 2, 1, 3)

        scale = 1.0 / math.sqrt(d_k)
        scores = jnp.einsum("bhtd,bhsd->bhts", qh * scale, kh)

        if self.window_size is not None:
            # Banded relative attention: only 2w+1 diagonals are nonzero, so
            # compute (B, H, T, 2w+1) logits and gather them onto the score
            # matrix — the textbook skew trick materializes (B, H, T, 2T-1)
            # buffers, ~100× more HBM traffic at song-scale T.
            w = self.window_size
            n_rel = 1 if self.heads_share else H
            rel_std = d_k**-0.5
            emb_rel_k = self.param(
                "emb_rel_k",
                lambda key, s: rel_std * jax.random.normal(key, s, jnp.float32),
                (n_rel, 2 * w + 1, d_k),
            )
            emb_rel_v = self.param(
                "emb_rel_v",
                lambda key, s: rel_std * jax.random.normal(key, s, jnp.float32),
                (n_rel, 2 * w + 1, d_k),
            )
            band = jnp.einsum(
                "bhtd,gmd->bhtm", qh * scale, emb_rel_k.astype(self.dtype)
            )  # (B, H, T, 2w+1); band[..., m] belongs at key j = t + m - w
            scores = scores + _band_to_dense(band, T_s, w)

        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, -1e4, scores)
        p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        if self.p_dropout > 0 and not deterministic:
            p = nn.Dropout(self.p_dropout, deterministic=False)(p)
        out = jnp.einsum("bhts,bhsd->bhtd", p, vh)

        if self.window_size is not None:
            rel_w = _dense_to_band(p, w)  # (B, H, T, 2w+1): rel_w[t,m]=p[t,t+m-w]
            out = out + jnp.einsum("bhtm,gmd->bhtd", rel_w, emb_rel_v.astype(self.dtype))

        out = out.transpose(0, 2, 1, 3).reshape(B, T_t, self.channels)
        return Conv1d(self.channels, self.out_channels, 1, dtype=self.dtype, name="conv_o")(out)


class FFN(nn.Module):
    in_channels: int
    out_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, deterministic=True):
        pad = (self.kernel_size - 1) // 2 if self.kernel_size > 1 else 0
        h = Conv1d(
            self.in_channels, self.filter_channels, self.kernel_size, padding=pad,
            dtype=self.dtype, name="conv_1",
        )(x * x_mask)
        h = jax.nn.relu(h)
        if self.p_dropout > 0 and not deterministic:
            h = nn.Dropout(self.p_dropout, deterministic=False)(h)
        h = Conv1d(
            self.filter_channels, self.out_channels, self.kernel_size, padding=pad,
            dtype=self.dtype, name="conv_2",
        )(h * x_mask)
        return h * x_mask


class Encoder(nn.Module):
    """Stack of post-norm rel-attention blocks (reference attentions.Encoder)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    window_size: int = 10
    fuse: bool = False  # Pallas banded attention for every layer
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, deterministic=True):
        # x: (B, T, C); x_mask: (B, T, 1)
        attn_mask = (x_mask[:, None, :, 0][..., None] * x_mask[:, None, None, :, 0])
        # prefix-mask lengths for the fused kernel (sequence_mask semantics)
        lengths = jnp.sum(x_mask[..., 0], axis=1).astype(jnp.int32)
        x = x * x_mask
        for i in range(self.n_layers):
            y = MultiHeadAttention(
                self.hidden_channels,
                self.hidden_channels,
                self.n_heads,
                window_size=self.window_size,
                p_dropout=self.p_dropout,
                fuse=self.fuse,
                dtype=self.dtype,
                name=f"attn_layers_{i}",
            )(x, x, attn_mask, deterministic, lengths=lengths)
            x = LayerNorm(self.hidden_channels, dtype=self.dtype, name=f"norm_layers_1_{i}")(x + y)
            y = FFN(
                self.hidden_channels,
                self.hidden_channels,
                self.filter_channels,
                self.kernel_size,
                self.p_dropout,
                dtype=self.dtype,
                name=f"ffn_layers_{i}",
            )(x, x_mask, deterministic)
            x = LayerNorm(self.hidden_channels, dtype=self.dtype, name=f"norm_layers_2_{i}")(x + y)
        return x * x_mask
