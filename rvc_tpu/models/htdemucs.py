"""Hybrid Demucs v3 (HDemucs) and v4 (HTDemucs, cross-domain transformer).

Reference behavior: lib/uvr5_pack/demucs/hdemucs.py (HEncLayer:65,
HDecLayer:252, HDemucs:334), htdemucs.py (HTDemucs:27),
transformer.py (CrossTransformerEncoder:526), demucs.py (DConv:98,
LocalState:169, BLSTM:19) — the UVR "Demucs v4: htdemucs / htdemucs_ft /
htdemucs_6s / hdemucs_mmi" model family.

TPU-first redesign, not a translation:

* Channels-last everywhere — the freq branch is (B, F, T, C) with C on
  the lane axis, the time branch (B, T, C). Frequency-axis convolutions
  are XLA ``conv_general_dilated`` over the F axis with kernel (k, 1);
  DConv residual branches flatten (B, F) into one big batched 1-D conv
  (exactly the compute the MXU wants).
* The STFT/iSTFT are windowed-DFT matmuls (ops/stft.py), so the entire
  hybrid forward — spectral encoder, time encoder, transformer, both
  decoders, CaC masking and inverse STFT — is ONE fused XLA program with
  static shapes. No host round-trips between branches.
* torch-layout parameters (Conv (O,I,K..), Linear (O,I)), so reference
  ``.th`` checkpoints import by key-mapping alone
  (compat/torch_import.load_demucs_v4).

Sparse attention, CAPE embeddings and MultiWrap frequency splitting are
training-time options unused by every released UVR checkpoint; they are
gated with clear errors rather than implemented.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from .layers import (
    Conv1d,
    Conv2dTorch,
    ConvTranspose1d,
    ConvTranspose2dTorch,
    Embedding,
    GroupNorm,
    Linear,
    TorchLayerNorm,
)
from .demucs import BiLSTM
from ..ops.stft import stft as _stft, istft as _istft


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _glu(x):
    a, b = jnp.split(x, 2, axis=-1)
    return a * jax.nn.sigmoid(b)


def reflect_pad_1d(x: jax.Array, left: int, right: int) -> jax.Array:
    """Reflect-pad the last axis, zero-extending first if the signal is
    shorter than the padding (reference hdemucs.pad1d:20 edge case)."""
    length = x.shape[-1]
    max_pad = max(left, right)
    if length <= max_pad:
        extra = max_pad - length + 1
        extra_r = min(right, extra)
        extra_l = extra - extra_r
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(extra_l, extra_r)])
        left, right = left - extra_l, right - extra_r
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(left, right)], mode="reflect")


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


class LayerScale(nn.Module):
    """Diagonal residual rescaling (Touvron et al. 2021); channels-last."""

    channels: int
    init: float = 0.0

    @nn.compact
    def __call__(self, x):
        s = self.param(
            "scale", lambda k, sh: jnp.full(sh, self.init, jnp.float32), (self.channels,)
        )
        return x * s.astype(x.dtype)


class LocalState(nn.Module):
    """Data-driven local attention with learned decay windows
    (reference demucs.py LocalState:169). O(T²) but only ever used at the
    innermost layers where T is tiny."""

    channels: int
    heads: int = 4
    ndecay: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        H, ch = self.heads, C // self.heads
        q = Conv1d(C, C, 1, dtype=self.dtype, name="query")(x).reshape(B, T, H, ch)
        k = Conv1d(C, C, 1, dtype=self.dtype, name="key")(x).reshape(B, T, H, ch)
        # dots[b,h,t,s] over key t / query s
        dots = jnp.einsum("bthc,bshc->bhts", k, q) / math.sqrt(ch)
        if self.ndecay:
            decays = jnp.arange(1, self.ndecay + 1, dtype=x.dtype)
            dq = Conv1d(C, H * self.ndecay, 1, dtype=self.dtype, name="query_decay")(x)
            dq = jax.nn.sigmoid(dq.reshape(B, T, H, self.ndecay)) / 2
            idx = jnp.arange(T, dtype=x.dtype)
            delta = jnp.abs(idx[:, None] - idx[None, :])  # (t, s)
            kernel = -decays[:, None, None] * delta[None] / math.sqrt(self.ndecay)
            dots = dots + jnp.einsum("fts,bshf->bhts", kernel, dq)
        eye = jnp.eye(T, dtype=bool)
        dots = jnp.where(eye[None, None], jnp.asarray(-100.0, dots.dtype), dots)
        w = jax.nn.softmax(dots, axis=2)
        content = Conv1d(C, C, 1, dtype=self.dtype, name="content")(x).reshape(B, T, H, ch)
        out = jnp.einsum("bhts,bthc->bshc", w, content).reshape(B, T, C)
        return x + Conv1d(C, C, 1, dtype=self.dtype, name="proj")(out)


class FramedBLSTM(nn.Module):
    """BiLSTM applied on overlapping 200-step frames with center-crop
    stitching + residual (reference demucs.py BLSTM:19 with max_steps)."""

    dim: int
    layers: int = 2
    max_steps: Optional[int] = 200
    skip: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        unit = BiLSTM(self.dim, self.layers, dtype=self.dtype, name="blstm")
        if self.max_steps is None or T <= self.max_steps:
            y = unit(x)
        else:
            width = self.max_steps
            stride = width // 2
            n_frames = math.ceil(T / stride)
            tgt = (n_frames - 1) * stride + width
            xp = jnp.pad(x, ((0, 0), (0, tgt - T), (0, 0)))
            frames = jnp.stack(
                [xp[:, k * stride : k * stride + width] for k in range(n_frames)], 1
            )  # (B, n, width, C)
            out = unit(frames.reshape(B * n_frames, width, C))
            out = out.reshape(B, n_frames, width, C)
            limit = stride // 2
            parts = []
            for k in range(n_frames):
                if k == 0:
                    parts.append(out[:, k, : width - limit])
                elif k == n_frames - 1:
                    parts.append(out[:, k, limit:])
                else:
                    parts.append(out[:, k, limit : width - limit])
            y = jnp.concatenate(parts, axis=1)[:, :T]
        return x + y if self.skip else y


class DConv(nn.Module):
    """Residual branch of dilated 1-D convolutions with optional LSTM /
    local attention (reference demucs.py DConv:98). Submodule names carry
    the torch Sequential indices so checkpoints map through the generic
    key rule."""

    channels: int
    compress: float = 4.0
    depth: int = 2
    init: float = 1e-4
    norm: bool = True
    attn: bool = False
    heads: int = 4
    ndecay: int = 4
    lstm: bool = False
    gelu: bool = True
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dilate = self.depth > 0
        depth = abs(self.depth)
        hidden = int(self.channels / self.compress)
        act = _gelu if self.gelu else jax.nn.relu
        for d in range(depth):
            dilation = 2**d if dilate else 1
            padding = dilation * (self.kernel // 2)
            y = Conv1d(self.channels, hidden, self.kernel, dilation=dilation,
                       padding=padding, dtype=self.dtype, name=f"layers_{d}_0")(x)
            if self.norm:
                y = GroupNorm(1, hidden, dtype=self.dtype, name=f"layers_{d}_1")(y)
            y = act(y)
            j = 3
            if self.lstm:
                y = FramedBLSTM(hidden, 2, 200, True, dtype=self.dtype,
                                name=f"layers_{d}_{j}")(y)
                j += 1
            if self.attn:
                y = LocalState(hidden, self.heads, self.ndecay, dtype=self.dtype,
                               name=f"layers_{d}_{j}")(y)
                j += 1
            y = Conv1d(hidden, 2 * self.channels, 1, dtype=self.dtype,
                       name=f"layers_{d}_{j}")(y)
            j += 1
            if self.norm:
                y = GroupNorm(1, 2 * self.channels, dtype=self.dtype,
                              name=f"layers_{d}_{j}")(y)
            j += 2  # skip the GLU slot
            y = _glu(y)
            y = LayerScale(self.channels, self.init, name=f"layers_{d}_{j}")(y)
            x = x + y
        return x


class HEncLayer(nn.Module):
    """Hybrid encoder layer, freq (B,F,T,C) or time (B,T,C) variant
    (reference hdemucs.py HEncLayer:65)."""

    chin: int
    chout: int
    kernel_size: int = 8
    stride: int = 4
    norm_groups: int = 1
    empty: bool = False
    freq: bool = True
    dconv: bool = True
    norm: bool = True
    context: int = 0
    pad: bool = True
    rewrite: bool = True
    dconv_depth: int = 2
    dconv_comp: float = 4.0
    dconv_init: float = 1e-4
    dconv_lstm: bool = False
    dconv_attn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, inject=None):
        pad_amt = self.kernel_size // 4 if self.pad else 0
        if self.freq:
            if x.ndim == 3:  # (B, T, C*F) back to 4-D — only F==1 occurs
                x = x[:, None]
            y = Conv2dTorch(self.chin, self.chout, (self.kernel_size, 1),
                            (self.stride, 1), (pad_amt, 0), dtype=self.dtype,
                            name="conv")(x)
        else:
            if x.ndim == 4:  # freq tensor with F==1 entering the time stack
                B, F, T, C = x.shape
                x = jnp.transpose(x, (0, 2, 3, 1)).reshape(B, T, C * F)
            le = x.shape[1]
            if le % self.stride != 0:
                x = jnp.pad(x, ((0, 0), (0, self.stride - le % self.stride), (0, 0)))
            y = Conv1d(self.chin, self.chout, self.kernel_size, stride=self.stride,
                       padding=pad_amt, dtype=self.dtype, name="conv")(x)
        if self.empty:
            return y
        if inject is not None:
            y = y + (inject[:, None] if y.ndim == 4 and inject.ndim == 3 else inject)
        if self.norm:
            y = GroupNorm(self.norm_groups, self.chout, dtype=self.dtype, name="norm1")(y)
        y = _gelu(y)
        if self.dconv:
            if self.freq:
                B, F, T, C = y.shape
                y = DConv(C, self.dconv_comp, self.dconv_depth, self.dconv_init,
                          attn=self.dconv_attn, lstm=self.dconv_lstm,
                          dtype=self.dtype, name="dconv")(y.reshape(B * F, T, C))
                y = y.reshape(B, F, T, C)
            else:
                y = DConv(self.chout, self.dconv_comp, self.dconv_depth,
                          self.dconv_init, attn=self.dconv_attn,
                          lstm=self.dconv_lstm, dtype=self.dtype, name="dconv")(y)
        if self.rewrite:
            c = self.context
            if self.freq:
                z = Conv2dTorch(self.chout, 2 * self.chout, (1 + 2 * c, 1 + 2 * c),
                                (1, 1), (c, c), dtype=self.dtype, name="rewrite")(y)
            else:
                z = Conv1d(self.chout, 2 * self.chout, 1 + 2 * c, padding=c,
                           dtype=self.dtype, name="rewrite")(y)
            if self.norm:
                z = GroupNorm(self.norm_groups, 2 * self.chout, dtype=self.dtype,
                              name="norm2")(z)
            z = _glu(z)
        else:
            z = y
        return z


class HDecLayer(nn.Module):
    """Hybrid decoder layer (reference hdemucs.py HDecLayer:252).
    Returns (output, pre) where `pre` is the activation before the final
    transposed conv — the branch-separation point."""

    chin: int
    chout: int
    last: bool = False
    kernel_size: int = 8
    stride: int = 4
    norm_groups: int = 1
    empty: bool = False
    freq: bool = True
    dconv: bool = True
    norm: bool = True
    context: int = 1
    pad: bool = True
    context_freq: bool = True
    rewrite: bool = True
    dconv_depth: int = 2
    dconv_comp: float = 4.0
    dconv_init: float = 1e-4
    dconv_lstm: bool = False
    dconv_attn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, length):
        pad_amt = self.kernel_size // 4 if self.pad else 0
        if self.freq and x.ndim == 3:
            x = x[:, None]  # (B, 1, T, C): time→freq transition (F==1)
        if not self.empty:
            x = x + skip
            if self.rewrite:
                c = self.context
                if self.freq:
                    if self.context_freq:
                        y = Conv2dTorch(self.chin, 2 * self.chin,
                                        (1 + 2 * c, 1 + 2 * c), (1, 1), (c, c),
                                        dtype=self.dtype, name="rewrite")(x)
                    else:
                        y = Conv2dTorch(self.chin, 2 * self.chin, (1, 1 + 2 * c),
                                        (1, 1), (0, c), dtype=self.dtype,
                                        name="rewrite")(x)
                else:
                    y = Conv1d(self.chin, 2 * self.chin, 1 + 2 * c, padding=c,
                               dtype=self.dtype, name="rewrite")(x)
                if self.norm:
                    y = GroupNorm(self.norm_groups, 2 * self.chin, dtype=self.dtype,
                                  name="norm1")(y)
                y = _glu(y)
            else:
                y = x
            if self.dconv:
                if self.freq:
                    B, F, T, C = y.shape
                    y = DConv(C, self.dconv_comp, self.dconv_depth, self.dconv_init,
                              attn=self.dconv_attn, lstm=self.dconv_lstm,
                              dtype=self.dtype, name="dconv")(y.reshape(B * F, T, C))
                    y = y.reshape(B, F, T, C)
                else:
                    y = DConv(self.chin, self.dconv_comp, self.dconv_depth,
                              self.dconv_init, attn=self.dconv_attn,
                              lstm=self.dconv_lstm, dtype=self.dtype, name="dconv")(y)
        else:
            y = x
        if self.freq:
            z = ConvTranspose2dTorch(self.chin, self.chout, (self.kernel_size, 1),
                                     (self.stride, 1), dtype=self.dtype,
                                     name="conv_tr")(y)
        else:
            z = ConvTranspose1d(self.chin, self.chout, self.kernel_size,
                                stride=self.stride, dtype=self.dtype,
                                name="conv_tr")(y)
        if self.norm:
            z = GroupNorm(self.norm_groups, self.chout, dtype=self.dtype, name="norm2")(z)
        if self.freq:
            if pad_amt:
                z = z[:, pad_amt:-pad_amt]
        else:
            z = z[:, pad_amt : pad_amt + length]
        if not self.last:
            z = _gelu(z)
        return z, y


# ---------------------------------------------------------------------------
# cross-domain transformer (v4)
# ---------------------------------------------------------------------------


def _sin_embedding_np(length: int, dim: int, max_period: float) -> np.ndarray:
    """(length, dim) = cat[cos(phase), sin(phase)]
    (reference transformer.py create_sin_embedding:19)."""
    pos = np.arange(length, dtype=np.float64)[:, None]
    adim = np.arange(dim // 2, dtype=np.float64)[None, :]
    phase = pos / (max_period ** (adim / (dim // 2 - 1)))
    return np.concatenate([np.cos(phase), np.sin(phase)], -1).astype(np.float32)


def _sin_embedding_2d_np(d_model: int, height: int, width: int,
                         max_period: float) -> np.ndarray:
    """(height, width, d_model) interleaved sin/cos over width then height
    (reference transformer.py create_2d_sin_embedding:37)."""
    pe = np.zeros((d_model, height, width), np.float64)
    d = d_model // 2
    div = np.exp(np.arange(0.0, d, 2) * -(math.log(max_period) / d))
    pos_w = np.arange(width, dtype=np.float64)[:, None]
    pos_h = np.arange(height, dtype=np.float64)[:, None]
    pe[0:d:2] = np.sin(pos_w * div).T[:, None, :]
    pe[1:d:2] = np.cos(pos_w * div).T[:, None, :]
    pe[d::2] = np.sin(pos_h * div).T[:, :, None]
    pe[d + 1 :: 2] = np.cos(pos_h * div).T[:, :, None]
    return pe.transpose(1, 2, 0).astype(np.float32)  # (H, W, C)


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention parameter layout (in_proj_weight packed
    q/k/v (3C, C), out_proj Linear)."""

    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        C, H = self.dim, self.heads
        dh = C // H
        bound = 1.0 / math.sqrt(C)
        w_in = self.param("in_proj_weight",
                          lambda key, s: jax.random.uniform(key, s, jnp.float32,
                                                            -bound, bound), (3 * C, C))
        b_in = self.param("in_proj_bias", lambda key, s: jnp.zeros(s, jnp.float32),
                          (3 * C,))
        wq, wk, wv = w_in[:C], w_in[C : 2 * C], w_in[2 * C :]
        bq, bk, bv = b_in[:C], b_in[C : 2 * C], b_in[2 * C :]
        dt = self.dtype
        qh = (q.astype(dt) @ wq.T.astype(dt) + bq.astype(dt))
        kh = (k.astype(dt) @ wk.T.astype(dt) + bk.astype(dt))
        vh = (v.astype(dt) @ wv.T.astype(dt) + bv.astype(dt))
        B, Tq, _ = qh.shape
        Tk = kh.shape[1]
        qh = qh.reshape(B, Tq, H, dh).transpose(0, 2, 1, 3) / math.sqrt(dh)
        kh = kh.reshape(B, Tk, H, dh).transpose(0, 2, 1, 3)
        vh = vh.reshape(B, Tk, H, dh).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", qh, kh), axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, Tq, C)
        return Linear(C, C, dtype=self.dtype, name="out_proj")(out)


class TransformerLayer(nn.Module):
    """Self-attention layer with norm_first/LayerScale/GroupNorm-out
    (reference transformer.py MyTransformerEncoderLayer:271)."""

    dim: int
    heads: int
    hidden: int
    norm_first: bool = True
    norm_out: bool = False
    layer_scale: bool = True
    init_values: float = 1e-4
    gelu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = _gelu if self.gelu else jax.nn.relu
        sa = MultiheadAttention(self.dim, self.heads, dtype=self.dtype, name="self_attn")
        n1 = TorchLayerNorm(self.dim, dtype=self.dtype, name="norm1")
        n2 = TorchLayerNorm(self.dim, dtype=self.dtype, name="norm2")
        l1 = Linear(self.dim, self.hidden, dtype=self.dtype, name="linear1")
        l2 = Linear(self.hidden, self.dim, dtype=self.dtype, name="linear2")
        g1 = (LayerScale(self.dim, self.init_values, name="gamma_1")
              if self.layer_scale else (lambda v: v))
        g2 = (LayerScale(self.dim, self.init_values, name="gamma_2")
              if self.layer_scale else (lambda v: v))
        if self.norm_first:
            h = n1(x)
            x = x + g1(sa(h, h, h))
            x = x + g2(l2(act(l1(n2(x)))))
            if self.norm_out:
                x = GroupNorm(1, self.dim, dtype=self.dtype, name="norm_out")(x)
        else:
            x = n1(x + g1(sa(x, x, x)))
            x = n2(x + g2(l2(act(l1(x)))))
        return x


class CrossTransformerLayer(nn.Module):
    """Cross-attention layer (reference transformer.py
    CrossTransformerEncoderLayer:380)."""

    dim: int
    heads: int
    hidden: int
    norm_first: bool = True
    norm_out: bool = False
    layer_scale: bool = True
    init_values: float = 1e-4
    gelu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k):
        act = _gelu if self.gelu else jax.nn.relu
        ca = MultiheadAttention(self.dim, self.heads, dtype=self.dtype, name="cross_attn")
        n1 = TorchLayerNorm(self.dim, dtype=self.dtype, name="norm1")
        n2 = TorchLayerNorm(self.dim, dtype=self.dtype, name="norm2")
        n3 = TorchLayerNorm(self.dim, dtype=self.dtype, name="norm3")
        l1 = Linear(self.dim, self.hidden, dtype=self.dtype, name="linear1")
        l2 = Linear(self.hidden, self.dim, dtype=self.dtype, name="linear2")
        g1 = (LayerScale(self.dim, self.init_values, name="gamma_1")
              if self.layer_scale else (lambda v: v))
        g2 = (LayerScale(self.dim, self.init_values, name="gamma_2")
              if self.layer_scale else (lambda v: v))
        if self.norm_first:
            kk = n2(k)
            x = q + g1(ca(n1(q), kk, kk))
            x = x + g2(l2(act(l1(n3(x)))))
            if self.norm_out:
                x = GroupNorm(1, self.dim, dtype=self.dtype, name="norm_out")(x)
        else:
            x = n1(q + g1(ca(q, k, k)))
            x = n2(x + g2(l2(act(l1(x)))))
        return x


class CrossTransformerEncoder(nn.Module):
    """Interleaved self/cross transformer over the two branches
    (reference transformer.py CrossTransformerEncoder:526). Only the
    ``sin`` positional embedding (the one every released checkpoint uses)
    is supported; embeddings are trace-time numpy constants."""

    dim: int
    hidden_scale: float = 4.0
    num_heads: int = 8
    num_layers: int = 5
    cross_first: bool = False
    emb: str = "sin"
    norm_in: bool = True
    norm_first: bool = True
    norm_out: bool = True
    max_period: float = 10000.0
    layer_scale: bool = True
    gelu: bool = True
    weight_pos_embed: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, xt):
        if self.emb != "sin":
            raise NotImplementedError(f"positional embedding {self.emb!r}")
        B, F, T1, C = x.shape
        hidden = int(self.dim * self.hidden_scale)
        classic_parity = 1 if self.cross_first else 0

        pos2d = _sin_embedding_2d_np(C, F, T1, self.max_period)  # (F, T1, C)
        pos2d = jnp.asarray(pos2d.transpose(1, 0, 2).reshape(T1 * F, C), x.dtype)
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(B, T1 * F, C)  # t-major flatten
        if self.norm_in:
            x = TorchLayerNorm(self.dim, dtype=self.dtype, name="norm_in")(x)
        x = x + self.weight_pos_embed * pos2d[None]

        T2 = xt.shape[1]
        pos1d = jnp.asarray(_sin_embedding_np(T2, C, self.max_period), xt.dtype)
        if self.norm_in:
            xt = TorchLayerNorm(self.dim, dtype=self.dtype, name="norm_in_t")(xt)
        xt = xt + self.weight_pos_embed * pos1d[None]

        kw = dict(dim=self.dim, heads=self.num_heads, hidden=hidden,
                  norm_first=self.norm_first, norm_out=self.norm_out,
                  layer_scale=self.layer_scale, gelu=self.gelu, dtype=self.dtype)
        for idx in range(self.num_layers):
            if idx % 2 == classic_parity:
                x = TransformerLayer(**kw, name=f"layers_{idx}")(x)
                xt = TransformerLayer(**kw, name=f"layers_t_{idx}")(xt)
            else:
                old_x = x
                x = CrossTransformerLayer(**kw, name=f"layers_{idx}")(x, xt)
                xt = CrossTransformerLayer(**kw, name=f"layers_t_{idx}")(xt, old_x)

        x = x.reshape(B, T1, F, C).transpose(0, 2, 1, 3)
        return x, xt


# ---------------------------------------------------------------------------
# the hybrid models
# ---------------------------------------------------------------------------


def _layer_plan(cfg) -> list[dict]:
    """Replicates the reference constructor's channel/stride bookkeeping
    (hdemucs.py:492-581 / htdemucs.py:258-363) as a static plan."""
    plan = []
    chin = cfg.audio_channels
    chin_z = chin * (2 if cfg.cac else 1)
    chout = cfg.channels_time or cfg.channels
    chout_z = cfg.channels
    freqs = cfg.nfft // 2
    for index in range(cfg.depth):
        lstm = index >= cfg.dconv_lstm
        attn = index >= cfg.dconv_attn
        norm = index >= cfg.norm_starts
        freq = freqs > 1
        stri, ker = cfg.stride, cfg.kernel_size
        if not freq:
            ker, stri = cfg.time_stride * 2, cfg.time_stride
        pad = True
        last_freq = False
        if freq and freqs <= cfg.kernel_size:
            ker, pad, last_freq = freqs, False, True
        if last_freq:
            chout_z = max(chout, chout_z)
            chout = chout_z
        entry = dict(index=index, chin=chin, chin_z=chin_z, chout=chout,
                     chout_z=chout_z, ker=ker, stri=stri, freq=freq, pad=pad,
                     norm=norm, last_freq=last_freq, lstm=lstm, attn=attn,
                     freqs=freqs)
        plan.append(entry)
        if index == 0:
            chin = cfg.audio_channels * len(cfg.sources)
            chin_z = chin * (2 if cfg.cac else 1)
            entry["dec_chout"] = chin
            entry["dec_chout_z"] = chin_z
        chin = chout
        chin_z = chout_z
        chout = int(cfg.growth * chout)
        chout_z = int(cfg.growth * chout_z)
        if freq:
            freqs = 1 if freqs <= cfg.kernel_size else freqs // cfg.stride
        entry["freqs_after"] = freqs
    return plan


class _HybridBase(nn.Module):
    """Shared forward machinery for HDemucs / HTDemucs."""

    sources: Sequence[str] = ("drums", "bass", "other", "vocals")
    audio_channels: int = 2
    channels: int = 48
    channels_time: Optional[int] = None
    growth: float = 2.0
    nfft: int = 4096
    cac: bool = True
    depth: int = 6
    rewrite: bool = True
    multi_freqs: Optional[tuple] = None
    multi_freqs_depth: int = 2
    freq_emb: float = 0.2
    emb_scale: float = 10.0
    emb_smooth: bool = True
    kernel_size: int = 8
    time_stride: int = 2
    stride: int = 4
    context: int = 1
    context_enc: int = 0
    norm_starts: int = 4
    norm_groups: int = 4
    dconv_mode: int = 1
    dconv_depth: int = 2
    dconv_comp: float = 4.0
    dconv_attn: int = 4
    dconv_lstm: int = 4
    dconv_init: float = 1e-4
    wiener_iters: int = 0
    end_iters: int = 0
    wiener_residual: bool = False
    samplerate: int = 44100
    segment: float = 40.0
    dtype: Any = jnp.float32

    @property
    def hop_length(self) -> int:
        return self.nfft // 4

    # -- spectral transforms (reference hdemucs.py _spec:585 / _ispec:612) --

    def _spec(self, mix):
        """mix (B, T, C) -> (z_re, z_im) each (B, C, le, nfft//2) frame-major,
        torch.stft(normalized=True)-scaled."""
        hl, nfft = self.hop_length, self.nfft
        x = jnp.swapaxes(mix, 1, 2)  # (B, C, T)
        le = int(math.ceil(x.shape[-1] / hl))
        pad = hl // 2 * 3
        x = reflect_pad_1d(x, pad, pad + le * hl - x.shape[-1])
        re, im = _stft(x, nfft, hl, center=True, pad_mode="reflect")
        scale = 1.0 / math.sqrt(nfft)
        re, im = re * scale, im * scale
        # drop Nyquist bin, trim the 2-frame context each side
        return re[..., 2 : 2 + le, :-1], im[..., 2 : 2 + le, :-1]

    def _ispec(self, re, im, length):
        """re/im (..., le, nfft//2) -> (..., length)."""
        hl, nfft = self.hop_length, self.nfft
        pad_spec = [(0, 0)] * (re.ndim - 2) + [(2, 2), (0, 1)]
        re = jnp.pad(re, pad_spec)
        im = jnp.pad(im, pad_spec)
        pad = hl // 2 * 3
        le = hl * int(math.ceil(length / hl)) + 2 * pad
        scale = math.sqrt(nfft)
        x = _istft(re * scale, im * scale, nfft, hl, center=True, length=le)
        return x[..., pad : pad + length]

    def _magnitude(self, z_re, z_im):
        """CaC: (B, C, T, F) pair -> (B, F, T, 2C), channel order (c, re/im)."""
        if not self.cac:
            mag = jnp.sqrt(z_re * z_re + z_im * z_im)
            return jnp.transpose(mag, (0, 3, 2, 1))
        z = jnp.stack([z_re, z_im], axis=-1)  # (B, C, T, F, 2)
        z = jnp.transpose(z, (0, 3, 2, 1, 4))  # (B, F, T, C, 2)
        B, F, T, C, _ = z.shape
        return z.reshape(B, F, T, 2 * C)

    def _mask(self, spec_out, z_re=None, z_im=None):
        """spec_out (B, F, T, S*2C) CaC — or (B, F, T, S*C) magnitudes with
        the mixture spectrogram (z_re, z_im) for non-CaC checkpoints —
        -> (re, im) each (B, S, C, T, F). Non-CaC follows reference
        hdemucs.py:642-668: wiener_iters < 0 → naive mixture-phase mask,
        else multichannel Wiener EM (ops/wiener.py) in 300-frame windows."""
        S = len(self.sources)
        C = self.audio_channels
        B, F, T, _ = spec_out.shape
        if self.cac:
            z = spec_out.reshape(B, F, T, S, C, 2)
            z = jnp.transpose(z, (0, 3, 4, 2, 1, 5))  # (B, S, C, T, F, 2)
            return z[..., 0], z[..., 1]
        m = spec_out.reshape(B, F, T, S, C).astype(jnp.float32)
        z = (z_re.astype(jnp.float32) +
             1j * z_im.astype(jnp.float32))  # (B, C, T, F) complex64
        if self.wiener_iters < 0:
            unit = z / (1e-8 + jnp.abs(z))
            y = unit[:, None] * jnp.transpose(m, (0, 3, 4, 2, 1))  # (B,S,C,T,F)
        else:
            from ..ops.wiener import wiener

            mix = jnp.transpose(z, (0, 2, 3, 1))        # (B, T, F, C)
            mag = jnp.transpose(m, (0, 2, 1, 4, 3))     # (B, T, F, C, S)
            y = jax.vmap(lambda mm, xx: wiener(
                mm, xx, self.wiener_iters,
                residual=self.wiener_residual))(mag, mix)  # (B, T, F, C, S)
            y = jnp.transpose(y, (0, 4, 3, 1, 2))        # (B, S, C, T, F)
        return jnp.real(y), jnp.imag(y)

    def _enc_layer(self, p, time_branch: bool, name: str, empty: bool = False):
        dmode = self.dconv_mode & 1
        return HEncLayer(
            chin=p["chin"] if time_branch else p["chin_z"],
            chout=p["chout"] if time_branch else p["chout_z"],
            kernel_size=self.kernel_size if time_branch else p["ker"],
            stride=self.stride if time_branch else p["stri"],
            norm_groups=self.norm_groups,
            empty=empty, freq=False if time_branch else p["freq"],
            dconv=bool(dmode), norm=p["norm"], context=self.context_enc,
            pad=True if time_branch else p["pad"], rewrite=self.rewrite,
            dconv_depth=self.dconv_depth, dconv_comp=self.dconv_comp,
            dconv_init=self.dconv_init, dconv_lstm=p["lstm"],
            dconv_attn=p["attn"], dtype=self.dtype, name=name)

    def _dec_layer(self, p, time_branch: bool, name: str, empty: bool = False):
        dmode = self.dconv_mode & 2
        chout = p.get("dec_chout") if p["index"] == 0 else None
        if time_branch:
            cin = p["chout"]
            cout = chout if p["index"] == 0 else p["chin"]
        else:
            cin = p["chout_z"]
            cout = p.get("dec_chout_z") if p["index"] == 0 else p["chin_z"]
        return HDecLayer(
            chin=cin, chout=cout, last=p["index"] == 0,
            kernel_size=self.kernel_size if time_branch else p["ker"],
            stride=self.stride if time_branch else p["stri"],
            norm_groups=self.norm_groups, empty=empty,
            freq=False if time_branch else p["freq"], dconv=bool(dmode),
            norm=p["norm"], context=self.context,
            pad=True if time_branch else p["pad"], rewrite=self.rewrite,
            dconv_depth=self.dconv_depth, dconv_comp=self.dconv_comp,
            dconv_init=self.dconv_init, dconv_lstm=p["lstm"],
            dconv_attn=p["attn"], dtype=self.dtype, name=name)

    def _run_hybrid(self, mix, transformer=None):
        """The shared encoder → (transformer) → decoder forward.

        mix: (B, T, C_audio) -> (B, S, T, C_audio).
        """
        if self.multi_freqs:
            raise NotImplementedError("MultiWrap frequency splitting")
        B, length, _ = mix.shape
        plan = _layer_plan(self)

        z_re, z_im = self._spec(mix)
        x = self._magnitude(z_re, z_im)  # (B, F, T, Cz)

        mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        std = jnp.std(x, axis=(1, 2, 3), keepdims=True, ddof=1)
        x = (x - mean) / (1e-5 + std)

        xt = mix
        meant = jnp.mean(xt, axis=(1, 2), keepdims=True)
        stdt = jnp.std(xt, axis=(1, 2), keepdims=True, ddof=1)
        xt = (xt - meant) / (1e-5 + stdt)

        saved, saved_t, lengths, lengths_t = [], [], [], []
        n_tenc = sum(1 for p in plan if p["freq"])
        for p in plan:
            idx = p["index"]
            lengths.append(x.shape[2] if x.ndim == 4 else x.shape[1])
            inject = None
            if idx < n_tenc:
                lengths_t.append(xt.shape[1])
                tenc = self._enc_layer(p, True, f"tencoder_{idx}",
                                       empty=p["last_freq"])
                xt = tenc(xt)
                if not p["last_freq"]:
                    saved_t.append(xt)
                else:
                    inject = xt
            enc = self._enc_layer(p, False, f"encoder_{idx}")
            x = enc(x, inject)
            if idx == 0 and self.freq_emb:
                Fr = x.shape[1]
                emb = Embedding(Fr, x.shape[-1], dtype=self.dtype,
                                name="freq_emb")(jnp.arange(Fr))
                emb = emb * self.emb_scale
                x = x + self.freq_emb_scale_value() * emb[None, :, None, :]
            saved.append(x)

        if transformer is not None:
            x, xt = transformer(x, xt)
        else:
            x = jnp.zeros_like(x)

        n_tdec = n_tenc
        offset = self.depth - n_tdec
        for di, p in enumerate(reversed(plan)):
            skip = saved.pop(-1)
            dec = self._dec_layer(p, False, f"decoder_{di}")
            x, pre = dec(x, skip, lengths.pop(-1))
            if di >= offset:
                tp = plan[n_tdec - 1 - (di - offset)]
                tdec = self._dec_layer(tp, True, f"tdecoder_{di - offset}",
                                       empty=tp["last_freq"])
                length_t = lengths_t.pop(-1)
                if tp["last_freq"]:
                    pre = pre[:, 0]  # (B, T, C): F == 1 at the merge point
                    xt, _ = tdec(pre, None, length_t)
                else:
                    skip_t = saved_t.pop(-1)
                    xt, _ = tdec(xt, skip_t, length_t)

        assert not saved and not saved_t and not lengths_t
        S = len(self.sources)
        x = x * std + mean
        re, im = self._mask(x, z_re, z_im)  # (B, S, C, T, F)
        wave_spec = self._ispec(re, im, length)  # (B, S, C, length)

        xt = xt.reshape(B, length, S, self.audio_channels)
        xt = jnp.transpose(xt, (0, 2, 1, 3))  # (B, S, T, C)
        xt = xt * stdt[:, None] + meant[:, None]
        out = xt + jnp.swapaxes(wave_spec, 2, 3)
        return out

    def freq_emb_scale_value(self) -> float:
        return self.freq_emb


class HDemucs(_HybridBase):
    """Hybrid Demucs v3 (reference hdemucs.py HDemucs:334) — frequency
    U-Net merged with a parallel time branch at the stride-matched layer;
    DConv branches may carry BLSTM + LocalState at the inner layers
    (hdemucs_mmi)."""

    @nn.compact
    def __call__(self, mix):
        return self._run_hybrid(mix, transformer=None)


class HTDemucs(_HybridBase):
    """Hybrid Transformer Demucs v4 (reference htdemucs.py HTDemucs:27) —
    both branches stay separate through the encoder and exchange
    information in a cross-domain transformer."""

    depth: int = 4
    dconv_comp: float = 8.0
    dconv_init: float = 1e-3
    # v4 DConv branches never carry attention/LSTM (the reference HTDemucs
    # constructor simply doesn't pass these to DConv — htdemucs.py:283-288)
    dconv_attn: int = 10**9
    dconv_lstm: int = 10**9
    multi_freqs_depth: int = 3
    bottom_channels: int = 0
    t_layers: int = 5
    t_emb: str = "sin"
    t_hidden_scale: float = 4.0
    t_heads: int = 8
    t_dropout: float = 0.0
    t_norm_in: bool = True
    t_norm_first: bool = True
    t_norm_out: bool = True
    t_max_period: float = 10000.0
    t_layer_scale: bool = True
    t_gelu: bool = True
    t_weight_pos_embed: float = 1.0
    t_cross_first: bool = False
    segment: float = 10.0
    use_train_segment: bool = True

    @nn.compact
    def __call__(self, mix, train: bool = False):
        B, length, C = mix.shape
        length_pre_pad = None
        if self.use_train_segment and not train:
            training_length = int(self.segment * self.samplerate)
            if length < training_length:
                length_pre_pad = length
                mix = jnp.pad(mix, ((0, 0), (0, training_length - length), (0, 0)))

        tr_channels = int(self.channels * self.growth ** (self.depth - 1))

        def transformer(x, xt):
            if self.t_layers <= 0:
                return x, xt
            ch = tr_channels
            if self.bottom_channels:
                # 1x1 conv = per-position channel remap; apply directly in
                # channels-last without flattening the freq grid
                Bq, F, T, Cq = x.shape
                xf = x.reshape(Bq, F * T, Cq)
                xf = Conv1d(Cq, self.bottom_channels, 1, dtype=self.dtype,
                            name="channel_upsampler")(xf)
                x = xf.reshape(Bq, F, T, self.bottom_channels)
                xt = Conv1d(Cq, self.bottom_channels, 1, dtype=self.dtype,
                            name="channel_upsampler_t")(xt)
                ch = self.bottom_channels
            x, xt = CrossTransformerEncoder(
                dim=ch, hidden_scale=self.t_hidden_scale, num_heads=self.t_heads,
                num_layers=self.t_layers, cross_first=self.t_cross_first,
                emb=self.t_emb, norm_in=self.t_norm_in,
                norm_first=self.t_norm_first, norm_out=self.t_norm_out,
                max_period=self.t_max_period, layer_scale=self.t_layer_scale,
                gelu=self.t_gelu, weight_pos_embed=self.t_weight_pos_embed,
                dtype=self.dtype, name="crosstransformer")(x, xt)
            if self.bottom_channels:
                Bq, F, T, Cq = x.shape
                xf = x.reshape(Bq, F * T, Cq)
                xf = Conv1d(Cq, tr_channels, 1, dtype=self.dtype,
                            name="channel_downsampler")(xf)
                x = xf.reshape(Bq, F, T, tr_channels)
                xt = Conv1d(Cq, tr_channels, 1, dtype=self.dtype,
                            name="channel_downsampler_t")(xt)
            return x, xt

        out = self._run_hybrid(mix, transformer=transformer)
        if length_pre_pad is not None:
            out = out[:, :, :length_pre_pad]
        return out
