"""Primitive NN layers with torch-compatible parameter layouts.

All activations are channels-last (B, T, C) — the TPU-native layout (C on
the lane axis). Parameters keep torch's layout (Conv1d: (O, I/g, K);
ConvTranspose1d: (I, O/g, K); Linear: (O, I)) so that importing reference
``.pth`` checkpoints (reference vc_infer_pipeline.py:199-226 format) is a
pure key-mapping with zero transposition bookkeeping.

Weight normalization is an explicit parameterization (weight_v, weight_g)
matching torch.nn.utils.weight_norm over dim 0 (reference
lib/infer_pack/modules.py uses it on every WN/ResBlock/upsample conv), so
training dynamics match; ``fold_weight_norm`` converts a param tree to
plain weights for inference (reference ``remove_weight_norm``).
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

LRELU_SLOPE = 0.1


def leaky_relu(x, slope: float = LRELU_SLOPE):
    return jnp.where(x >= 0, x, x * slope)


def sequence_mask(lengths: jax.Array, max_length: int) -> jax.Array:
    """(B,) -> (B, T, 1) float mask (reference commons.sequence_mask)."""
    t = jnp.arange(max_length)[None, :]
    return (t < lengths[:, None])[..., None]


def _norm_except_dim0(v: jax.Array) -> jax.Array:
    axes = tuple(range(1, v.ndim))
    return jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True))


def _s2d_weight(w: jax.Array, S: int, dilation: int, padding: int):
    """Rearrange a (O, I, k) conv weight into its space-to-depth form.

    Space-to-depth packs S consecutive samples into channels — a FREE
    reshape in the (B, T, C) row-major layout — turning a small-channel
    conv (C ≪ the TPU's 128-lane MXU width) into a wide block-Toeplitz
    conv over (S·I → S·O) superchannels that tiles the MXU fully. The
    transform is exact: output slot s, tap j reads input sample
    s + dilation·j − padding, which lands in superframe q, slot s'.

    Returns (W2 (S·O, S·I, Q), pad_left, pad_right) for the equivalent
    stride-1, dilation-1 conv over superframes.

    Built as ONE tiny tensordot against a CONSTANT 0/1 selection tensor —
    a scatter here would execute per forward call (weights are traced
    params) and cost ~1.3 ms/conv on TPU, erasing the s2d win.
    """
    import numpy as np

    O, I, k = w.shape
    offs = np.arange(k) * dilation - padding  # sample offset per tap
    q_all = np.floor_divide(offs[None, :] + np.arange(S)[:, None], S)  # (S, k)
    q0, q1 = int(q_all.min()), int(q_all.max())
    Q = q1 - q0 + 1
    # Sel[j, s, q, s'] = 1 where out-slot s, tap j reads superframe q slot s'
    sel = np.zeros((k, S, Q, S), w.dtype)
    for s in range(S):
        for j in range(k):
            a = s + offs[j]
            sel[j, s, a // S - q0, a % S] = 1.0
    tmp = jnp.tensordot(w, jnp.asarray(sel), axes=[[2], [0]])  # (O,I,S,Q,S')
    W2 = jnp.transpose(tmp, (2, 0, 4, 1, 3)).reshape(S * O, S * I, Q)
    return W2, -q0, q1


class Conv1d(nn.Module):
    """1-D convolution; input (B, T, Cin) -> (B, T', Cout).

    weight: (out, in/groups, k) — torch layout. ``padding`` is symmetric
    sample padding like torch's int argument.

    ``s2d`` (space-to-depth factor S > 1): input and output are expected
    in the packed (B, T/S, S·C) layout (a free row-major reshape of
    (B, T, C)). The stored parameters are UNCHANGED (checkpoint layout
    identical); the weight is rearranged at trace time into an exact
    block-Toeplitz superchannel conv — small-channel HiFiGAN stages
    (C = 32/64) go from 1/16-1/4 MXU lane utilization to full tiles.
    Requires stride=1, groups=1.

    ``pack_stride`` (strided convs): pack the input by the STRIDE
    (x → (B, T/s, s·Cin), a free reshape) so the op becomes a stride-1
    VALID conv over superframes with weight (O, s·Cin, ceil(k/s)) — XLA
    lowers strided small-channel convs terribly on TPU (measured 26% MXU
    on the HuBERT frontend, 4.8 ms for one 1→C noise conv), while the
    packed form is a dense full-contraction matmul. Exact: zero-pad
    samples beyond the last output's window only ever multiply
    structurally-zero weight entries. Input/output stay UNPACKED here
    (the pack is internal). Requires dilation=1, groups=1.
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    weight_norm: bool = False
    s2d: int = 1
    pack_stride: bool = False
    dtype: Any = jnp.float32

    def _kernel_init(self, key, shape, dtype):
        # torch Conv1d default: kaiming_uniform(a=sqrt(5)) == U(-b, b),
        # b = 1/sqrt(fan_in)
        fan_in = shape[1] * shape[2]
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    @nn.compact
    def __call__(self, x: jax.Array, *, return_weights: bool = False):
        shape = (self.out_channels, self.in_channels // self.groups, self.kernel_size)
        if self.weight_norm:
            v = self.param("weight_v", self._kernel_init, shape, jnp.float32)
            g = self.param(
                "weight_g", lambda k, s: _norm_except_dim0(v), (self.out_channels, 1, 1)
            )
            w = g * v / (_norm_except_dim0(v) + 1e-12)
        else:
            w = self.param("weight", self._kernel_init, shape, jnp.float32)
        if return_weights:
            # fused-kernel path (ops/pallas_resblock): hand the folded weight
            # (+ bias) to the caller instead of convolving. Params are
            # created in the same order as the conv path, so the tree is
            # identical either way.
            b = None
            if self.use_bias:
                fan_in = shape[1] * shape[2]
                bound = 1.0 / math.sqrt(fan_in)
                b = self.param(
                    "bias",
                    lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
                    (self.out_channels,),
                )
            return w, b
        if self.pack_stride and self.stride > 1:
            assert self.dilation == 1 and self.groups == 1 and self.s2d == 1
            s, k, p = self.stride, self.kernel_size, self.padding
            B, T, I = x.shape
            O = self.out_channels
            Q = -(-k // s)
            T_out = (T + 2 * p - k) // s + 1
            # left-pad by p; right-pad so the packed length covers the last
            # output's superframe window. Pad samples beyond T+p only meet
            # the zero rows of the padded weight (k..Q·s) or belong to
            # windows past the last output — never computed.
            Tp = s * (T_out - 1 + Q)
            # Tp can undershoot T+p (unused tail samples): pad then crop
            xp = jnp.pad(
                x, ((0, 0), (p, max(0, Tp - T - p)), (0, 0)))[:, :Tp]
            xpk = xp.reshape(B, Tp // s, s * I)
            # W2[o, slot·I + i, q] = w[o, i, q·s + slot]
            wp = jnp.pad(w, ((0, 0), (0, 0), (0, Q * s - k)))
            W2 = jnp.transpose(wp.reshape(O, I, Q, s), (0, 3, 1, 2)
                               ).reshape(O, s * I, Q)
            y = jax.lax.conv_general_dilated(
                xpk.astype(self.dtype),
                W2.astype(self.dtype),
                window_strides=(1,),
                padding=[(0, 0)],
                dimension_numbers=("NWC", "OIW", "NWC"),
            )
            y = y[:, :T_out]
        elif self.s2d > 1:
            assert self.stride == 1 and self.groups == 1
            W2, pl, pr = _s2d_weight(w, self.s2d, self.dilation, self.padding)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                W2.astype(self.dtype),
                window_strides=(1,),
                padding=[(pl, pr)],
                dimension_numbers=("NWC", "OIW", "NWC"),
            )
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                w.astype(self.dtype),
                window_strides=(self.stride,),
                padding=[(self.padding, self.padding)],
                rhs_dilation=(self.dilation,),
                dimension_numbers=("NWC", "OIW", "NWC"),
                feature_group_count=self.groups,
            )
        if self.use_bias:
            fan_in = shape[1] * shape[2]
            bound = 1.0 / math.sqrt(fan_in)
            b = self.param(
                "bias",
                lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
                (self.out_channels,),
            )
            if self.s2d > 1:
                b = jnp.tile(b, self.s2d)
            y = y + b.astype(self.dtype)
        return y


def _subpixel_weight(w: jax.Array, u: int, p: int):
    """Rearrange a transposed-conv weight (I, O, K) into its subpixel
    (depth-to-space) form: a stride-1 conv producing u phases per input
    frame, W2 (u·O, I, M).

    y[t·u + r] = Σ_m x[t − m]·W[:, :, m·u + r + p]; valid taps span
    m ∈ [m0, m1]. Correlation-form conv reads x[t + j − pad_lo], so taps
    are stored reversed (j = m1 − m) with padding (m1, −m0). Exact for any
    (K, u, p) with K − 2p == u (the only geometry whose output length is
    T·u; all HiFiGAN upsample stages satisfy it). Built as one tensordot
    against a constant 0/1 selection tensor (same rationale as
    _s2d_weight)."""
    import numpy as np

    I, O, K = w.shape
    m0 = -((p + u - 1) // u)
    m1 = (K - 1 - p) // u
    M = m1 - m0 + 1
    sel = np.zeros((K, M, u), np.float32)
    for m in range(m0, m1 + 1):
        for r in range(u):
            k_idx = m * u + r + p
            if 0 <= k_idx < K:
                sel[k_idx, m1 - m, r] = 1.0
    tmp = jnp.tensordot(w, jnp.asarray(sel), axes=[[2], [0]])  # (I, O, M, u)
    W2 = jnp.transpose(tmp, (3, 1, 0, 2)).reshape(u * O, I, M)
    return W2, m1, -m0


class ConvTranspose1d(nn.Module):
    """Transposed 1-D convolution matching torch.nn.ConvTranspose1d.

    weight: (in, out/groups, k) — torch layout. When the geometry
    satisfies K − 2·padding == stride (every HiFiGAN upsample stage), the
    op runs as a stride-1 SUBPIXEL conv (u·out channels, depth-to-space
    reshape) instead of an input-dilated conv: the dilated form computes
    u−1 zero products per tap and lowers terribly for small channel
    counts on TPU (measured 0.5% MXU utilization on the C=64→32 stage);
    the subpixel form is a plain dense conv. With ``s2d`` > 1 the input
    is additionally space-to-depth packed so I/O both fill the 128-lane
    MXU (exact block-Toeplitz rearrangement, see _s2d_weight). Parameters
    are identical in every mode (checkpoint layout unchanged).
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    weight_norm: bool = False
    s2d: int = 1
    dtype: Any = jnp.float32

    def _kernel_init(self, key, shape, dtype):
        fan_in = shape[1] * shape[2]  # torch uses out_ch/groups * k for transpose
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        shape = (self.in_channels, self.out_channels, self.kernel_size)
        if self.weight_norm:
            v = self.param("weight_v", self._kernel_init, shape, jnp.float32)
            g = self.param(
                "weight_g", lambda k, s: _norm_except_dim0(v), (self.in_channels, 1, 1)
            )
            w = g * v / (_norm_except_dim0(v) + 1e-12)
        else:
            w = self.param("weight", self._kernel_init, shape, jnp.float32)
        u, K, p = self.stride, self.kernel_size, self.padding
        B, T, _ = x.shape
        if u > 1 and K - 2 * p == u:
            W2, pl, pr = _subpixel_weight(w, u, p)  # (u·O, I, M)
            S = self.s2d
            if S > 1 and pl == pr and T % S == 0:
                # pack S input frames into channels; the subpixel conv's
                # superchannel form then has S·I in / S·u·O out lanes.
                # Row-major unpack order is (s, r, o) — exactly t·u + r.
                W3, pl, pr = _s2d_weight(W2, S, 1, pl)
                x = x.reshape(B, T // S, S * self.in_channels)
            else:
                S, W3 = 1, W2
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                W3.astype(self.dtype),
                window_strides=(1,),
                padding=[(pl, pr)],
                dimension_numbers=("NWC", "OIW", "NWC"),
            )
            y = y.reshape(B, T * u, self.out_channels)
        else:
            # general geometry: input-dilated conv (exact torch semantics)
            w_conv = jnp.flip(w, axis=-1).transpose(1, 0, 2)  # (out, in, k)
            pad = K - 1 - p
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                w_conv.astype(self.dtype),
                window_strides=(1,),
                padding=[(pad, pad)],
                lhs_dilation=(u,),
                dimension_numbers=("NWC", "OIW", "NWC"),
            )
        if self.use_bias:
            fan_in = self.out_channels * self.kernel_size
            bound = 1.0 / math.sqrt(fan_in)
            b = self.param(
                "bias",
                lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
                (self.out_channels,),
            )
            y = y + b.astype(self.dtype)
        return y


class Linear(nn.Module):
    """Dense layer with torch layout: weight (out, in)."""

    in_features: int
    out_features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        bound = 1.0 / math.sqrt(self.in_features)
        w = self.param(
            "weight",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (self.out_features, self.in_features),
        )
        y = jnp.matmul(x.astype(self.dtype), w.T.astype(self.dtype))
        if self.use_bias:
            b = self.param(
                "bias",
                lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
                (self.out_features,),
            )
            y = y + b.astype(self.dtype)
        return y


class Embedding(nn.Module):
    num_embeddings: int
    features: int
    init_std: float | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        std = self.init_std if self.init_std is not None else 1.0
        w = self.param(
            "weight",
            lambda k, s: std * jax.random.normal(k, s, jnp.float32),
            (self.num_embeddings, self.features),
        )
        return jnp.take(w, ids, axis=0).astype(self.dtype)


class LayerNorm(nn.Module):
    """LayerNorm over the channel (last) axis; params named like torch
    (reference modules.LayerNorm uses gamma/beta)."""

    channels: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        g = self.param("gamma", lambda k, s: jnp.ones(s, jnp.float32), (self.channels,))
        b = self.param("beta", lambda k, s: jnp.zeros(s, jnp.float32), (self.channels,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * g + b).astype(self.dtype)


def _s2d_weight_2d(w: jax.Array, S: int, padding_w: int):
    """2-D analog of _s2d_weight for the WIDTH axis only: (O, I, kh, kw) →
    (S·O, S·I, kh, Q) for a conv whose input/output pack S width positions
    into channels ((B, H, W, C) → (B, H, W/S, S·C), a free row-major
    reshape). The height axis keeps its ordinary taps/stride/padding.
    Every kh tap shares the same width geometry, so the 1-D transform
    applies per height tap."""
    O, I, kh, kw = w.shape
    outs = [_s2d_weight(w[:, :, j, :], S, 1, padding_w) for j in range(kh)]
    W2 = jnp.stack([o[0] for o in outs], axis=2)  # (S·O, S·I, kh, Q)
    return W2, outs[0][1], outs[0][2]


class Conv2dTorch(nn.Module):
    """2-D conv with torch layout weights (O, I, Kh, Kw); input (B, H, W, C).

    ``s2d_w`` (width space-to-depth factor S > 1): input and output are
    expected in the packed (B, H, W/S, S·C) layout. Stored parameters are
    UNCHANGED; the weight is rearranged at trace time (_s2d_weight_2d) so
    small-channel spectrogram U-nets (C = 16/32/64, e.g. RMVPE DeepUnet —
    measured 1.3% MFU at C=16 on (1824, 128) maps) fill the 128-lane MXU.
    Requires width stride 1.
    """

    in_channels: int
    out_channels: int
    kernel_size: tuple[int, int]
    stride: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)
    use_bias: bool = True
    weight_norm: bool = False
    s2d_w: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        shape = (self.out_channels, self.in_channels, kh, kw)
        fan_in = self.in_channels * kh * kw
        bound = 1.0 / math.sqrt(fan_in)
        init = lambda k, s, d=jnp.float32: jax.random.uniform(k, s, d, -bound, bound)  # noqa: E731
        if self.weight_norm:
            v = self.param("weight_v", init, shape)
            norm = jnp.sqrt(jnp.sum(v * v, axis=(1, 2, 3), keepdims=True))
            g = self.param("weight_g", lambda k, s: norm, (self.out_channels, 1, 1, 1))
            w = g * v / (norm + 1e-12)
        else:
            w = self.param("weight", init, shape)
        if self.s2d_w > 1:
            assert self.stride[1] == 1, "s2d_w requires width stride 1"
            W2, pl, pr = _s2d_weight_2d(w, self.s2d_w, self.padding[1])
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                W2.astype(self.dtype),
                window_strides=(self.stride[0], 1),
                padding=[(self.padding[0], self.padding[0]), (pl, pr)],
                dimension_numbers=("NHWC", "OIHW", "NHWC"),
            )
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                w.astype(self.dtype),
                window_strides=self.stride,
                padding=[(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])],
                dimension_numbers=("NHWC", "OIHW", "NHWC"),
            )
        if self.use_bias:
            b = self.param("bias", init, (self.out_channels,))
            if self.s2d_w > 1:
                b = jnp.tile(b, self.s2d_w)
            y = y + b.astype(self.dtype)
        return y


class ConvTranspose2dTorch(nn.Module):
    """Transposed 2-D conv matching torch.nn.ConvTranspose2d.

    weight: (I, O, Kh, Kw) torch layout; input (B, H, W, C).
    """

    in_channels: int
    out_channels: int
    kernel_size: tuple[int, int]
    stride: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)
    output_padding: tuple[int, int] = (0, 0)
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        shape = (self.in_channels, self.out_channels, kh, kw)
        fan_in = self.out_channels * kh * kw
        bound = 1.0 / math.sqrt(fan_in)
        init = lambda k, s, d=jnp.float32: jax.random.uniform(k, s, d, -bound, bound)  # noqa: E731
        w = self.param("weight", init, shape)
        w_conv = jnp.flip(w, axis=(-2, -1)).transpose(1, 0, 2, 3)  # (O, I, kh, kw)
        pads = [
            (kh - 1 - self.padding[0], kh - 1 - self.padding[0] + self.output_padding[0]),
            (kw - 1 - self.padding[1], kw - 1 - self.padding[1] + self.output_padding[1]),
        ]
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w_conv.astype(self.dtype),
            window_strides=(1, 1),
            padding=pads,
            lhs_dilation=self.stride,
            dimension_numbers=("NHWC", "OIHW", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", init, (self.out_channels,))
            y = y + b.astype(self.dtype)
        return y


class GroupNorm(nn.Module):
    """torch.nn.GroupNorm semantics on channels-last input (B, *spatial, C):
    per-sample, per-group normalization over (C/G, *spatial), affine params
    named weight/bias like torch."""

    num_groups: int
    channels: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("weight", lambda k, s: jnp.ones(s, jnp.float32), (self.channels,))
        b = self.param("bias", lambda k, s: jnp.zeros(s, jnp.float32), (self.channels,))
        G = self.num_groups
        B = x.shape[0]
        spatial = x.shape[1:-1]
        C = x.shape[-1]
        xf = x.astype(jnp.float32).reshape(B, *spatial, G, C // G)
        # normalize over all spatial axes + the within-group channel axis
        axes = tuple(range(1, 1 + len(spatial))) + (x.ndim,)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y.reshape(x.shape)
        return (y * w + b).astype(self.dtype)


class TorchLayerNorm(nn.Module):
    """LayerNorm over the channel (last) axis with torch param names
    (weight/bias) — used by modules whose reference counterparts are plain
    torch.nn.LayerNorm (demucs transformer, whisper, ...)."""

    channels: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("weight", lambda k, s: jnp.ones(s, jnp.float32), (self.channels,))
        b = self.param("bias", lambda k, s: jnp.zeros(s, jnp.float32), (self.channels,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * w + b).astype(self.dtype)


class BatchNorm(nn.Module):
    """Inference-mode BatchNorm over the channel (last) axis with torch
    param names (weight/bias/running_mean/running_var). The pitch models
    that use it are inference-only pretrained networks (reference
    lib/rmvpe.py ConvBlockRes), so running stats are loaded, not updated.
    """

    channels: int
    eps: float = 1e-5
    tile: int = 1  # s2d_w packing factor of the input (params unchanged)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", lambda k, s: jnp.ones(s, jnp.float32), (self.channels,))
        b = self.param("bias", lambda k, s: jnp.zeros(s, jnp.float32), (self.channels,))
        mean = self.param("running_mean", lambda k, s: jnp.zeros(s, jnp.float32), (self.channels,))
        var = self.param("running_var", lambda k, s: jnp.ones(s, jnp.float32), (self.channels,))
        scale = (w * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)
        shift = (b - mean * w * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)
        if self.tile > 1:
            scale = jnp.tile(scale, self.tile)
            shift = jnp.tile(shift, self.tile)
        return x * scale + shift


def fold_weight_norm(params: dict) -> dict:
    """Replace every {weight_v, weight_g} pair by the folded plain weight.

    Equivalent of the reference's remove_weight_norm() pass
    (lib/infer_pack/models.py:313-317 etc.) — run once at model load, after
    which inference uses plain convs.
    """

    def fold(tree):
        if isinstance(tree, dict):
            if "weight_v" in tree and "weight_g" in tree:
                v, g = tree["weight_v"], tree["weight_g"]
                w = g * v / (_norm_except_dim0(v) + 1e-12)
                rest = {k: fold(x) for k, x in tree.items() if k not in ("weight_v", "weight_g")}
                return {"weight": w, **rest}
            return {k: fold(v) for k, v in tree.items()}
        return tree

    return fold(params)


def rand_slice_segments(
    key: jax.Array, x: jax.Array, lengths: jax.Array, segment_size: int
) -> tuple[jax.Array, jax.Array]:
    """Random fixed-size temporal crops (reference commons.rand_slice_segments).

    x: (B, T, C) -> (B, segment_size, C); returns (slices, start_indices).
    """
    B, T, C = x.shape
    max_start = jnp.maximum(lengths - segment_size + 1, 1)
    starts = (jax.random.uniform(key, (B,)) * max_start).astype(jnp.int32)

    def take(xb, s):
        return jax.lax.dynamic_slice(xb, (s, 0), (segment_size, C))

    return jax.vmap(take)(x, starts), starts


def slice_segments(x: jax.Array, starts: jax.Array, segment_size: int) -> jax.Array:
    """Gather (B, segment_size, ...) crops at given start indices."""
    if x.ndim == 2:
        def take2(xb, s):
            return jax.lax.dynamic_slice(xb, (s,), (segment_size,))
        return jax.vmap(take2)(x, starts)

    C = x.shape[-1]

    def take(xb, s):
        return jax.lax.dynamic_slice(xb, (s, 0), (segment_size, C))

    return jax.vmap(take)(x, starts)
