"""NSF-HiFiGAN decoder: harmonic source + upsampling resblock stack.

Reference semantics: lib/infer_pack/models.py — SineGen (:320-411),
SourceModuleHnNSF (:414-467), GeneratorNSF (:470-570), plain HiFiGAN
Generator (:244-317) and modules.ResBlock1/2 (modules.py:220-359).

TPU-first redesign of the sine source: the reference materializes a
sample-rate cumsum over the whole waveform with a wrap-correction trick
(models.py:383-401) — inherently sequential and fp-precision-limited.
Here the phase is computed in closed form: a *frame-rate* wrapped cumsum
(blocked, so partial sums stay small → fp32-exact) plus an in-frame linear
ramp. Mathematically identical (sin is 1-periodic in cycles; the per-frame
increment d and the in-frame ramp reconstruct the same piecewise-linear
phase), with *better* numerical behavior than the reference, and it is a
pure element-wise pipeline that XLA fuses.
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from .layers import Conv1d, ConvTranspose1d, Linear, leaky_relu, LRELU_SLOPE


def wrapped_cumsum(x: jax.Array, block: int = 64) -> jax.Array:
    """Exclusive cumulative sum modulo 1 along axis 1, computed blockwise so
    that no partial sum exceeds ~block (keeps fp32 resolution ~1e-5 cycles).

    x: (B, T, C) of per-step phase increments (cycles). Returns phase
    *before* each step (exclusive prefix), wrapped to [0, 1).
    """
    B, T, C = x.shape
    pad = (-T) % block
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    Tp = x.shape[1]
    nb = Tp // block
    xb = x.reshape(B, nb, block, C)
    within = jnp.cumsum(xb, axis=2) - xb  # exclusive, within block (< block)
    block_totals = jnp.sum(xb, axis=2) % 1.0  # (B, nb, C), each < 1
    block_prefix = (jnp.cumsum(block_totals, axis=1) - block_totals) % 1.0
    out = (within + block_prefix[:, :, None, :]) % 1.0
    out = out.reshape(B, Tp, C)
    return out[:, :T]


def sine_source(
    f0: jax.Array,
    upp: int,
    sampling_rate: int,
    key: jax.Array,
    harmonic_num: int = 0,
    sine_amp: float = 0.1,
    noise_std: float = 0.003,
    voiced_threshold: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """f0 (B, F) at frame rate -> (sine_waves, uv) at sample rate (B, F*upp, dim).

    dim = harmonic_num + 1. Voiced frames get sin(2π·phase)·amp + small
    noise; unvoiced get pure noise at amp/3 (reference SineGen.forward).
    """
    B, F = f0.shape
    dim = harmonic_num + 1
    mult = jnp.arange(1, dim + 1, dtype=f0.dtype)
    fh = f0[..., None] * mult  # (B, F, dim)
    rad = (fh / sampling_rate) % 1.0  # cycles per sample, per frame

    k_ini, k_noise = jax.random.split(key)
    rand_ini = jax.random.uniform(k_ini, (B, dim), dtype=f0.dtype)
    rand_ini = rand_ini.at[:, 0].set(0.0)  # fundamental keeps zero init phase

    # phase before frame k = (Σ_{m<k} rad[m]·upp) mod 1  — with integer upp,
    # ((Σ rad) mod 1)·upp mod 1 ≡ (Σ rad·upp) mod 1, so wrap early.
    d = (rad * upp) % 1.0
    frame_phase = (wrapped_cumsum(d) + rand_ini[:, None, :]) % 1.0  # (B, F, dim)

    j = jnp.arange(1, upp + 1, dtype=f0.dtype)  # in-frame sample index (1-based)
    # (B, F, upp, dim): frame start phase + ramp
    phase = frame_phase[:, :, None, :] + rad[:, :, None, :] * j[None, None, :, None]
    phase = phase.reshape(B, F * upp, dim)
    sine = jnp.sin(2.0 * math.pi * phase) * sine_amp

    uv_frame = (f0 > voiced_threshold).astype(f0.dtype)  # (B, F)
    uv = jnp.broadcast_to(uv_frame[:, :, None, None], (B, F, upp, 1)).reshape(B, F * upp, 1)

    noise_amp = uv * noise_std + (1.0 - uv) * (sine_amp / 3.0)
    noise = noise_amp * jax.random.normal(k_noise, sine.shape, dtype=sine.dtype)
    sine = sine * uv + noise
    return sine, uv


class SourceModuleHnNSF(nn.Module):
    """Merge harmonics into one excitation (reference models.py:414-467)."""

    sampling_rate: int
    harmonic_num: int = 0
    sine_amp: float = 0.1
    add_noise_std: float = 0.003
    voiced_threshold: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f0: jax.Array, upp: int, key: jax.Array) -> jax.Array:
        sine, _ = sine_source(
            f0.astype(jnp.float32),
            upp,
            self.sampling_rate,
            key,
            self.harmonic_num,
            self.sine_amp,
            self.add_noise_std,
            self.voiced_threshold,
        )
        merged = Linear(self.harmonic_num + 1, 1, dtype=self.dtype, name="l_linear")(
            sine.astype(self.dtype)
        )
        return jnp.tanh(merged)  # (B, T_samples, 1)


class ResBlock1(nn.Module):
    """3×(dilated conv + plain conv) residual stack (modules.ResBlock1).

    ``s2d`` > 1: activations arrive/leave in the packed space-to-depth
    layout (B, T/S, S·C); the convs use the exact block-Toeplitz weight
    rearrangement (layers._s2d_weight) so small-channel stages fill the
    MXU's 128 lanes. Parameters are identical either way.
    """

    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3, 5)
    s2d: int = 1
    fuse: bool = False  # single fused Pallas kernel (inference, TPU)
    mesh: Any = None  # dp mesh: shard_map the kernel (multi-chip inference)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask=None, *, return_convs: bool = False):
        convs = []
        for i, d in enumerate(self.dilation):
            convs.append((Conv1d(
                self.channels, self.channels, self.kernel_size,
                dilation=d, padding=(self.kernel_size * d - d) // 2,
                weight_norm=True, s2d=self.s2d, dtype=self.dtype,
                name=f"convs1_{i}"), d))
            convs.append((Conv1d(
                self.channels, self.channels, self.kernel_size,
                dilation=1, padding=(self.kernel_size - 1) // 2,
                weight_norm=True, s2d=self.s2d, dtype=self.dtype,
                name=f"convs2_{i}"), 1))
        if return_convs:
            # stage-group fusion (ops/pallas_resblock.fused_resblock_group):
            # hand the chain's folded weights to the caller; params are
            # created above in the same order, so the tree is identical
            return [(*conv(None, return_weights=True), self.kernel_size, d)
                    for conv, d in convs]
        if self.fuse and x_mask is None:
            # whole chain in ONE kernel: 2 HBM transfers instead of 24
            # (ops/pallas_resblock). Param tree identical to the path below.
            # The train variant carries a custom VJP (recompute-in-VMEM
            # backward kernel) so the same path serves inference AND
            # training; its primal is bit-identical to the inference kernel.
            import jax as _jax

            from ..ops.pallas_resblock import (fused_resblock1_sharded,
                                               fused_resblock1_train)

            packed = [(*conv(None, return_weights=True), self.kernel_size, d)
                      for conv, d in convs]
            # Mosaic only exists on TPU: every other backend (cpu, gpu)
            # falls back to the interpreter so a forced fuse flag stays
            # functional anywhere
            interp = _jax.default_backend() not in ("tpu", "axon")
            if self.mesh is not None:
                # dp mesh: batch rows shard, weights replicate (shard_map —
                # the kernel has no GSPMD rule). Inference-only.
                return fused_resblock1_sharded(
                    x, packed, self.mesh, S=self.s2d, interpret=interp)
            return fused_resblock1_train(
                x, packed, S=self.s2d, interpret=interp)
        for i in range(0, len(convs), 2):
            xt = leaky_relu(x, LRELU_SLOPE)
            if x_mask is not None:
                xt = xt * x_mask
            xt = convs[i][0](xt)
            xt = leaky_relu(xt, LRELU_SLOPE)
            if x_mask is not None:
                xt = xt * x_mask
            xt = convs[i + 1][0](xt)
            x = xt + x
        if x_mask is not None:
            x = x * x_mask
        return x


class ResBlock2(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3)
    s2d: int = 1
    fuse: bool = False  # accepted for API parity; fusion covers ResBlock1
    mesh: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask=None):
        for i, d in enumerate(self.dilation):
            xt = leaky_relu(x, LRELU_SLOPE)
            if x_mask is not None:
                xt = xt * x_mask
            xt = Conv1d(
                self.channels, self.channels, self.kernel_size,
                dilation=d, padding=(self.kernel_size * d - d) // 2,
                weight_norm=True, s2d=self.s2d, dtype=self.dtype,
                name=f"convs_{i}",
            )(xt)
            x = xt + x
        if x_mask is not None:
            x = x * x_mask
        return x


class GeneratorNSF(nn.Module):
    """NSF-HiFiGAN decoder (reference models.GeneratorNSF, models.py:470-570)."""

    initial_channel: int
    resblock: str
    resblock_kernel_sizes: Sequence[int]
    resblock_dilation_sizes: Sequence[Sequence[int]]
    upsample_rates: Sequence[int]
    upsample_initial_channel: int
    upsample_kernel_sizes: Sequence[int]
    gin_channels: int
    sr: int
    fuse_resblocks: bool = False  # Pallas fused chain (inference, TPU only)
    # one kernel per stage for ALL resblocks (shared input DMA, in-VMEM
    # averaging). Inference-only: no VJP — training keeps per-resblock
    # fused chains (custom VJP) or unfused convs.
    fuse_group: bool = False
    mesh: Any = None  # dp mesh for sharded fused kernels
    dtype: Any = jnp.float32

    @property
    def upp(self) -> int:
        return int(np.prod(self.upsample_rates))

    @nn.compact
    def __call__(self, x, f0, g=None, *, rng_key=None):
        """x: (B, T, C_in) latent; f0: (B, T) Hz at frame rate; g: (B, 1, gin)."""
        if rng_key is None:
            rng_key = self.make_rng("noise")
        har = SourceModuleHnNSF(
            sampling_rate=self.sr, harmonic_num=0, dtype=self.dtype, name="m_source"
        )(f0, self.upp, rng_key)  # (B, T*upp, 1)

        x = Conv1d(
            self.initial_channel, self.upsample_initial_channel, 7, padding=3,
            dtype=self.dtype, name="conv_pre",
        )(x)
        if g is not None:
            x = x + Conv1d(
                self.gin_channels, self.upsample_initial_channel, 1,
                dtype=self.dtype, name="cond",
            )(g)

        rb_cls = ResBlock1 if self.resblock == "1" else ResBlock2
        n_rates = len(self.upsample_rates)
        num_kernels = len(self.resblock_kernel_sizes)
        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            c_in = self.upsample_initial_channel // (2**i)
            c_cur = self.upsample_initial_channel // (2 ** (i + 1))
            x = leaky_relu(x, LRELU_SLOPE)
            # small-channel upsample stages s2d-pack their input so the
            # subpixel conv fills the MXU lanes (layers.ConvTranspose1d)
            S_up = 128 // c_in if (128 % c_in == 0 and c_in < 128) else 1
            if S_up > 1 and x.shape[1] % S_up:
                S_up = 1
            x = ConvTranspose1d(
                c_in, c_cur, k, stride=u,
                padding=(k - u) // 2, weight_norm=True, s2d=S_up,
                dtype=self.dtype, name=f"ups_{i}",
            )(x)
            if i + 1 < n_rates:
                stride_f0 = int(np.prod(self.upsample_rates[i + 1 :]))
                # pack_stride only when the packed contraction is wide:
                # sf=40 measured 3.25→2.38 ms packed, but sf=4/2 pack to
                # 4/2 superchannels and relayout pathologically (17/25 ms)
                x_source = Conv1d(
                    1, c_cur, kernel_size=stride_f0 * 2, stride=stride_f0,
                    padding=stride_f0 // 2, dtype=self.dtype,
                    pack_stride=stride_f0 >= 32, name=f"noise_convs_{i}",
                )(har)
            else:
                x_source = Conv1d(1, c_cur, 1, dtype=self.dtype, name=f"noise_convs_{i}")(har)
            # stride_f0//2 padding can overshoot by one frame; crop to match.
            x = x + x_source[:, : x.shape[1]]
            # space-to-depth the small-channel stages: (B, T, C) →
            # (B, T/S, S·C) is a free row-major reshape; the resblock convs
            # then run as full-width 128-lane MXU tiles instead of C-lane
            # slivers. Exact — see layers._s2d_weight.
            # Measured (v5e): s2d wins for every C < 128 — even the k=11,d=5
            # C=64 case with 4.9× tap inflation (2.74→2.41 ms/op) because the
            # plain small-channel conv is bandwidth/overhead-bound (4-13 TF/s)
            # while the 128-lane form streams at 20-73 TF/s.
            S = 128 // c_cur if (128 % c_cur == 0 and c_cur < 128) else 1
            if S > 1 and x.shape[1] % S:
                S = 1
            B_, T_ = x.shape[0], x.shape[1]
            if S > 1:
                x = x.reshape(B_, T_ // S, S * c_cur)
            mods = [rb_cls(c_cur, rk, tuple(rd), s2d=S,
                           fuse=self.fuse_resblocks and rb_cls is ResBlock1,
                           mesh=self.mesh, dtype=self.dtype,
                           name=f"resblocks_{i * num_kernels + j}")
                    for j, (rk, rd) in enumerate(
                        zip(self.resblock_kernel_sizes,
                            self.resblock_dilation_sizes))]
            if self.fuse_group and rb_cls is ResBlock1:
                import jax as _jax

                from ..ops.pallas_resblock import (
                    fused_resblock_group, fused_resblock_group_sharded)

                chains = [m_(None, return_convs=True) for m_ in mods]
                interp = _jax.default_backend() not in ("tpu", "axon")
                if self.mesh is not None:
                    x = fused_resblock_group_sharded(
                        x, chains, self.mesh, S=S, interpret=interp)
                else:
                    x = fused_resblock_group(x, chains, S=S,
                                             interpret=interp)
            else:
                xs = None
                for m_ in mods:
                    r = m_(x)
                    xs = r if xs is None else xs + r
                x = xs / num_kernels
            if S > 1 and i + 1 < n_rates:
                x = x.reshape(B_, T_, c_cur)
        # last stage stays packed: the 1-output-channel conv_post lowers
        # terribly unpacked (measured 9.5 ms for C=32→1 k=7 at 3.5 M
        # samples); as an s2d superchannel conv it is a dense matmul.
        x = leaky_relu(x, 0.01)  # final activation uses torch's default slope
        x = Conv1d(c_cur, 1, 7, padding=3, use_bias=False, s2d=S,
                   dtype=self.dtype, name="conv_post")(x)
        if S > 1:
            x = x.reshape(B_, T_, 1)
        return jnp.tanh(x)  # (B, T*upp, 1)


class Generator(nn.Module):
    """Plain HiFiGAN decoder for the no-f0 variants (models.py:244-317)."""

    initial_channel: int
    resblock: str
    resblock_kernel_sizes: Sequence[int]
    resblock_dilation_sizes: Sequence[Sequence[int]]
    upsample_rates: Sequence[int]
    upsample_initial_channel: int
    upsample_kernel_sizes: Sequence[int]
    gin_channels: int = 0
    fuse_resblocks: bool = False
    fuse_group: bool = False  # one kernel per stage (inference-only)
    mesh: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, g=None):
        x = Conv1d(
            self.initial_channel, self.upsample_initial_channel, 7, padding=3,
            dtype=self.dtype, name="conv_pre",
        )(x)
        if g is not None:
            x = x + Conv1d(
                self.gin_channels, self.upsample_initial_channel, 1,
                dtype=self.dtype, name="cond",
            )(g)
        rb_cls = ResBlock1 if self.resblock == "1" else ResBlock2
        num_kernels = len(self.resblock_kernel_sizes)
        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            c_in = self.upsample_initial_channel // (2**i)
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = leaky_relu(x, LRELU_SLOPE)
            S_up = 128 // c_in if (128 % c_in == 0 and c_in < 128) else 1
            if S_up > 1 and x.shape[1] % S_up:
                S_up = 1
            x = ConvTranspose1d(
                c_in, ch, k, stride=u,
                padding=(k - u) // 2, weight_norm=True, s2d=S_up,
                dtype=self.dtype, name=f"ups_{i}",
            )(x)
            S = 128 // ch if (128 % ch == 0 and ch < 128) else 1
            if S > 1 and x.shape[1] % S:
                S = 1
            B_, T_ = x.shape[0], x.shape[1]
            if S > 1:
                x = x.reshape(B_, T_ // S, S * ch)
            mods = [rb_cls(ch, rk, tuple(rd), s2d=S,
                           fuse=self.fuse_resblocks and rb_cls is ResBlock1,
                           mesh=self.mesh, dtype=self.dtype,
                           name=f"resblocks_{i * num_kernels + j}")
                    for j, (rk, rd) in enumerate(
                        zip(self.resblock_kernel_sizes,
                            self.resblock_dilation_sizes))]
            if self.fuse_group and rb_cls is ResBlock1:
                import jax as _jax

                from ..ops.pallas_resblock import (
                    fused_resblock_group, fused_resblock_group_sharded)

                chains = [m_(None, return_convs=True) for m_ in mods]
                interp = _jax.default_backend() not in ("tpu", "axon")
                if self.mesh is not None:
                    x = fused_resblock_group_sharded(
                        x, chains, self.mesh, S=S, interpret=interp)
                else:
                    x = fused_resblock_group(x, chains, S=S,
                                             interpret=interp)
            else:
                xs = None
                for m_ in mods:
                    r = m_(x)
                    xs = r if xs is None else xs + r
                x = xs / num_kernels
            if S > 1 and i + 1 < len(self.upsample_rates):
                x = x.reshape(B_, T_, ch)
        x = leaky_relu(x, 0.01)
        x = Conv1d(ch, 1, 7, padding=3, use_bias=False, s2d=S,
                   dtype=self.dtype, name="conv_post")(x)
        if S > 1:
            x = x.reshape(B_, T_, 1)
        return jnp.tanh(x)
