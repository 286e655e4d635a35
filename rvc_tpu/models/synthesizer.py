"""The RVC synthesizer: text encoder + posterior encoder + flow + NSF decoder.

One parameterized Flax module covers all four reference variants
(SynthesizerTrnMs{256,768}NSFsid[_nono], reference
lib/infer_pack/models.py:580-1021): ``feature_dim`` 256 (v1) / 768 (v2)
and ``use_f0`` select the variant. ``__call__``/``infer`` mirror the
reference forward/infer contracts; everything is (B, T, C) channels-last
and static-shape (masks carry the real lengths).
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import ModelConfig, DataConfig
from .attention import Encoder
from .flows import ResidualCouplingBlock
from .layers import (
    Conv1d,
    Embedding,
    Linear,
    leaky_relu,
    sequence_mask,
    rand_slice_segments,
    slice_segments,
)
from .nsf import Generator, GeneratorNSF
from .wavenet import WN


class TextEncoder(nn.Module):
    """HuBERT-feature encoder (reference TextEncoder256/768, models.py:14-105)."""

    in_dim: int
    out_channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    f0: bool = True
    fuse_attention: bool = False  # Pallas banded attention (TPU inference)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, phone, pitch, lengths, deterministic=True):
        x = Linear(self.in_dim, self.hidden_channels, dtype=self.dtype, name="emb_phone")(phone)
        if pitch is not None:
            x = x + Embedding(256, self.hidden_channels, dtype=self.dtype, name="emb_pitch")(pitch)
        x = x * math.sqrt(self.hidden_channels)
        x = leaky_relu(x, 0.1)
        x_mask = sequence_mask(lengths, x.shape[1]).astype(x.dtype)
        x = Encoder(
            self.hidden_channels,
            self.filter_channels,
            self.n_heads,
            self.n_layers,
            self.kernel_size,
            self.p_dropout,
            fuse=self.fuse_attention,
            dtype=self.dtype,
            name="encoder",
        )(x, x_mask, deterministic)
        stats = Conv1d(
            self.hidden_channels, self.out_channels * 2, 1, dtype=self.dtype, name="proj"
        )(x) * x_mask
        m, logs = stats[..., : self.out_channels], stats[..., self.out_channels :]
        return m, logs, x_mask


class PosteriorEncoder(nn.Module):
    """Spectrogram posterior (reference models.PosteriorEncoder, models.py:199-241)."""

    in_channels: int
    out_channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    fuse_wn: bool = False  # fused Pallas WN stack (ops/pallas_wavenet)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, x_lengths, g=None, *, rng_key=None):
        x_mask = sequence_mask(x_lengths, x.shape[1]).astype(x.dtype)
        h = Conv1d(self.in_channels, self.hidden_channels, 1, dtype=self.dtype, name="pre")(x)
        h = h * x_mask
        h = WN(
            self.hidden_channels,
            self.kernel_size,
            self.dilation_rate,
            self.n_layers,
            gin_channels=self.gin_channels,
            fuse=self.fuse_wn,
            dtype=self.dtype,
            name="enc",
        )(h, x_mask, g=g)
        stats = Conv1d(
            self.hidden_channels, self.out_channels * 2, 1, dtype=self.dtype, name="proj"
        )(h) * x_mask
        m, logs = stats[..., : self.out_channels], stats[..., self.out_channels :]
        if rng_key is None:
            rng_key = self.make_rng("noise")
        z = (m + jax.random.normal(rng_key, m.shape, m.dtype) * jnp.exp(logs)) * x_mask
        return z, m, logs, x_mask


class Synthesizer(nn.Module):
    """All four RVC synthesizer variants in one module.

    Module names (enc_p/enc_q/flow/dec/emb_g) mirror the reference
    state_dict prefixes for direct .pth import/export.
    """

    spec_channels: int
    segment_size: int
    inter_channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    resblock: str
    resblock_kernel_sizes: Sequence[int]
    resblock_dilation_sizes: Sequence[Sequence[int]]
    upsample_rates: Sequence[int]
    upsample_initial_channel: int
    upsample_kernel_sizes: Sequence[int]
    spk_embed_dim: int
    gin_channels: int
    sr: int
    feature_dim: int = 768  # 256 for v1, 768 for v2
    use_f0: bool = True
    fuse_resblocks: bool = False  # Pallas fused resblock chain (TPU inference)
    fuse_group: bool = False  # ONE kernel per decoder stage (inference-only)
    fuse_wn: bool = False  # Pallas fused WN stacks in enc_q + flows
    fuse_attention: bool = False  # Pallas banded attention in enc_p
    mesh: Any = None  # dp mesh: shard_map'd fused kernels (inference)
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, model: ModelConfig, data: DataConfig, segment_size: int,
                    dtype=jnp.float32, fuse_resblocks: bool = False,
                    fuse_wn: bool = False,
                    fuse_attention: bool = False,
                    fuse_group: bool = False) -> "Synthesizer":
        return cls(
            spec_channels=data.spec_channels,
            segment_size=segment_size // data.hop_length,
            inter_channels=model.inter_channels,
            hidden_channels=model.hidden_channels,
            filter_channels=model.filter_channels,
            n_heads=model.n_heads,
            n_layers=model.n_layers,
            kernel_size=model.kernel_size,
            p_dropout=model.p_dropout,
            resblock=model.resblock,
            resblock_kernel_sizes=tuple(model.resblock_kernel_sizes),
            resblock_dilation_sizes=tuple(map(tuple, model.resblock_dilation_sizes)),
            upsample_rates=tuple(model.upsample_rates),
            upsample_initial_channel=model.upsample_initial_channel,
            upsample_kernel_sizes=tuple(model.upsample_kernel_sizes),
            spk_embed_dim=model.spk_embed_dim,
            gin_channels=model.gin_channels,
            sr=data.sampling_rate,
            feature_dim=model.feature_dim,
            use_f0=model.use_f0,
            fuse_resblocks=fuse_resblocks,
            fuse_group=fuse_group,
            fuse_wn=fuse_wn,
            fuse_attention=fuse_attention,
            dtype=dtype,
        )

    def setup(self):
        self.enc_p = TextEncoder(
            self.feature_dim,
            self.inter_channels,
            self.hidden_channels,
            self.filter_channels,
            self.n_heads,
            self.n_layers,
            self.kernel_size,
            self.p_dropout,
            f0=self.use_f0,
            fuse_attention=self.fuse_attention,
            dtype=self.dtype,
        )
        if self.use_f0:
            self.dec = GeneratorNSF(
                self.inter_channels,
                self.resblock,
                self.resblock_kernel_sizes,
                self.resblock_dilation_sizes,
                self.upsample_rates,
                self.upsample_initial_channel,
                self.upsample_kernel_sizes,
                gin_channels=self.gin_channels,
                sr=self.sr,
                fuse_resblocks=self.fuse_resblocks,
                fuse_group=self.fuse_group,
                mesh=self.mesh,
                dtype=self.dtype,
            )
        else:
            self.dec = Generator(
                self.inter_channels,
                self.resblock,
                self.resblock_kernel_sizes,
                self.resblock_dilation_sizes,
                self.upsample_rates,
                self.upsample_initial_channel,
                self.upsample_kernel_sizes,
                gin_channels=self.gin_channels,
                fuse_resblocks=self.fuse_resblocks,
                fuse_group=self.fuse_group,
                mesh=self.mesh,
                dtype=self.dtype,
            )
        self.enc_q = PosteriorEncoder(
            self.spec_channels,
            self.inter_channels,
            self.hidden_channels,
            5,
            1,
            16,
            gin_channels=self.gin_channels,
            fuse_wn=self.fuse_wn,
            dtype=self.dtype,
        )
        self.flow = ResidualCouplingBlock(
            self.inter_channels,
            self.hidden_channels,
            5,
            1,
            3,
            gin_channels=self.gin_channels,
            fuse_wn=self.fuse_wn,
            dtype=self.dtype,
        )
        self.emb_g = Embedding(self.spk_embed_dim, self.gin_channels, dtype=self.dtype)

    def __call__(self, phone, phone_lengths, pitch, pitchf, y, y_lengths, ds,
                 deterministic=True):
        """Training forward (reference models.py:781-796).

        phone: (B, T_p, feat); pitch: (B, T_p) int coarse or None;
        pitchf: (B, T_p) Hz or None; y: (B, T_spec, spec_channels) linear
        spectrogram; ds: (B,) speaker ids.
        Returns (wave_slice, ids_slice, x_mask, y_mask,
                 (z, z_p, m_p, logs_p, m_q, logs_q)).
        """
        g = self.emb_g(ds)[:, None, :]  # (B, 1, gin)
        m_p, logs_p, x_mask = self.enc_p(phone, pitch, phone_lengths, deterministic)
        z, m_q, logs_q, y_mask = self.enc_q(y, y_lengths, g=g)
        z_p = self.flow(z, y_mask, g=g, reverse=False)
        key = self.make_rng("noise")
        z_slice, ids_slice = rand_slice_segments(key, z, y_lengths, self.segment_size)
        if self.use_f0:
            pitchf_slice = slice_segments(pitchf, ids_slice, self.segment_size)
            o = self.dec(z_slice, pitchf_slice, g=g)
        else:
            o = self.dec(z_slice, g=g)
        return o, ids_slice, x_mask, y_mask, (z, z_p, m_p, logs_p, m_q, logs_q)

    def infer_mix(self, phone, phone_lengths, pitch=None, nsff0=None,
                  spk_mix=None, noise_scale: float = 0.66666):
        """Speaker-mixture inference (reference ONNX path
        SynthesizerTrnMsNSFsidM, models_onnx.py:530-628): ``spk_mix`` is a
        (B, n_spk) weight map blended over the speaker embedding table."""
        # weighted sum over the embedding table
        weights = spk_mix / jnp.maximum(jnp.sum(spk_mix, -1, keepdims=True), 1e-9)
        table = self.emb_g(jnp.arange(self.spk_embed_dim))  # (n_spk, gin)
        g = jnp.matmul(weights.astype(table.dtype), table)[:, None, :]
        m_p, logs_p, x_mask = self.enc_p(phone, pitch, phone_lengths)
        key = self.make_rng("noise")
        eps = jax.random.normal(key, m_p.shape, m_p.dtype)
        z_p = (m_p + jnp.exp(logs_p) * eps * noise_scale) * x_mask
        z = self.flow(z_p, x_mask, g=g, reverse=True)
        if self.use_f0:
            o = self.dec(z * x_mask, nsff0, g=g)
        else:
            o = self.dec(z * x_mask, g=g)
        return o, x_mask, (z, z_p, m_p, logs_p)

    def infer(self, phone, phone_lengths, pitch=None, nsff0=None, sid=None,
              noise_scale: float = 0.66666):
        """Inference (reference models.py:798-809): sample the prior, invert
        the flow, decode."""
        g = self.emb_g(sid)[:, None, :]
        m_p, logs_p, x_mask = self.enc_p(phone, pitch, phone_lengths)
        key = self.make_rng("noise")
        eps = jax.random.normal(key, m_p.shape, m_p.dtype)
        z_p = (m_p + jnp.exp(logs_p) * eps * noise_scale) * x_mask
        z = self.flow(z_p, x_mask, g=g, reverse=True)
        if self.use_f0:
            o = self.dec(z * x_mask, nsff0, g=g)
        else:
            o = self.dec(z * x_mask, g=g)
        return o, x_mask, (z, z_p, m_p, logs_p)
