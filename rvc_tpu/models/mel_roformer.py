"""Mel-Band RoFormer vocal separation (Kim et al. 2023).

Coverage BEYOND the reference: like BS-RoFormer, Mel-Band RoFormer
checkpoints (e.g. the widely used ``Kim_MelBandRoformer.ckpt``,
``MelBandRoformer.ckpt`` from KimberleyJensen / ZFTurbo MSST) circulate in
the UVR community but SayanoAI/Comfy-RVC has no code path that can run
them. Follows the public lucidrains/mel-band-roformer layout.

Architectural difference from band-split: the frequency axis is carved
into **overlapping** bands from a slaney mel filterbank's support pattern
(60 bands for 1025 bins) instead of disjoint contiguous slices. Band
features are a gather by ``freq_indices``; the per-band complex masks are
scatter-ADDED back onto the spectrogram and averaged by the per-bin
overlap count.

TPU-first mapping: the gather is one ``take`` along the frequency axis
(static indices baked at trace time) and the scatter-average is one
``.at[].add`` — both XLA-native, no ragged loops; everything else (axial
RoPE transformers, DFT-matmul STFT, batched overlap-add inference) is
shared with models/bs_roformer.py.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from .bs_roformer import (
    BandSplit,
    BSRoformerSeparator,
    MaskEstimator,
    RMSNorm,
    Transformer,
    _rotary_tables,
)


def mel_band_indices(sr: int, n_fft: int, num_bands: int,
                     channels: int) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """Reproduce lucidrains' band layout: slaney mel filterbank support
    pattern with the DC bin forced into band 0 and the Nyquist bin into
    the last band; stereo interleaves channel slots (f·ch + c).

    Returns (freq_indices, band_widths): flat gather indices into the
    (freq·ch) axis, and per-band entry counts (already including ch).
    """
    from ..ops.mel import _mel_filterbank_np

    fb = _mel_filterbank_np(sr, n_fft, num_bands, 0.0, None, htk=False)
    support = np.array(fb.T > 0)  # (num_bands, bins); fb is (bins, n_mels)
    support[0, 0] = True
    support[-1, -1] = True
    if not support.any(axis=0).all():
        raise ValueError("mel filterbank leaves uncovered frequency bins")
    indices, widths = [], []
    for b in range(num_bands):
        freqs = np.nonzero(support[b])[0]
        for f in freqs:
            for c in range(channels):
                indices.append(int(f) * channels + c)
        widths.append(len(freqs) * channels)
    return tuple(indices), tuple(widths)


@dataclass(frozen=True)
class MelRoformerConfig:
    dim: int = 384
    depth: int = 6
    stereo: bool = True
    num_stems: int = 1
    time_transformer_depth: int = 1
    freq_transformer_depth: int = 1
    num_bands: int = 60
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    n_fft: int = 2048
    hop_length: int = 441
    win_length: int = 2048
    mask_estimator_depth: int = 1
    mlp_expansion_factor: int = 4
    rotary_theta: float = 10000.0
    sample_rate: int = 44100
    transformer_norm_output: bool = False
    # flat gather indices into the (freq·ch) axis + per-band entry counts;
    # default None → computed from the mel filterbank in __post_init__.
    freq_indices: tuple[int, ...] | None = None
    band_widths: tuple[int, ...] | None = None

    def __post_init__(self):
        if self.freq_indices is None or self.band_widths is None:
            idx, w = mel_band_indices(self.sample_rate, self.n_fft,
                                      self.num_bands, self.audio_channels)
            object.__setattr__(self, "freq_indices",
                               idx if self.freq_indices is None else self.freq_indices)
            object.__setattr__(self, "band_widths",
                               w if self.band_widths is None else self.band_widths)

    @property
    def audio_channels(self) -> int:
        return 2 if self.stereo else 1

    @property
    def dims_in(self) -> tuple[int, ...]:
        # per-band feature width: entries (freq·ch slots) × complex(2)
        return tuple(2 * w for w in self.band_widths)


class MelBandRoformer(nn.Module):
    """Overlapping-mel-band RoPE transformer masking model.

    Same (B, T, F·S, 2) spectrogram interface as models/bs_roformer.py's
    BSRoformer, so BSRoformerSeparator's batched overlap-add inference is
    reused unchanged.
    """

    cfg: MelRoformerConfig = field(default_factory=MelRoformerConfig)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, spec_ri: jax.Array) -> jax.Array:
        c = self.cfg
        B, T, FS, _ = spec_ri.shape
        idx = jnp.asarray(np.asarray(c.freq_indices, np.int32))
        gathered = jnp.take(spec_ri, idx, axis=2)          # (B, T, K, 2)
        K = idx.shape[0]
        feats = gathered.reshape(B, T, K * 2).astype(self.dtype)
        x = BandSplit(c.dims_in, c.dim, dtype=self.dtype,
                      name="band_split")(feats)

        tcos, tsin = _rotary_tables(T, c.dim_head, c.rotary_theta)
        fcos, fsin = _rotary_tables(c.num_bands, c.dim_head, c.rotary_theta)
        tcos, tsin = jnp.asarray(tcos), jnp.asarray(tsin)
        fcos, fsin = jnp.asarray(fcos), jnp.asarray(fsin)

        nb = c.num_bands
        for layer in range(c.depth):
            xt = x.transpose(0, 2, 1, 3).reshape(B * nb, T, c.dim)
            xt = Transformer(c, c.time_transformer_depth, dtype=self.dtype,
                             name=f"layers_{layer}_0")(xt, tcos, tsin)
            x = xt.reshape(B, nb, T, c.dim).transpose(0, 2, 1, 3)
            xf = x.reshape(B * T, nb, c.dim)
            xf = Transformer(c, c.freq_transformer_depth, dtype=self.dtype,
                             name=f"layers_{layer}_1")(xf, fcos, fsin)
            x = xf.reshape(B, T, nb, c.dim)

        x = RMSNorm(c.dim, dtype=self.dtype, name="final_norm")(x)

        masks = []
        for s in range(c.num_stems):
            m = MaskEstimator(c.dims_in, c.dim, c.dim * c.mlp_expansion_factor,
                              c.mask_estimator_depth, dtype=self.dtype,
                              name=f"mask_estimators_{s}")(x)
            masks.append(m.reshape(B, T, K, 2))
        mask_entries = jnp.stack(masks).astype(jnp.float32)  # (S, B, T, K, 2)

        # scatter-add overlapping band masks onto bins, average by count
        counts = np.bincount(np.asarray(c.freq_indices), minlength=FS)
        counts = jnp.asarray(np.maximum(counts, 1).astype(np.float32))
        summed = jnp.zeros((c.num_stems, B, T, FS, 2), jnp.float32)
        summed = summed.at[:, :, :, idx, :].add(mask_entries)
        mask = summed / counts[None, None, None, :, None]

        sr_, si = (spec_ri[..., 0].astype(jnp.float32),
                   spec_ri[..., 1].astype(jnp.float32))
        mr, mi = mask[..., 0], mask[..., 1]
        out_r = mr * sr_[None] - mi * si[None]
        out_i = mr * si[None] + mi * sr_[None]
        return jnp.stack([out_r, out_i], axis=-1)


class MelRoformerSeparator(BSRoformerSeparator):
    """Batched overlap-add inference for Mel-Band RoFormer (shares the
    window/dispatch machinery with BSRoformerSeparator)."""

    model_cls = MelBandRoformer

    def __init__(self, params, cfg: MelRoformerConfig | None = None, **kw):
        super().__init__(params, cfg or MelRoformerConfig(), **kw)


def init_random(cfg: MelRoformerConfig | None = None, seed: int = 0,
                dtype: Any = jnp.float32):
    cfg = cfg or MelRoformerConfig()
    model = MelBandRoformer(cfg, dtype=dtype)
    FS = (cfg.n_fft // 2 + 1) * cfg.audio_channels
    from ..utils.fastinit import fast_init

    return fast_init(
        functools.partial(model.init, jax.random.PRNGKey(seed)),
        jnp.zeros((1, 16, FS, 2)),
        seed=seed,
    )
