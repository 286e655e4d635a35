"""BS-RoFormer vocal separation — band-split axial RoPE transformer.

Coverage BEYOND the reference: the reference's model catalog lists
``model_bs_roformer_ep_317_sdr_12.9755.ckpt`` (custom_nodes/settings/
downloader.py — mirrored in rvc_tpu/graph/downloader.py) but has **no code
path** that can run it; UVR5Node would crash trying to load it as a VR net.
Here the architecture is implemented natively so those checkpoints work.

Architecture follows the public lucidrains/BS-RoFormer layout (the layout
the UVR community checkpoints use, via ZFTurbo's Music-Source-Separation-
Training): complex STFT → per-band linear embedding (62 bands for 1025
bins) → ``depth`` blocks of [time-axis transformer, freq-axis transformer]
with rotary position embeddings and per-head output gating → per-band MLP
mask estimators → complex mask multiply → iSTFT.

TPU-first mapping:
  * STFT/iSTFT are DFT-matmul form (ops/stft.py) — MXU work, frame-major
    (B, T, F) layout (torch is (F, T)).
  * the band-split ragged frequency axis is handled as a per-band loop of
    Linear modules (62 for the 1025-bin layout); XLA fuses the small
    matmuls per trace, and the transformer stack dominates runtime. (A
    padded dense-einsum band gather is a possible future optimization.)
  * axial attention = reshape to (B·bands, T, D) / (B·T, bands, D); both
    sequence axes are short (≤ ~800), so plain softmax attention tiles
    cleanly onto the MXU; rotary tables are baked per sequence length.
  * chunk inference batches overlapped windows into one dispatch
    (overlap-add with a sqrt-hann window), no per-chunk host round trips.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..ops.stft import stft as _stft, istft as _istft
from .layers import Linear

# the 62-band layout every public BS-RoFormer checkpoint uses (1025 bins)
DEFAULT_FREQS_PER_BANDS: tuple[int, ...] = (
    (2,) * 24 + (4,) * 12 + (12,) * 8 + (24,) * 8 + (48,) * 8 + (128, 129)
)


@dataclass(frozen=True)
class BSRoformerConfig:
    dim: int = 512
    depth: int = 12
    stereo: bool = True
    num_stems: int = 1
    time_transformer_depth: int = 1
    freq_transformer_depth: int = 1
    freqs_per_bands: tuple[int, ...] = DEFAULT_FREQS_PER_BANDS
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    n_fft: int = 2048
    hop_length: int = 441
    win_length: int = 2048
    mask_estimator_depth: int = 2
    mlp_expansion_factor: int = 4
    rotary_theta: float = 10000.0
    sample_rate: int = 44100
    # upstream lucidrains builds the axial time/freq Transformers with
    # norm_output=False (the output norm is nn.Identity; only the single
    # top-level final_norm exists). Public UVR/MSST checkpoints therefore
    # have NO layers.L.{0,1}.norm.gamma keys.
    transformer_norm_output: bool = False

    @property
    def audio_channels(self) -> int:
        return 2 if self.stereo else 1

    @property
    def num_bands(self) -> int:
        return len(self.freqs_per_bands)

    @property
    def dims_in(self) -> tuple[int, ...]:
        # per-band feature width: freqs * stereo * complex(2)
        return tuple(2 * f * self.audio_channels for f in self.freqs_per_bands)


def _rotary_tables(n: int, dim_head: int, theta: float) -> tuple[np.ndarray, np.ndarray]:
    """cos/sin tables for partial rotary (rotary dim = dim_head // 2),
    duplicated interleaved like rotary-embedding-torch's ``(n r)`` repeat."""
    rot = dim_head // 2
    freqs = 1.0 / theta ** (np.arange(0, rot, 2, dtype=np.float64) / rot)
    angles = np.arange(n)[:, None] * freqs[None, :]          # (n, rot//2)
    angles = np.repeat(angles, 2, axis=-1)                   # (n, rot)
    return np.cos(angles).astype(np.float32), np.sin(angles).astype(np.float32)


def _apply_rotary(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (..., n, dim_head); rotate the first dim_head//2 dims in
    interleaved pairs (x0, x1) -> (x0 cos - x1 sin, x1 cos + x0 sin)."""
    rot = cos.shape[-1]
    xr, xp = x[..., :rot], x[..., rot:]
    x2 = xr.reshape(*xr.shape[:-1], rot // 2, 2)
    rotated = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(xr.shape)
    xr = xr * cos + rotated * sin
    return jnp.concatenate([xr, xp], axis=-1)


class RMSNorm(nn.Module):
    """lucidrains RMSNorm: l2-normalize * sqrt(dim) * gamma."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = self.param("gamma", lambda k, s: jnp.ones(s, jnp.float32), (self.dim,))
        xf = x.astype(jnp.float32)
        inv = jax.lax.rsqrt(jnp.maximum(jnp.sum(xf * xf, -1, keepdims=True), 1e-24))
        return (xf * inv * np.sqrt(self.dim) * g).astype(self.dtype)


class Attention(nn.Module):
    cfg: BSRoformerConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cos, sin):
        c = self.cfg
        h, dh = c.heads, c.dim_head
        inner = h * dh
        x = RMSNorm(c.dim, dtype=self.dtype, name="norm")(x)
        qkv = Linear(c.dim, inner * 3, use_bias=False, dtype=self.dtype,
                     name="to_qkv")(x)
        B, N = x.shape[0], x.shape[1]
        q, k, v = jnp.split(qkv.reshape(B, N, 3 * h, dh), 3, axis=2)
        q = _apply_rotary(q.transpose(0, 2, 1, 3), cos, sin)    # (B,h,N,dh)
        k = _apply_rotary(k.transpose(0, 2, 1, 3), cos, sin)
        v = v.transpose(0, 2, 1, 3)
        att = jnp.einsum("bhnd,bhmd->bhnm", q, k) / np.sqrt(dh)
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(self.dtype)
        o = jnp.einsum("bhnm,bhmd->bhnd", att, v)
        gates = Linear(c.dim, h, dtype=self.dtype, name="to_gates")(x)
        o = o * jax.nn.sigmoid(gates).transpose(0, 2, 1)[..., None]
        o = o.transpose(0, 2, 1, 3).reshape(B, N, inner)
        return Linear(inner, c.dim, use_bias=False, dtype=self.dtype,
                      name="to_out_0")(o)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult)
        x = RMSNorm(self.dim, dtype=self.dtype, name="net_0")(x)
        x = Linear(self.dim, inner, dtype=self.dtype, name="net_1")(x)
        x = jax.nn.gelu(x, approximate=False)
        return Linear(inner, self.dim, dtype=self.dtype, name="net_4")(x)


class Transformer(nn.Module):
    """A stack of [Attention, FeedForward] blocks (lucidrains Transformer;
    per-axis depth is 1 in public checkpoints). The trailing RMSNorm only
    exists when ``norm_output=True``; BS-RoFormer builds its axial
    transformers with norm_output=False, so the default is Identity."""

    cfg: BSRoformerConfig
    depth: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cos, sin):
        for d in range(self.depth):
            x = x + Attention(self.cfg, dtype=self.dtype,
                              name=f"layers_{d}_0")(x, cos, sin)
            x = x + FeedForward(self.cfg.dim, self.cfg.ff_mult, dtype=self.dtype,
                                name=f"layers_{d}_1")(x)
        if self.cfg.transformer_norm_output:
            x = RMSNorm(self.cfg.dim, dtype=self.dtype, name="norm")(x)
        return x


class BandSplit(nn.Module):
    """Per-band RMSNorm + Linear embedding (one small matmul per band;
    XLA fuses the per-trace loop — the transformer stack dominates)."""

    dims_in: tuple[int, ...]
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        # feats: (B, T, sum(dims_in)) ragged-concat band features
        outs = []
        off = 0
        for i, din in enumerate(self.dims_in):
            band = feats[..., off : off + din]
            off += din
            band = RMSNorm(din, dtype=self.dtype, name=f"to_features_{i}_0")(band)
            outs.append(Linear(din, self.dim, dtype=self.dtype,
                               name=f"to_features_{i}_1")(band))
        return jnp.stack(outs, axis=2)  # (B, T, bands, dim)


class MaskEstimator(nn.Module):
    """Per-band MLP (depth linears, tanh between) + GLU → complex mask."""

    dims_in: tuple[int, ...]
    dim: int
    hidden: int
    depth: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, T, bands, dim) -> (B, T, sum(dims_in))
        outs = []
        for i, din in enumerate(self.dims_in):
            h = x[:, :, i]
            dims = (self.dim,) + (self.hidden,) * (self.depth - 1) + (din * 2,)
            for j, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
                h = Linear(a, b, dtype=self.dtype,
                           name=f"to_freqs_{i}_0_{2 * j}")(h)
                if j < len(dims) - 2:
                    h = jnp.tanh(h)
            val, gate = jnp.split(h, 2, axis=-1)  # GLU
            outs.append(val * jax.nn.sigmoid(gate))
        return jnp.concatenate(outs, axis=-1)


class BSRoformer(nn.Module):
    """Band-split RoPE transformer masking model.

    __call__ maps a complex spectrogram batch to per-stem masked
    spectrograms; use :meth:`separate` / :func:`demix` for waveforms.
    """

    cfg: BSRoformerConfig = field(default_factory=BSRoformerConfig)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, spec_ri: jax.Array) -> jax.Array:
        """spec_ri: (B, T, F·S, 2) real/imag spectrogram features with the
        frequency axis ordered (freq, stereo-ch) like the torch layout.
        Returns (num_stems, B, T, F·S, 2) masked spectrograms."""
        c = self.cfg
        B, T, FS, _ = spec_ri.shape
        feats = spec_ri.reshape(B, T, FS * 2).astype(self.dtype)
        x = BandSplit(c.dims_in, c.dim, dtype=self.dtype,
                      name="band_split")(feats)

        tcos, tsin = _rotary_tables(T, c.dim_head, c.rotary_theta)
        fcos, fsin = _rotary_tables(c.num_bands, c.dim_head, c.rotary_theta)
        tcos, tsin = jnp.asarray(tcos), jnp.asarray(tsin)
        fcos, fsin = jnp.asarray(fcos), jnp.asarray(fsin)

        nb = c.num_bands
        for layer in range(c.depth):
            # time axis: (B, T, nb, D) -> (B*nb, T, D)
            xt = x.transpose(0, 2, 1, 3).reshape(B * nb, T, c.dim)
            xt = Transformer(c, c.time_transformer_depth, dtype=self.dtype,
                             name=f"layers_{layer}_0")(xt, tcos, tsin)
            x = xt.reshape(B, nb, T, c.dim).transpose(0, 2, 1, 3)
            # freq axis: (B*T, nb, D)
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
            masks.append(m.reshape(B, T, FS, 2))
        mask = jnp.stack(masks)  # (S, B, T, FS, 2)

        # complex multiply mask * spec
        sr, si = spec_ri[..., 0].astype(jnp.float32), spec_ri[..., 1].astype(jnp.float32)
        mr, mi = mask[..., 0].astype(jnp.float32), mask[..., 1].astype(jnp.float32)
        out_r = mr * sr[None] - mi * si[None]
        out_i = mr * si[None] + mi * sr[None]
        return jnp.stack([out_r, out_i], axis=-1)


# ---------------------------------------------------------------------------
# waveform-level inference
# ---------------------------------------------------------------------------


def _pack_spec(audio: jax.Array, cfg: BSRoformerConfig):
    """(B, S, T) -> (B, frames, F·S, 2) with torch's (freq, stereo) order."""
    B, S, T = audio.shape
    real, imag = _stft(audio.reshape(B * S, T), cfg.n_fft, cfg.hop_length,
                       cfg.win_length, center=True)
    nF = real.shape[-1]
    nT = real.shape[-2]
    ri = jnp.stack([real, imag], -1).reshape(B, S, nT, nF, 2)
    # (B, T, F, S, 2) -> flatten (F S)
    ri = ri.transpose(0, 2, 3, 1, 4).reshape(B, nT, nF * S, 2)
    return ri


def _unpack_spec(spec: jax.Array, cfg: BSRoformerConfig, length: int):
    """(..., B, T, F·S, 2) -> (..., B, S, length)."""
    *lead, B, nT, FS, _ = spec.shape
    S = cfg.audio_channels
    nF = FS // S
    ri = spec.reshape(*lead, B, nT, nF, S, 2)
    ri = jnp.moveaxis(ri, -2, -4)  # (..., B, S, T, F, 2)
    flat = ri.reshape(-1, nT, nF, 2)
    wave = _istft(flat[..., 0], flat[..., 1], cfg.n_fft, cfg.hop_length,
                  cfg.win_length, center=True, length=length)
    return wave.reshape(*lead, B, S, length)


class BSRoformerSeparator:
    """Chunked overlap-add inference wrapper (UVR-style: 8 s windows,
    50% overlap, sqrt-hann weighting — the accumulated window sum is
    divided out, so the OLA is exactly normalized), all windows in one
    batched dispatch."""

    model_cls: Any = None  # resolved to BSRoformer below (subclass hook)

    def __init__(self, params, cfg: BSRoformerConfig | None = None,
                 dtype: Any = jnp.float32, segment_seconds: float = 8.0,
                 overlap: float = 0.5, max_batch: int = 16):
        self.cfg = cfg or BSRoformerConfig()
        self.params = params
        self.model = type(self).model_cls(self.cfg, dtype=dtype)
        # align the segment to the hop so frame counts are static
        hop = self.cfg.hop_length
        seg = int(round(segment_seconds * self.cfg.sample_rate / hop)) * hop
        self.segment = seg
        self.stride = int(seg * (1 - overlap))
        self.max_batch = max_batch
        self.samplerate = self.cfg.sample_rate
        self.sources = ["vocals"] if self.cfg.num_stems == 1 else [
            "drums", "bass", "other", "vocals"][: self.cfg.num_stems]

        @jax.jit
        def _run(params, windows):  # windows: (N, S, seg)
            spec = _pack_spec(windows, self.cfg)
            out = self.model.apply(params, spec)
            return _unpack_spec(out, self.cfg, self.segment)

        self._run = _run

    def demix(self, mix: np.ndarray) -> np.ndarray:
        """mix: (S, T) float32 → (num_stems, S, T)."""
        S, T = mix.shape
        seg, stride = self.segment, self.stride
        n_win = max(1, int(np.ceil(max(T - seg, 0) / stride)) + 1)
        total = (n_win - 1) * stride + seg
        pad = total - T
        x = np.pad(mix, ((0, 0), (0, pad)))
        idx = np.arange(n_win)[:, None] * stride + np.arange(seg)[None, :]
        windows = x[:, idx].transpose(1, 0, 2)  # (N, S, seg)
        w = np.hanning(seg).astype(np.float32) ** 0.5 + 1e-4
        outs = []
        for i in range(0, n_win, self.max_batch):
            batch = jnp.asarray(windows[i : i + self.max_batch])
            outs.append(np.asarray(self._run(self.params, batch), np.float32))
        est = np.concatenate(outs, axis=1)  # (stems, N, S, seg)
        acc = np.zeros((est.shape[0], S, total), np.float32)
        norm = np.zeros(total, np.float32)
        for n in range(n_win):
            sl = slice(n * stride, n * stride + seg)
            acc[..., sl] += est[:, n] * w
            norm[sl] += w
        return (acc / norm)[..., :T]

    def run_inference(self, audio: np.ndarray, sr: int) -> dict:
        from ..pipelines.karafan import _to_stereo_44k

        mix = np.atleast_2d(np.asarray(audio, np.float32))
        mix = _to_stereo_44k(mix, sr) if (sr != self.samplerate or
                                          mix.shape[0] != 2) else mix
        if mix.shape[0] == 1:
            mix = np.vstack([mix, mix])
        stems = self.demix(mix.astype(np.float32))
        out = {"sr": self.samplerate, "input_audio": (mix, self.samplerate)}
        for name, stem in zip(self.sources, stems):
            out[name] = _stereo_int16(stem, self.samplerate)
        if "vocals" in self.sources:
            v = stems[self.sources.index("vocals")]
            inst = mix[:, : v.shape[1]] - v
            out["instrumentals"] = _stereo_int16(inst, self.samplerate)
        return out


BSRoformerSeparator.model_cls = BSRoformer


def _stereo_int16(stem: np.ndarray, sr: int):
    peak = np.abs(stem).max() / 0.95
    if peak > 1:
        stem = stem / peak
    return (np.clip(stem * 32768.0, -32767, 32767).astype(np.int16), sr)


def init_random(cfg: BSRoformerConfig | None = None, seed: int = 0,
                dtype: Any = jnp.float32):
    cfg = cfg or BSRoformerConfig()
    model = BSRoformer(cfg, dtype=dtype)
    frames = 16
    FS = (cfg.n_fft // 2 + 1) * cfg.audio_channels
    from ..utils.fastinit import fast_init

    return fast_init(
        functools.partial(model.init, jax.random.PRNGKey(seed)),
        jnp.zeros((1, frames, FS, 2)),
        seed=seed,
    )
