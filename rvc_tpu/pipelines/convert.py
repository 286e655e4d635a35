"""Voice conversion pipeline — the hot path, batched and device-resident.

Reference behavior (vc_infer_pipeline.py:25-196) re-architected TPU-first:
the reference loops chunks through the models one at a time, crossing
host↔device per chunk (faiss on host, .cpu() per chunk). Here:

  host:  decode → 48 Hz high-pass (exact scipy filtfilt) → silence-seek
         split points → reflect pad → chunk slicing → pad-to-bucket
  device (ONE jitted dispatch per bucket):
         HuBERT (masked) → top-k retrieval blend → 2× frame upsample →
         protect-mask blend → synthesizer (flow reverse + NSF decode)
  host:  trim pads, concatenate, RMS envelope mix, resample, int16

Chunk semantics (split-point search every x_center seconds at the local
minimum of a sliding |sum| within ±x_query, x_pad reflect padding trimmed
at target rate) follow reference vc_infer_pipeline.py:116-196 exactly, so
chunk boundaries land in the same places.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RVCConfig
from ..io.audio import MAX_INT16, remix_audio
from ..models.hubert import HubertConfig, HubertEncoder
from ..models.synthesizer import Synthesizer
from ..ops.filters import butter_highpass_host, change_rms
from ..ops.resample import resample as device_resample
from ..pitch.extractor import PitchExtractor, coarse_f0

SR = 16000
WINDOW = 160


def find_split_points(audio: np.ndarray, t_center: int, t_query: int, window: int = WINDOW) -> list[int]:
    """Silence-seek chunk boundaries (reference vc_infer_pipeline.py:127-135):
    around every t_center multiple, pick the minimum of a sliding window-sum
    of the waveform within ±t_query."""
    audio_pad = np.pad(audio, (window // 2, window // 2), mode="reflect")
    # sliding sum over `window` samples (vectorized; reference loops)
    csum = np.cumsum(np.concatenate([[0.0], audio_pad]))
    audio_sum = csum[window:] - csum[:-window]  # len == len(audio)+? -> match
    audio_sum = audio_sum[: len(audio)]
    opt_ts = []
    for t in range(t_center, len(audio), t_center):
        seg = np.abs(audio_sum[t - t_query : t + t_query])
        opt_ts.append(int(t - t_query + np.argmin(seg)))
    return opt_ts


@dataclass
class ConvertSettings:
    sid: int = 0
    f0_up_key: float = 0.0
    f0_method: str | Sequence[str] = "rmvpe"
    merge_type: str = "median"
    index_rate: float = 0.75
    filter_radius: int = 3
    resample_sr: int = 0
    rms_mix_rate: float = 0.25
    protect: float = 0.33
    crepe_hop_length: int = 160
    f0_autotune: bool = False
    f0_min: float = 50.0
    f0_max: float = 1100.0


class VoiceConverter:
    """End-to-end RVC conversion with a jit-cached batched core."""

    def __init__(
        self,
        synth_params,
        synth_kwargs: dict,
        hubert_params,
        hubert_cfg: HubertConfig | None = None,
        pitch: PitchExtractor | None = None,
        index_bank: np.ndarray | None = None,
        config: RVCConfig | None = None,
        dtype: Any = jnp.float32,
    ):
        self.config = config or RVCConfig()
        self.dtype = dtype
        self.synth = Synthesizer(**{**synth_kwargs, "dtype": dtype})
        self.synth_params = synth_params
        self.version = "v1" if synth_kwargs.get("feature_dim", 768) == 256 else "v2"
        self.use_f0 = synth_kwargs.get("use_f0", True)
        self.tgt_sr = synth_kwargs["sr"]
        self.upp = int(np.prod(synth_kwargs["upsample_rates"]))
        self.hubert = HubertEncoder(hubert_cfg or HubertConfig(), dtype=dtype)
        self.hubert_params = hubert_params
        self.pitch = pitch or PitchExtractor(dtype=dtype)
        self.index_bank = (
            jnp.asarray(index_bank, jnp.float32) if index_bank is not None else None
        )
        # chunking constants (reference pitch_extraction.py:26-31)
        c = self.config
        self.t_pad = SR * c.x_pad
        self.t_pad_tgt = self.tgt_sr * c.x_pad
        self.t_pad2 = self.t_pad * 2
        self.t_query = SR * c.x_query
        self.t_center = SR * c.x_center
        self.t_max = SR * c.x_max
        self._core_cache: dict = {}
        tgt = self.tgt_sr
        self._jit_change_rms = jax.jit(
            lambda src, dst, rate: change_rms(src, SR, dst, tgt, rate)
        )
        self._resample_cache: dict = {}

    def _jit_resample(self, out_sr: int):
        if out_sr not in self._resample_cache:
            tgt = self.tgt_sr
            self._resample_cache[out_sr] = jax.jit(
                lambda x: device_resample(x, tgt, out_sr)
            )
        return self._resample_cache[out_sr]

    # -- jitted core --------------------------------------------------------
    def _make_core(self, use_index: bool, use_f0: bool, protect_on: bool):
        synth, hubert = self.synth, self.hubert
        version = self.version

        def core(synth_params, hubert_params, bank, chunks, lengths, pitch, pitchf,
                 sid, index_rate, protect, key):
            feats = hubert.apply(
                hubert_params, chunks, version=version, lengths=lengths,
                method=hubert.extract_features,
            )
            feats0 = feats
            if use_index:
                from ..retrieval.index import _topk_blend

                bank_sq = jnp.sum(bank * bank, axis=-1)
                retrieved = _topk_blend(feats.astype(jnp.float32), bank, bank_sq, 1)
                feats = (index_rate * retrieved + (1.0 - index_rate) *
                         feats.astype(jnp.float32)).astype(feats.dtype)
            # 2x nearest upsample 50 Hz -> 100 Hz (reference :77)
            feats = jnp.repeat(feats, 2, axis=1)
            p_len_feats = feats.shape[1]
            p_len = jnp.minimum(lengths // WINDOW, p_len_feats)
            Tp = min(pitch.shape[1], p_len_feats) if use_f0 else p_len_feats
            feats = feats[:, :Tp]
            if use_f0 and protect_on:
                feats0 = jnp.repeat(feats0, 2, axis=1)[:, :Tp]
                pf = pitchf[:, :Tp]
                pitchff = jnp.where(pf > 0, 1.0, protect)[..., None]
                feats = feats * pitchff + feats0 * (1.0 - pitchff)
            if use_f0:
                o, _, _ = synth.apply(
                    synth_params, feats, p_len, pitch[:, :Tp], pitchf[:, :Tp], sid,
                    method=synth.infer, rngs={"noise": key},
                )
            else:
                o, _, _ = synth.apply(
                    synth_params, feats, p_len, None, None, sid,
                    method=synth.infer, rngs={"noise": key},
                )
            return o[..., 0]  # (N, T_out)

        return jax.jit(core)

    def _core(self, use_index: bool, use_f0: bool, protect_on: bool):
        k = (use_index, use_f0, protect_on)
        if k not in self._core_cache:
            self._core_cache[k] = self._make_core(*k)
        return self._core_cache[k]

    # -- public API ----------------------------------------------------------
    def convert(
        self,
        audio: np.ndarray,
        input_sr: int = SR,
        settings: ConvertSettings | None = None,
        bucket_samples: int = 1600,
    ) -> tuple[np.ndarray, int]:
        """audio: float mono waveform at input_sr. Returns (int16 audio, sr)."""
        s = settings or ConvertSettings()
        if input_sr != SR:
            audio, _ = remix_audio((audio, input_sr), target_sr=SR)
        audio = np.asarray(audio, np.float32)
        audio = butter_highpass_host(audio, 48.0, SR)

        # --- split points + padded buffer (reference :123-141)
        opt_ts: list[int] = []
        if len(audio) + WINDOW > self.t_max:
            opt_ts = find_split_points(audio, self.t_center, self.t_query)
        audio_pad = np.pad(audio, (self.t_pad, self.t_pad), mode="reflect")

        # --- f0 over the whole padded signal, once (reference :154-162)
        pitch_full = pitchf_full = None
        if self.use_f0:
            coarse, f0 = self.pitch.get_f0(
                jnp.asarray(audio_pad)[None],
                f0_up_key=s.f0_up_key,
                method=s.f0_method,
                merge_type=s.merge_type,
                filter_radius=s.filter_radius,
                crepe_hop_length=s.crepe_hop_length,
                f0_autotune=s.f0_autotune,
                f0_min=s.f0_min,
                f0_max=s.f0_max,
            )
            pitch_full = np.asarray(coarse[0])
            pitchf_full = np.asarray(f0[0], np.float32)

        # --- chunk spans over audio_pad (reference :167-180)
        spans = []
        start = 0
        for t in opt_ts:
            t = t // WINDOW * WINDOW
            spans.append((start, t + self.t_pad2 + WINDOW))
            start = t
        spans.append((start, len(audio_pad)))

        # --- bucket + batch
        lengths = np.array([e - b for b, e in spans], np.int64)
        L = int(np.ceil(lengths.max() / bucket_samples) * bucket_samples)
        N = len(spans)
        chunks = np.zeros((N, L), np.float32)
        for i, (b, e) in enumerate(spans):
            chunks[i, : e - b] = audio_pad[b:e]
        Fmax = L // WINDOW
        pitch_b = np.zeros((N, Fmax), np.int32)
        pitchf_b = np.zeros((N, Fmax), np.float32)
        if self.use_f0:
            for i, (b, e) in enumerate(spans):
                lo, hi = b // WINDOW, e // WINDOW
                seg_c = pitch_full[lo:hi]
                seg_f = pitchf_full[lo:hi]
                pitch_b[i, : len(seg_c)] = seg_c
                pitchf_b[i, : len(seg_f)] = seg_f

        # --- one device dispatch
        use_index = self.index_bank is not None and s.index_rate > 0
        protect_on = self.use_f0 and s.protect < 0.5
        core = self._core(use_index, self.use_f0, protect_on)
        bank = self.index_bank if use_index else jnp.zeros((1, 1), jnp.float32)
        out = core(
            self.synth_params,
            self.hubert_params,
            bank,
            jnp.asarray(chunks),
            jnp.asarray(lengths),
            jnp.asarray(pitch_b),
            jnp.asarray(pitchf_b),
            jnp.full((N,), s.sid, jnp.int32),
            jnp.float32(s.index_rate),
            jnp.float32(s.protect),
            jax.random.PRNGKey(0),
        )
        out = np.asarray(out, np.float32)  # (N, L_out)

        # --- trim + concat (reference :174,180 — strip t_pad_tgt per side)
        ratio = self.tgt_sr // 100  # samples per frame at target rate
        pieces = []
        for i, (b, e) in enumerate(spans):
            p_len = min(int(lengths[i]) // WINDOW, out.shape[1] // ratio)
            valid = out[i, : p_len * ratio]
            pieces.append(valid[self.t_pad_tgt : len(valid) - self.t_pad_tgt])
        audio_opt = np.concatenate(pieces)

        # --- RMS mix + resample + int16 (reference :183-189)
        if s.rms_mix_rate < 1:
            audio_opt = np.asarray(
                self._jit_change_rms(
                    jnp.asarray(audio)[None], jnp.asarray(audio_opt)[None],
                    jnp.float32(s.rms_mix_rate),
                )[0]
            )
        out_sr = self.tgt_sr
        if s.resample_sr >= SR and s.resample_sr != self.tgt_sr:
            audio_opt = np.asarray(
                self._jit_resample(s.resample_sr)(jnp.asarray(audio_opt)[None])[0]
            )
            out_sr = s.resample_sr
        audio_max = np.abs(audio_opt).max() / 0.99
        audio_opt = (audio_opt * MAX_INT16 / max(audio_max, 1.0)).astype(np.int16) \
            if audio_max > 1 else (audio_opt * MAX_INT16).astype(np.int16)
        return audio_opt, out_sr


def make_random_converter(
    preset: str = "40k_v2",
    seed: int = 0,
    dtype=jnp.float32,
    hubert_cfg: HubertConfig | None = None,
    with_rmvpe: bool = True,
    chunking: tuple[int, int, int, int] | None = None,
) -> VoiceConverter:
    """Build a converter with randomly initialized weights (for tests/bench
    until real checkpoints are mounted). ``chunking`` overrides
    (x_pad, x_query, x_center, x_max) — on TPU, shorter chunks batched
    together beat one giant chunk (attention memory scales with T²)."""
    import dataclasses

    from ..config import preset as get_preset

    cfg = get_preset(preset)
    if chunking is not None:
        cfg = dataclasses.replace(
            cfg, x_pad=chunking[0], x_query=chunking[1], x_center=chunking[2],
            x_max=chunking[3],
        )
    synth = Synthesizer.from_config(cfg.model, cfg.data, cfg.train.segment_size, dtype=dtype)
    kwargs = {f: getattr(synth, f) for f in (
        "spec_channels", "segment_size", "inter_channels", "hidden_channels",
        "filter_channels", "n_heads", "n_layers", "kernel_size", "p_dropout",
        "resblock", "resblock_kernel_sizes", "resblock_dilation_sizes",
        "upsample_rates", "upsample_initial_channel", "upsample_kernel_sizes",
        "spk_embed_dim", "gin_channels", "sr", "feature_dim", "use_f0",
    )}
    from ..utils.fastinit import fast_init

    key = jax.random.PRNGKey(seed)
    B, T = 1, 32
    feat = jnp.zeros((B, T, synth.feature_dim))
    lens = jnp.array([T])
    pitch = jnp.ones((B, T), jnp.int32)
    pitchf = jnp.full((B, T), 150.0)
    sid = jnp.array([0])
    synth_params = fast_init(
        functools.partial(
            synth.init, {"params": key, "noise": jax.random.PRNGKey(1)},
            method=synth.infer,
        ),
        feat, lens, pitch if synth.use_f0 else None,
        pitchf if synth.use_f0 else None, sid,
        seed=seed,
    )
    hcfg = hubert_cfg or HubertConfig()
    hub = HubertEncoder(hcfg, dtype=dtype)
    v1 = cfg.model.version == "v1"
    hubert_params = fast_init(
        functools.partial(
            hub.init, jax.random.PRNGKey(2),
            output_layer=9 if v1 else 12, final_proj=v1,
        ),
        jnp.zeros((1, 3200)),
        seed=seed + 1,
    )
    extractor = None
    if with_rmvpe:
        from ..models.rmvpe import RMVPE

        rmvpe = RMVPE(dtype=dtype)
        rmvpe_params = fast_init(
            functools.partial(rmvpe.init, jax.random.PRNGKey(3)),
            jnp.zeros((1, 16000)),
            seed=seed + 2,
        )
        extractor = PitchExtractor(rmvpe_params=rmvpe_params, dtype=dtype)
    return VoiceConverter(
        synth_params, kwargs, hubert_params, hcfg, pitch=extractor, config=cfg, dtype=dtype
    )
