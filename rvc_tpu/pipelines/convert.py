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
from ..pitch.extractor import PitchExtractor, autotune, coarse_f0, shift_semitones

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
        mesh=None,
        index_int8: bool = False,
    ):
        """``mesh``: optional jax.sharding.Mesh with a 'dp' axis — the chunk
        batch shards across chips (one song's chunks, or many songs' chunks,
        converted in parallel over ICI). Params replicate; XLA partitions
        the fused core."""
        self.config = config or RVCConfig()
        self.dtype = dtype
        # fused Pallas resblock chain on TPU (Mosaic-only kernel; CPU/GPU
        # keep the plain convs). Under a dp mesh the kernel runs via a
        # shard_map wrapper (batch rows shard, weights replicate —
        # ops/pallas_resblock.fused_resblock1_sharded).
        fuse = synth_kwargs.get(
            "fuse_resblocks",
            all(d.platform in ("tpu", "axon") for d in jax.devices()))
        self._fuse = fuse
        # fuse_wn defaults OFF at inference: measured neutral on the train
        # step (launch savings ≈ the pad/halo compute waste at these
        # shapes) and neutral at conversion shapes (r4 A/B: 212.6 vs
        # 214.0 ms on the 8x12s synth dispatch) — opt in explicitly
        self.synth = Synthesizer(
            **{**synth_kwargs, "dtype": dtype, "fuse_resblocks": fuse,
               # stage-group decoder kernel (inference-only: conversion
               # never differentiates the decoder)
               "fuse_group": synth_kwargs.get("fuse_group", fuse),
               "fuse_wn": synth_kwargs.get("fuse_wn", False),
               # banded-attention kernel: single-chip only (no partition
               # rules yet); numerically identical to the XLA path
               "fuse_attention": synth_kwargs.get(
                   "fuse_attention", fuse and mesh is None),
               "mesh": mesh if fuse else None})
        self._mesh = mesh
        self.synth_params = synth_params
        self.version = "v1" if synth_kwargs.get("feature_dim", 768) == 256 else "v2"
        self.use_f0 = synth_kwargs.get("use_f0", True)
        self.tgt_sr = synth_kwargs["sr"]
        self.upp = int(np.prod(synth_kwargs["upsample_rates"]))
        self.hubert = HubertEncoder(hubert_cfg or HubertConfig(), dtype=dtype)
        self.hubert_params = hubert_params
        self.pitch = pitch or PitchExtractor(dtype=dtype)
        if index_bank is None:
            self.index_bank = None
        elif index_int8:
            # per-row int8 bank: 4× less HBM stream per retrieval dispatch
            # (ops/pallas_retrieval.quantize_bank); the core dequantizes
            # tile-by-tile in VMEM.
            from ..ops.pallas_retrieval import quantize_bank

            self.index_bank = quantize_bank(index_bank)
        else:
            self.index_bank = jnp.asarray(index_bank, jnp.float32)
        # chunking constants (reference pitch_extraction.py:26-31)
        c = self.config
        self.t_pad = SR * c.x_pad
        self.t_pad_tgt = self.tgt_sr * c.x_pad
        self.t_pad2 = self.t_pad * 2
        self.t_query = SR * c.x_query
        self.t_center = SR * c.x_center
        self.t_max = SR * c.x_max
        self._core_cache: dict = {}
        # constant noise key, created once (a per-call PRNGKey costs a
        # host→device transfer — ~30 ms over the remote-chip tunnel)
        self._noise_key = jax.random.PRNGKey(0)
        tgt = self.tgt_sr
        self._jit_change_rms = jax.jit(
            lambda src, dst, rate: change_rms(src, SR, dst, tgt, rate)
        )
        self._resample_cache: dict = {}

    @property
    def mesh(self):
        return self._mesh

    @mesh.setter
    def mesh(self, m):
        """Post-hoc mesh assignment (tests/dryruns do `vc.mesh = make_mesh(…)`)
        must rebuild the synthesizer (the fused kernels shard via a captured
        mesh) and drop jitted cores built for the old sharding."""
        import dataclasses as _dc

        self._mesh = m
        self.synth = _dc.replace(self.synth, mesh=m if self._fuse else None)
        self._core_cache.clear()

    def _jit_resample(self, out_sr: int):
        if out_sr not in self._resample_cache:
            tgt = self.tgt_sr
            self._resample_cache[out_sr] = jax.jit(
                lambda x: device_resample(x, tgt, out_sr)
            )
        return self._resample_cache[out_sr]

    # -- jitted cores ---------------------------------------------------------
    def _make_core2(self, use_index: bool, use_f0: bool, protect_on: bool,
                    rms_mix: bool, chunk_len: int,
                    f0_spec: tuple | None = None, concat_out: bool = True):
        """Fully fused device pipeline: (optionally) the whole f0 chain,
        then slice chunks out of the uploaded padded waveform, convert,
        per-chunk RMS mix, device-side pad-trim + ragged concat, global
        int16 normalize. ONE dispatch, one (int16-quantized) upload and one
        int16 download of only the valid samples per song — on a
        bandwidth-limited link this is the difference between ~30× and
        >60× real time on short clips.

        f0_spec: None → coarse/f0 arrays are passed in precomputed (hybrid
        multi-method merging); else (method, autotune, filter_radius,
        crepe_hop, f0_min, f0_max) and the pitch model runs inside this
        kernel (fuses away a dispatch round trip).
        concat_out: trim t_pad_tgt per chunk and scatter into one flat
        waveform on device (reference vc_infer_pipeline.py:174,180-182
        semantics); disabled on a dp mesh where the chunk-grid output is
        kept per-shard.
        """
        core1 = self._make_core_fn(use_index, use_f0, protect_on)
        L = chunk_len
        F = L // WINDOW
        ratio = self.tgt_sr // 100
        t_pad_tgt = self.t_pad_tgt
        if f0_spec is not None:
            method, autotune_on, filter_radius, crepe_hop, f0_min, f0_max = f0_spec
            f0_fn = self.pitch._build_method_fn(
                method, f0_min, f0_max, filter_radius, crepe_hop)

        def core2(synth_params, hubert_params, pitch_params, bank, audio_q,
                  ints, scalars, pitch_full, pitchf_full, key, *, n_chunks=0):
            # ints: (3, N) int32 [starts; lengths; sid]
            # scalars: (5,) f32 [index_rate, protect, rms_rate, up_key, inv_scale]
            if n_chunks:
                # single-upload layout: every host→device RPC over the
                # remote-chip tunnel costs ~30 ms of latency, so the int16
                # waveform, the (3, N) int32 chunk table, and the (5,) f32
                # scalars travel as ONE int16 buffer; the small args are
                # int16 bit-pairs reassembled here with two bitcasts.
                tail = 6 * n_chunks + 10
                ints = jax.lax.bitcast_convert_type(
                    audio_q[-tail:-10].reshape(3, n_chunks, 2), jnp.int32)
                scalars = jax.lax.bitcast_convert_type(
                    audio_q[-10:].reshape(5, 2), jnp.float32)
                audio_q = audio_q[:-tail]
            starts, lengths, sid = ints[0], ints[1], ints[2]
            index_rate, protect, rms_rate = scalars[0], scalars[1], scalars[2]
            audio_pad = audio_q.astype(jnp.float32) * scalars[4]
            chunks = jax.vmap(
                lambda st: jax.lax.dynamic_slice(audio_pad, (st,), (L,))
            )(starts)
            if use_f0 and f0_spec is not None:
                # f0 PER CHUNK (the chunk batch is the f0 batch): RMVPE's
                # BiGRU is sequential over frames, so full-track f0 costs
                # n_chunks× more wall than the batched per-chunk form (the
                # r3 flat-buffer design also let one song's audio leak into
                # another's GRU context in multi-song batches). Deviation
                # from the reference's full-track get_f0
                # (vc_infer_pipeline.py:127) is confined to seam frames
                # whose synthesis context sits inside the trimmed t_pad
                # reflect pads.
                f0 = f0_fn(pitch_params, chunks)[:, :F]
                if autotune_on:
                    f0 = autotune(f0)
                f0 = shift_semitones(f0, scalars[3])
                pitch = coarse_f0(f0, f0_min, f0_max)
                pitchf = f0.astype(jnp.float32)
            elif use_f0:
                fstarts = starts // WINDOW
                pitch = jax.vmap(
                    lambda st: jax.lax.dynamic_slice(pitch_full, (st,), (F,))
                )(fstarts)
                pitchf = jax.vmap(
                    lambda st: jax.lax.dynamic_slice(pitchf_full, (st,), (F,))
                )(fstarts)
            else:
                pitch = pitchf = jnp.zeros((chunks.shape[0], F))
            o = core1(synth_params, hubert_params, bank, chunks, lengths,
                      pitch.astype(jnp.int32) if use_f0 else None,
                      pitchf if use_f0 else None, sid, index_rate, protect, key)
            # per-chunk loudness envelope mix (reference change_rms on the
            # concatenated signal; per-chunk is identical away from the
            # trimmed pad boundaries)
            if rms_mix:
                o = change_rms(chunks, SR, o.astype(jnp.float32), self.tgt_sr, rms_rate)
            o = o.astype(jnp.float32)
            if concat_out:
                # device-side pad trim + ragged concat: output index j maps
                # to (chunk, offset) via a searchsorted over the cumulative
                # valid lengths — ONE gather (TPU gathers parallelize;
                # the scatter formulation of the same concat measured ~25%
                # slower end-to-end), minimal download bytes
                N = o.shape[0]
                p_len = jnp.minimum(lengths // WINDOW, o.shape[1] // ratio)
                valid_len = p_len * ratio - 2 * t_pad_tgt
                Lv = o.shape[1] - 2 * t_pad_tgt
                size = N * Lv
                cum = jnp.cumsum(valid_len).astype(jnp.int32)
                offs = jnp.concatenate(
                    [jnp.zeros((1,), jnp.int32), cum[:-1]])
                j = jnp.arange(size, dtype=jnp.int32)
                cid = jnp.minimum(
                    jnp.searchsorted(cum, j, side="right"), N - 1
                ).astype(jnp.int32)
                off = j - offs[cid] + t_pad_tgt
                flat = o[cid, jnp.minimum(off, o.shape[1] - 1)]
                total = cum[-1]
                mask = j < total
                flat = jnp.where(mask, flat, 0.0)
                audio_max = jnp.max(jnp.abs(flat)) / 0.99
                flat = flat * (MAX_INT16 / jnp.maximum(audio_max, 1e-9))
                return jnp.clip(flat, 1 - MAX_INT16, MAX_INT16 - 1).astype(jnp.int16)
            # chunk-grid output (dp-mesh path): normalize over valid samples
            t_idx = jnp.arange(o.shape[1])[None, :]
            valid_hi = (lengths // WINDOW) * ratio - t_pad_tgt
            mask = (t_idx >= t_pad_tgt) & (t_idx < valid_hi[:, None])
            audio_max = jnp.max(jnp.abs(jnp.where(mask, o, 0.0))) / 0.99
            o = o * (MAX_INT16 / jnp.maximum(audio_max, 1e-9))
            return jnp.clip(o, 1 - MAX_INT16, MAX_INT16 - 1).astype(jnp.int16)

        return jax.jit(core2, static_argnames=("n_chunks",))

    def _make_core_fn(self, use_index: bool, use_f0: bool, protect_on: bool):
        synth, hubert = self.synth, self.hubert
        version = self.version
        mesh = self.mesh

        def core(synth_params, hubert_params, bank, chunks, lengths, pitch, pitchf,
                 sid, index_rate, protect, key):
            feats = hubert.apply(
                hubert_params, chunks, version=version, lengths=lengths,
                method=hubert.extract_features,
            )
            feats0 = feats
            if use_index:
                is_q = isinstance(bank, tuple)  # (int8 values, row scales)
                if jax.default_backend() != "cpu":
                    # streaming Pallas kernel: O(T·D) memory, bank stays tiled
                    from ..ops import pallas_retrieval as _pr

                    if is_q and mesh is not None:
                        # dp mesh: shard the query batch, replicate the bank
                        # (shard_map — the kernel has no GSPMD rule)
                        feats = _pr.blend_into_q_sharded(
                            feats, bank[0], bank[1],
                            jnp.float32(index_rate), mesh).astype(feats.dtype)
                    elif is_q:
                        feats = _pr.blend_into_q(
                            feats, bank[0], bank[1], index_rate).astype(feats.dtype)
                    else:
                        feats = _pr.blend_into(feats, bank, index_rate).astype(feats.dtype)
                else:
                    from ..retrieval.index import _topk_blend

                    bank_f = (bank[0].astype(jnp.float32) * bank[1]) if is_q else bank
                    bank_sq = jnp.sum(bank_f * bank_f, axis=-1)
                    retrieved = _topk_blend(feats.astype(jnp.float32), bank_f, bank_sq, 1)
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

        return core

    def _make_core(self, use_index: bool, use_f0: bool, protect_on: bool):
        """Jitted chunk-batch converter (used by the graft entry / tests)."""
        return jax.jit(self._make_core_fn(use_index, use_f0, protect_on))

    def _core2(self, use_index: bool, use_f0: bool, protect_on: bool,
               rms_mix: bool, chunk_len: int, f0_spec: tuple | None = None,
               concat_out: bool = True):
        k = (use_index, use_f0, protect_on, rms_mix, chunk_len, f0_spec,
             concat_out)
        if k not in self._core_cache:
            self._core_cache[k] = self._make_core2(
                use_index, use_f0, protect_on, rms_mix, chunk_len,
                f0_spec=f0_spec, concat_out=concat_out)
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

        # single device upload: the padded waveform, length-bucketed with a
        # reflect tail so f0/chunk shapes stay stable across songs. The
        # upload is int16-quantized (peak-scaled, dequantized on device):
        # −96 dB quantization noise, half the bytes over the host↔chip link.
        P = len(audio_pad)
        Pb = int(np.ceil((P + 1) / 16000) * 16000)
        tail = Pb - P
        audio_pad_b = np.pad(audio_pad, (0, tail),
                             mode="reflect" if tail < P else "constant")
        # one-pass native peak scan + quantize (numpy fallback inside)
        from ..native import peak_quantize_i16

        q16, peak = peak_quantize_i16(audio_pad_b)
        inv_scale = max(peak, 1e-9) / 32766.0
        # the single-chip fast path never uploads the bare waveform — it
        # travels inside the packed buffer (below); the mesh / hybrid-f0
        # paths need it as its own device array
        audio_dev = None
        if self.mesh is not None or (self.use_f0 and not isinstance(s.f0_method, str)):
            audio_dev = jnp.asarray(q16)

        # --- f0: single-method (the default) runs INSIDE the fused core —
        # one dispatch for the whole song. Hybrid multi-method merging
        # (reference get_f0_hybrid) precomputes on device here.
        fused_f0 = self.use_f0 and isinstance(s.f0_method, str)
        f0_spec = None
        pitch_dev = pitchf_dev = None
        pitch_params = None
        if fused_f0:
            f0_spec = (s.f0_method, bool(s.f0_autotune), int(s.filter_radius),
                       int(s.crepe_hop_length), float(s.f0_min), float(s.f0_max))
            pitch_params = self.pitch._method_params(s.f0_method)
        elif self.use_f0:
            coarse, f0 = self.pitch.get_f0(
                (audio_dev.astype(jnp.float32) * inv_scale)[None],
                f0_up_key=s.f0_up_key,
                method=s.f0_method,
                merge_type=s.merge_type,
                filter_radius=s.filter_radius,
                crepe_hop_length=s.crepe_hop_length,
                f0_autotune=s.f0_autotune,
                f0_min=s.f0_min,
                f0_max=s.f0_max,
            )
            pitch_dev, pitchf_dev = coarse[0], f0[0].astype(jnp.float32)

        # --- chunk spans over audio_pad (reference :167-180)
        spans = []
        start = 0
        for t in opt_ts:
            t = t // WINDOW * WINDOW
            spans.append((start, t + self.t_pad2 + WINDOW))
            start = t
        spans.append((start, P))

        lengths = np.array([e - b for b, e in spans], np.int32)
        L = int(np.ceil(lengths.max() / bucket_samples) * bucket_samples)
        N_real = len(spans)
        starts = np.array([b for b, _ in spans], np.int32)
        # dp sharding: pad the chunk batch to a multiple of the mesh size
        # (duplicate chunks — their outputs are simply dropped)
        n_dp = self.mesh.shape["dp"] if self.mesh is not None else 1
        if N_real % n_dp:
            pad_n = n_dp - N_real % n_dp
            starts = np.concatenate([starts, np.repeat(starts[-1:], pad_n)])
            lengths = np.concatenate([lengths, np.repeat(lengths[-1:], pad_n)])
        N = len(starts)

        # --- one fused device dispatch → int16 waveform
        use_index = self.index_bank is not None and s.index_rate > 0
        protect_on = self.use_f0 and s.protect < 0.5
        rms_mix = s.rms_mix_rate < 1
        concat_out = self.mesh is None and not getattr(self, "_grid_out", False)
        core = self._core2(use_index, self.use_f0, protect_on, rms_mix, L,
                           f0_spec=f0_spec, concat_out=concat_out)
        bank = self.index_bank if use_index else jnp.zeros((1, 1), jnp.float32)
        ints_np = np.stack([
            starts, lengths, np.full((N,), s.sid, np.int32)]).astype(np.int32)
        scalars_np = np.array(
            [s.index_rate, s.protect, s.rms_mix_rate, s.f0_up_key, inv_scale],
            np.float32)
        if self.mesh is None:
            # single chip: ONE upload — the chunk table and scalars ride as
            # int16 bit-pairs appended to the quantized waveform (each extra
            # host→device RPC costs ~30 ms of tunnel latency; see core2)
            packed = np.concatenate(
                [q16, ints_np.view(np.int16).ravel(), scalars_np.view(np.int16)])
            out16 = core(
                self.synth_params, self.hubert_params, pitch_params, bank,
                jnp.asarray(packed), None, None, pitch_dev, pitchf_dev,
                self._noise_key, n_chunks=N,
            )
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            ints = jax.device_put(
                jnp.asarray(ints_np), NamedSharding(self.mesh, P(None, "dp")))
            out16 = core(
                self.synth_params,
                self.hubert_params,
                pitch_params,
                bank,
                audio_dev,
                ints,
                jnp.asarray(scalars_np),
                pitch_dev,
                pitchf_dev,
                self._noise_key,
            )
        ratio = self.tgt_sr // 100

        if concat_out:
            # the device already trimmed t_pad_tgt per chunk and packed the
            # valid samples contiguously at the front of the flat buffer
            F = L // WINDOW
            p_lens = np.minimum(lengths[:N_real] // WINDOW, F)
            total = int(np.sum(p_lens * ratio - 2 * self.t_pad_tgt))
            audio_opt = np.asarray(out16)[:total]
        else:
            out16 = np.asarray(out16)[:N_real]  # (N, L_out) int16
            lengths = lengths[:N_real]

            # --- trim + concat (reference :174,180 — strip t_pad_tgt/side)
            pieces = []
            for i in range(N_real):
                p_len = min(int(lengths[i]) // WINDOW, out16.shape[1] // ratio)
                valid = out16[i, : p_len * ratio]
                pieces.append(valid[self.t_pad_tgt : len(valid) - self.t_pad_tgt])
            audio_opt = np.concatenate(pieces)

        out_sr = self.tgt_sr
        if s.resample_sr >= SR and s.resample_sr != self.tgt_sr:
            # rare path: resample the int16 result (reference resamples before
            # the int16 conversion; linear-phase polyphase commutes with the
            # scalar normalization up to clipping at the very peak)
            res = self._jit_resample(s.resample_sr)(
                jnp.asarray(audio_opt, jnp.float32)[None])[0]
            audio_opt = np.clip(np.asarray(res), 1 - MAX_INT16,
                                MAX_INT16 - 1).astype(np.int16)
            out_sr = s.resample_sr
        return audio_opt, out_sr

    def convert_batch(
        self,
        audios: Sequence[np.ndarray],
        input_sr: int = SR,
        settings: ConvertSettings | None = None,
        bucket_samples: int = 1600,
        stats: dict | None = None,
        return_async: bool = False,
    ) -> list[tuple[np.ndarray, int]]:
        """N songs in ONE fused dispatch — the multi-chip throughput mode.

        Every song's padded waveform is packed into a single flat device
        buffer and every song's chunks into a single chunk batch; on a dp
        ``mesh`` the batch shards across chips so each chip converts its
        share of the grid over ICI (reference vc_infer_pipeline.py:116-196
        converts one chunk at a time on one GPU — there is no batch mode
        to match; this axis exceeds it). Settings are shared across songs;
        the int16 peak normalization is global over the batch (per-song
        renormalization is a host-side rescale if loudness matching with
        single-song `convert` is needed). Requires a single (str) f0
        method so the f0 chain stays inside the fused core.

        Returns ``[(int16 audio, sr), ...]`` in input order.
        """
        s = settings or ConvertSettings()
        if self.use_f0 and not isinstance(s.f0_method, str):
            raise ValueError(
                "convert_batch requires a single f0 method (hybrid "
                "multi-method merging is per-song: use convert())")
        buffers: list[np.ndarray] = []
        starts_l: list[int] = []
        lengths_l: list[int] = []
        owner_l: list[int] = []
        offset = 0
        for si, audio in enumerate(audios):
            if input_sr != SR:
                audio, _ = remix_audio((audio, input_sr), target_sr=SR)
            audio = butter_highpass_host(
                np.asarray(audio, np.float32), 48.0, SR)
            opt_ts: list[int] = []
            if len(audio) + WINDOW > self.t_max:
                opt_ts = find_split_points(audio, self.t_center, self.t_query)
            audio_pad = np.pad(audio, (self.t_pad, self.t_pad), mode="reflect")
            P = len(audio_pad)
            Pb = int(np.ceil((P + 1) / 16000) * 16000)
            tail = Pb - P
            buffers.append(np.pad(
                audio_pad, (0, tail),
                mode="reflect" if tail < P else "constant"))
            start = 0
            for t in opt_ts:
                t = t // WINDOW * WINDOW
                starts_l.append(offset + start)
                lengths_l.append(t + self.t_pad2 + WINDOW - start)
                owner_l.append(si)
                start = t
            starts_l.append(offset + start)
            lengths_l.append(P - start)
            owner_l.append(si)
            offset += Pb

        flat = np.concatenate(buffers)
        from ..native import peak_quantize_i16

        q16, peak = peak_quantize_i16(flat)
        audio_dev = jnp.asarray(q16)
        inv_scale = max(peak, 1e-9) / 32766.0

        starts = np.asarray(starts_l, np.int32)
        lengths = np.asarray(lengths_l, np.int32)
        owner = np.asarray(owner_l, np.int32)
        L = int(np.ceil(lengths.max() / bucket_samples) * bucket_samples)
        N_real = len(starts)
        n_dp = self.mesh.shape["dp"] if self.mesh is not None else 1
        if N_real % n_dp:
            pad_n = n_dp - N_real % n_dp
            starts = np.concatenate([starts, np.repeat(starts[-1:], pad_n)])
            lengths = np.concatenate([lengths, np.repeat(lengths[-1:], pad_n)])
        N = len(starts)

        f0_spec = None
        pitch_params = None
        if self.use_f0:
            f0_spec = (s.f0_method, bool(s.f0_autotune), int(s.filter_radius),
                       int(s.crepe_hop_length), float(s.f0_min),
                       float(s.f0_max))
            pitch_params = self.pitch._method_params(s.f0_method)
        use_index = self.index_bank is not None and s.index_rate > 0
        protect_on = self.use_f0 and s.protect < 0.5
        rms_mix = s.rms_mix_rate < 1
        core = self._core2(use_index, self.use_f0, protect_on, rms_mix, L,
                           f0_spec=f0_spec, concat_out=False)
        bank = (self.index_bank if use_index
                else jnp.zeros((1, 1), jnp.float32))
        ints = jnp.asarray(np.stack([
            starts, lengths,
            np.full((N,), s.sid, np.int32)]).astype(np.int32))
        scalars = jnp.asarray(np.array(
            [s.index_rate, s.protect, s.rms_mix_rate, s.f0_up_key, inv_scale],
            np.float32))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as Pspec

            ints = jax.device_put(ints, NamedSharding(self.mesh,
                                                      Pspec(None, "dp")))
        args = (self.synth_params, self.hubert_params, pitch_params,
                bank, audio_dev, ints, scalars, None, None, self._noise_key)
        if return_async:
            # pipelined serving: the caller issues the next batch's dispatch
            # before forcing this one's download, hiding the device→host
            # transfer behind the next batch's compute (the transfer is
            # ~40% of the synchronous wall over a remote-chip link)
            n_songs = len(audios)

            def dispatch():
                return core(*args)  # async: XLA returns futures

            def finalize(out_dev):
                out16 = np.asarray(out_dev)[:N_real]
                return self._finalize_batch(out16, n_songs, owner, lengths, s)

            return dispatch, finalize
        if stats is not None:
            # measurement hooks for the throughput bench: device compute
            # (block_until_ready, no download) and the int16 grid download
            # are timed SEPARATELY — over a remote-chip tunnel the download
            # is hundreds of ms and is hidden by pipelining in steady-state
            # serving, so MFU must be computed against device_s, while
            # dispatch_s (compute + download) remains the synchronous
            # single-batch latency
            import time as _time

            t0 = _time.perf_counter()
            out_dev = core(*args)
            jax.block_until_ready(out_dev)
            stats["device_s"] = _time.perf_counter() - t0
            t1 = _time.perf_counter()
            out16 = np.asarray(out_dev)[:N_real]
            stats["download_s"] = _time.perf_counter() - t1
            stats["dispatch_s"] = _time.perf_counter() - t0
            stats["download_bytes"] = int(out16.nbytes)
            stats["n_chunks"] = int(N_real)
            stats["chunk_samples"] = int(L)
            if "flops" not in stats:
                try:
                    cost = core.lower(*args).compile().cost_analysis()
                    if isinstance(cost, (list, tuple)):
                        cost = cost[0]
                    stats["flops"] = float(cost["flops"])
                except Exception:
                    pass
        else:
            out16 = np.asarray(core(*args))[:N_real]

        return self._finalize_batch(out16, len(audios), owner, lengths, s)

    def _finalize_batch(self, out16: np.ndarray, n_songs: int,
                        owner: np.ndarray, lengths: np.ndarray,
                        s: ConvertSettings) -> list[tuple[np.ndarray, int]]:
        """Host-side tail of convert_batch: split the chunk grid back into
        per-song waveforms (pad trim + concat, optional resample)."""
        ratio = self.tgt_sr // 100
        results: list[tuple[np.ndarray, int]] = []
        for si in range(n_songs):
            pieces = []
            for i in np.nonzero(owner == si)[0]:
                p_len = min(int(lengths[i]) // WINDOW, out16.shape[1] // ratio)
                valid = out16[i, : p_len * ratio]
                pieces.append(
                    valid[self.t_pad_tgt : len(valid) - self.t_pad_tgt])
            song = np.concatenate(pieces)
            out_sr = self.tgt_sr
            if s.resample_sr >= SR and s.resample_sr != self.tgt_sr:
                res = self._jit_resample(s.resample_sr)(
                    jnp.asarray(song, jnp.float32)[None])[0]
                song = np.clip(np.asarray(res), 1 - MAX_INT16,
                               MAX_INT16 - 1).astype(np.int16)
                out_sr = s.resample_sr
            results.append((song, out_sr))
        return results


def make_random_converter(
    preset: str = "40k_v2",
    seed: int = 0,
    dtype=jnp.float32,
    hubert_cfg: HubertConfig | None = None,
    with_rmvpe: bool = True,
    chunking: tuple[int, int, int, int] | None = None,
    config: RVCConfig | None = None,
    feature_dim: int | None = None,
    index_rows: int = 0,
    index_int8: bool = True,
) -> VoiceConverter:
    """Build a converter with randomly initialized weights (for tests/bench
    until real checkpoints are mounted). ``chunking`` overrides
    (x_pad, x_query, x_center, x_max) — on TPU, shorter chunks batched
    together beat one giant chunk (attention memory scales with T²).
    ``config`` replaces the preset wholesale (tiny configs for dryruns);
    ``feature_dim`` overrides the version-derived HuBERT feature width so
    a reduced HuBERT can drive a reduced synthesizer. ``index_rows`` > 0
    attaches a random retrieval bank of that many rows (int8-quantized by
    default) so retrieval runs at realistic bank sizes."""
    import dataclasses

    from ..config import preset as get_preset

    cfg = config or get_preset(preset)
    if chunking is not None:
        cfg = dataclasses.replace(
            cfg, x_pad=chunking[0], x_query=chunking[1], x_center=chunking[2],
            x_max=chunking[3],
        )
    synth = Synthesizer.from_config(cfg.model, cfg.data, cfg.train.segment_size, dtype=dtype)
    if feature_dim is not None:
        synth = dataclasses.replace(synth, feature_dim=feature_dim)
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
    index_bank = None
    if index_rows > 0:
        # HuBERT-feature-shaped rows (unit-scale gaussian matches the
        # layer-norm'd feature statistics closely enough for FLOP/bandwidth
        # realism)
        bank_rng = np.random.default_rng(seed + 7)
        index_bank = bank_rng.standard_normal(
            (index_rows, synth.feature_dim)).astype(np.float32)
    return VoiceConverter(
        synth_params, kwargs, hubert_params, hcfg, pitch=extractor, config=cfg,
        dtype=dtype, index_bank=index_bank, index_int8=index_int8,
    )
