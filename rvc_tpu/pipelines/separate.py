"""Vocal/instrumental separation pipelines.

Covers the reference's separator front (uvr5_cli.py:14-155 +
lib/separators.py):

  * ``VRSeparator`` — 4-band CascadedASPPNet path: per-band STFT →
    composite mag spec → masked → per-band iSTFT + mirroring high end.
    TPU redesign: the reference slides a 512-frame window through the
    model one window at a time (lib/separators.py:86-101); here all
    windows stack into ONE batched device dispatch.
  * ``MDXSeparator`` — MDX-Net path: chunk/margin split
    (lib/mdx.py:90-132), complex-as-channels STFT, Conv-TDF net, iSTFT,
    margin-trimmed concat; denoise trick (0.5·f(x) − 0.5·f(−x), :142) kept.
  * ``Separator`` — model-path keyword routing (uvr5_cli.py:24-64).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..io.audio import remix_audio
from ..models.mdx_net import ConvTDFNetTrim, MDXSpectrogram
from ..models.vr_network import CascadedASPPNet
from ..ops import bands as B


def make_padding(width: int, cropsize: int, offset: int):
    """Window padding arithmetic (reference spec_utils.make_padding)."""
    left = offset
    roi_size = cropsize - left * 2
    if roi_size == 0:
        roi_size = cropsize
    right = roi_size - (width % roi_size) + left
    return left, right, roi_size


class VRSeparator:
    """CascadedASPPNet inference over the 4-band composite spectrogram."""

    def __init__(self, params, model_params: B.ModelParameters | None = None,
                 agg: float = 10.0, window_size: int = 512, tta: bool = False,
                 high_end_process: str = "mirroring", dtype=jnp.float32):
        self.mp = model_params or B.ModelParameters()
        self.model = CascadedASPPNet(self.mp.param["bins"] * 2, dtype=dtype)
        self.params = params
        self.offset = 128
        self.window_size = window_size
        self.agg = agg
        self.tta = tta
        self.high_end_process = high_end_process
        self._apply = jax.jit(
            lambda p, x, sb, v: self.model.apply(
                p, x, aggressiveness={"split_bin": sb, "value": v})
            , static_argnums=(2,)
        )

    def _predict_mask(self, X_mag_pad: np.ndarray, roi_size: int, split_bin: int,
                      agg_value: float) -> np.ndarray:
        """All sliding windows in one batch. X_mag_pad: (2, bins, frames)."""
        n_frames = X_mag_pad.shape[2]
        n_window = n_frames // roi_size
        ws = self.window_size
        # gather windows: window i covers [i*roi : i*roi + ws)
        need = (n_window - 1) * roi_size + ws
        if need > n_frames:
            X_mag_pad = np.pad(X_mag_pad, ((0, 0), (0, 0), (0, need - n_frames)))
        wins = np.stack(
            [X_mag_pad[:, :, i * roi_size : i * roi_size + ws] for i in range(n_window)]
        )  # (N, 2, bins, ws)
        x = jnp.asarray(wins.transpose(0, 3, 2, 1))  # (N, T=ws, F=bins, C=2)
        mask = self._apply(self.params, x, split_bin, jnp.float32(agg_value))
        mask = np.asarray(mask).transpose(0, 3, 2, 1)  # (N, 2, bins, ws)
        # crop model offset per window and concat (reference model.predict)
        mask = mask[:, :, :, self.offset : ws - self.offset]
        return np.concatenate(list(mask), axis=2)

    def separate_spec(self, X_spec: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Composite complex spec (2, bins+1, frames) -> (inst_spec, vocal_spec)."""
        X_mag = np.abs(X_spec)
        X_phase = np.angle(X_spec)
        coef = X_mag.max()
        X_pre = X_mag / max(coef, 1e-9)
        n_frame = X_pre.shape[2]
        pad_l, pad_r, roi = make_padding(n_frame, self.window_size, self.offset)
        n_window = int(np.ceil(n_frame / roi))
        X_pad = np.pad(X_pre, ((0, 0), (0, 0), (pad_l, pad_r)))
        split_bin = self.mp.param["band"][1]["crop_stop"]
        aggv = self.agg / 100.0
        pred = self._predict_mask(X_pad[:, :, : n_window * roi + 2 * self.offset],
                                  roi, split_bin, aggv)
        pred = pred[:, :, :n_frame]
        if self.tta:
            pad_l2 = pad_l + roi // 2
            pad_r2 = pad_r + roi // 2
            X_pad2 = np.pad(X_pre, ((0, 0), (0, 0), (pad_l2, pad_r2)))
            pred2 = self._predict_mask(
                X_pad2[:, :, : (n_window + 1) * roi + 2 * self.offset], roi,
                split_bin, aggv,
            )
            pred2 = pred2[:, :, roi // 2 :][:, :, :n_frame]
            pred = 0.5 * (pred + pred2)
        pred = pred * coef
        y_spec = pred * np.exp(1.0j * X_phase)  # instrumental
        v_spec = X_spec - y_spec  # vocals
        return y_spec, v_spec

    def run_inference(self, audio: np.ndarray, sr: int) -> dict:
        """audio: (T,) or (2, T) at any rate → stems dict (reference
        UVR5Base.run_inference, lib/separators.py:186-247)."""
        p = self.mp.param
        bands_n = len(p["band"])
        if audio.ndim == 1:
            audio = np.stack([audio, audio])
        X_wave, X_spec = {}, {}
        input_high_end = input_high_end_h = None
        for d in range(bands_n, 0, -1):
            bp = p["band"][d]
            if d == bands_n:
                # channel-preserving resample (remix_audio downmixes)
                wav = B._resample_np(audio, sr, bp["sr"]) \
                    if sr != bp["sr"] else audio
                X_wave[d] = np.atleast_2d(wav)
                if X_wave[d].shape[0] == 1:
                    X_wave[d] = np.vstack([X_wave[d], X_wave[d]])
            else:
                X_wave[d] = B._resample_np(
                    X_wave[d + 1], p["band"][d + 1]["sr"], bp["sr"]
                )
            X_spec[d] = B.wave_to_spectrogram(
                X_wave[d], bp["hl"], bp["n_fft"], p["mid_side"], p["mid_side_b2"],
                p["reverse"],
            )
            if d == bands_n and self.high_end_process != "none":
                input_high_end_h = (bp["n_fft"] // 2 - bp["crop_stop"]) + (
                    p["pre_filter_stop"] - p["pre_filter_start"]
                )
                input_high_end = X_spec[d][
                    :, bp["n_fft"] // 2 - input_high_end_h : bp["n_fft"] // 2, :
                ]
        X_spec_m = B.combine_spectrograms(X_spec, self.mp)
        y_spec, v_spec = self.separate_spec(X_spec_m)
        out = {"sr": p["sr"]}
        for name, spec in (("instrumentals", y_spec), ("vocals", v_spec)):
            if self.high_end_process.startswith("mirroring") and input_high_end is not None:
                he = B.mirroring(self.high_end_process, spec, input_high_end, self.mp)
                wav = B.cmb_spectrogram_to_wave(spec, self.mp, input_high_end_h, he)
            else:
                wav = B.cmb_spectrogram_to_wave(spec, self.mp)
            out[name] = remix_audio((wav, p["sr"]), to_int16=True, axis=0)
        out["input_audio"] = (audio, sr)
        return out


class MDXSeparator:
    """Conv-TDF demixer with chunk/margin batching (reference MDXModel)."""

    def __init__(self, params, dim_f: int = 3072, dim_t: int = 256,
                 n_fft: int = 6144, hop: int = 1024, stem_name: str = "Vocals",
                 compensation: float = 1.0, margin: int = 44100,
                 chunks: int = 15, denoise: bool = False,
                 net: Any = None, dtype=jnp.float32):
        self.spec = MDXSpectrogram(dim_f, 2 ** dim_t if dim_t < 32 else dim_t, n_fft, hop)
        self.net = net or ConvTDFNetTrim(dim_f=dim_f, dtype=dtype)
        if isinstance(params, str):
            # path to the reference .onnx model file: extract + auto-map
            # (compat/onnx_import.convtdf_params_from_onnx)
            from ..compat.onnx_import import convtdf_params_from_onnx

            params = convtdf_params_from_onnx(params, model=self.net)
        self.params = params
        self.stem_name = stem_name
        self.compensation = compensation
        self.margin = margin
        self.chunks = chunks
        self.denoise = denoise
        sp = self.spec

        def run(params, waves):
            spek = sp.pack(waves) * self.compensation
            # zero the 3 lowest bins (reference lib/mdx.py:137)
            spek = spek * jnp.concatenate(
                [jnp.zeros((1, 1, 3, 1)), jnp.ones((1, 1, sp.dim_f - 3, 1))], axis=2
            )
            if self.denoise:
                pred = self.net.apply(params, spek) * 0.5 - self.net.apply(params, -spek) * 0.5
            else:
                pred = self.net.apply(params, spek)
            return sp.unpack(pred)

        self._run = jax.jit(run)

    def demix(self, mix: np.ndarray) -> np.ndarray:
        """mix: (2, T) at 44.1k -> predicted stem (2, T).

        All segments' windows ride in ONE jitted dispatch (the reference
        lib/mdx.py:111 demix_base runs one ORT call per window; per-window
        host round-trips were the 21x-RT bottleneck of round 1). The window
        count is bucketed to a multiple of 8 so song-length changes reuse
        the compiled program.
        """
        sp = self.spec
        n_sample = mix.shape[1]
        # chunk dict (reference prepare_mix): segments of chunks*sr samples
        # with `margin` overlap each side
        chunk_size = self.chunks * 44100 if self.chunks > 0 else n_sample
        margin = min(self.margin, chunk_size)
        segments = []
        for skip in range(0, n_sample, chunk_size):
            start = max(0, skip - (margin if skip else 0))
            end = min(skip + chunk_size + margin, n_sample)
            segments.append((start, end, 0 if skip == 0 else margin))
            if end == n_sample:
                break
        all_waves, seg_meta = [], []
        for start, end, head in segments:
            seg = mix[:, start:end]
            n = seg.shape[1]
            pad = sp.gen_size - n % sp.gen_size
            seg_p = np.concatenate(
                [np.zeros((2, sp.trim)), seg, np.zeros((2, pad)), np.zeros((2, sp.trim))],
                axis=1,
            )
            waves = np.stack(
                [seg_p[:, k : k + sp.chunk_size]
                 for k in range(0, n + pad, sp.gen_size)]
            )  # (N, 2, chunk_size)
            all_waves.append(waves)
            seg_meta.append((len(waves), n, head))
        batch = np.concatenate(all_waves, axis=0)
        n_real = len(batch)
        n_pad = -(-n_real // 8) * 8  # bucket: stable compiled shape
        if n_pad > n_real:
            batch = np.concatenate(
                [batch, np.zeros((n_pad - n_real, 2, sp.chunk_size))], axis=0)
        dev = self._run(self.params, jnp.asarray(batch, jnp.float32))
        tar_all = np.asarray(dev[:n_real, :, sp.trim : -sp.trim])  # (N, 2, gen)
        outs, off = [], 0
        for i, (cnt, n, head) in enumerate(seg_meta):
            tar = tar_all[off : off + cnt]
            off += cnt
            tar = tar.transpose(1, 0, 2).reshape(2, -1)[:, :n]
            tail = None if (i == len(segments) - 1 or margin == 0) else -margin
            outs.append(tar[:, head:tail] / self.compensation)
        return np.concatenate(outs, axis=-1)

    def run_inference(self, audio: np.ndarray, sr: int) -> dict:
        from .karafan import _to_stereo_44k

        mix = _to_stereo_44k(np.atleast_2d(np.asarray(audio, np.float32)), sr)
        primary = self.demix(mix)
        secondary = mix[:, : primary.shape[1]] - primary
        vocals, instrumental = (
            (secondary, primary) if "instrument" in self.stem_name.lower()
            else (primary, secondary)
        )
        return {
            "sr": 44100,
            "vocals": remix_audio((vocals, 44100), to_int16=True, axis=0),
            "instrumentals": remix_audio((instrumental, 44100), to_int16=True, axis=0),
            "input_audio": (mix, 44100),
        }


class DemucsSeparator:
    """Hybrid Demucs v3/v4 separation from a reference ``.th`` package
    (reference lib/uvr5_pack/demucs/apply.py:124 drive — chunked
    triangular overlap-add; the model forward itself is one fused XLA
    program, models/htdemucs.py)."""

    def __init__(self, model_path: str, segment: float | None = None,
                 overlap: float = 0.25, shifts: int = 1, dtype: Any = jnp.float32):
        from ..compat.torch_import import htdemucs_kwargs_from_meta, load_demucs_v4
        from ..models.htdemucs import HDemucs, HTDemucs

        self.sub: list[DemucsSeparator] = []
        self.weights: list[list[float]] = []
        if "tasnet" in os.path.basename(model_path).lower():
            # demucs v2 Conv-TasNet member (reference model_v2.py:52)
            from ..compat.torch_import import load_tasnet
            from ..models.tasnet import ConvTasNet

            self.params, cfg = load_tasnet(model_path)
            n_src = cfg.pop("n_sources")
            sources = (("drums", "bass", "other", "vocals") if n_src == 4
                       else tuple(f"source_{i}" for i in range(n_src)))
            self.model = ConvTasNet(sources=sources, **cfg, dtype=dtype)
            self.sources = list(sources)
            self.samplerate = 44100
            # reference segment_length = 44100*2*4 samples at stereo (8 s)
            self.segment_samples = int(float(segment or 8.0) * self.samplerate)
            self.overlap, self.shifts = overlap, shifts
            self._apply = jax.jit(self.model.apply)
            return
        if model_path.endswith((".yaml", ".yml")):
            # bag of models (reference demucs/apply.py BagOfModels:29):
            # <sig>.yaml next to <sig>*.th member files
            import glob

            import yaml

            with open(model_path) as f:
                bag = yaml.safe_load(f)
            folder = os.path.dirname(os.path.abspath(model_path))
            for sig in bag["models"]:
                cands = (glob.glob(os.path.join(folder, f"{sig}*.th"))
                         or glob.glob(os.path.join(folder, f"{sig}*.ckpt")))
                if not cands:
                    raise FileNotFoundError(f"bag member {sig}*.th in {folder}")
                self.sub.append(DemucsSeparator(
                    cands[0], segment=bag.get("segment", segment),
                    overlap=overlap, shifts=shifts, dtype=dtype))
            first = self.sub[0]
            self.sources = first.sources
            self.samplerate = first.samplerate
            self.segment_samples = first.segment_samples
            self.weights = (bag.get("weights")
                            or [[1.0] * len(self.sources) for _ in self.sub])
            self.overlap, self.shifts = overlap, shifts
            return
        self.params, meta = load_demucs_v4(model_path)
        kwargs = htdemucs_kwargs_from_meta(meta)
        klass = HTDemucs if meta.get("klass", "HTDemucs") == "HTDemucs" else HDemucs
        self.model = klass(**kwargs, dtype=dtype)
        self.sources = list(meta.get("sources") or self.model.sources)
        self.samplerate = int(meta.get("samplerate", 44100))
        seg = segment if segment is not None else meta.get("segment", 10.0)
        self.segment_samples = int(float(seg) * self.samplerate)
        self.overlap = overlap
        self.shifts = shifts
        self._apply = jax.jit(self.model.apply)

    def demix(self, mix: np.ndarray) -> np.ndarray:
        """mix (C, T) float32 → (S, C, T) stems. For a bag, the weighted
        per-source average over members (reference apply.py:139-160)."""
        from ..models.demucs import apply_model

        if self.sub:
            est = None
            totals = np.zeros(len(self.sources), np.float64)
            for sep, w in zip(self.sub, self.weights):
                out = sep.demix(mix) * np.asarray(w, np.float32)[:, None, None]
                totals += np.asarray(w)
                est = out if est is None else est + out
            return est / totals[:, None, None].astype(np.float32)

        fn = lambda batch: self._apply(self.params, batch)  # noqa: E731
        return apply_model(fn, mix, self.segment_samples,
                           overlap=self.overlap, shifts=self.shifts)

    @staticmethod
    def _stereo_int16(stem: np.ndarray, sr: int) -> tuple[np.ndarray, int]:
        """(C, T) float → (C, T) int16, channels preserved (stems are
        stereo; remix_audio always downmixes multichannel input)."""
        peak = np.abs(stem).max() / 0.95
        if peak > 1:
            stem = stem / peak
        return (np.clip(stem * 32768.0, -32767, 32767).astype(np.int16), sr)

    def run_inference(self, audio: np.ndarray, sr: int) -> dict:
        from .karafan import _to_stereo_44k

        mix = np.atleast_2d(np.asarray(audio, np.float32))
        if self.samplerate == 44100:
            mix = _to_stereo_44k(mix, sr)
        elif sr != self.samplerate:
            import math as _m

            from scipy import signal as _ss

            g = _m.gcd(sr, self.samplerate)
            mix = _ss.resample_poly(mix, self.samplerate // g, sr // g,
                                    axis=-1).astype(np.float32)
        if mix.shape[0] == 1:
            mix = np.vstack([mix, mix])
        stems = self.demix(mix.astype(np.float32))
        out = {"sr": self.samplerate,
               "input_audio": (mix, self.samplerate)}
        for name, stem in zip(self.sources, stems):
            out[name] = self._stereo_int16(stem, self.samplerate)
        if "vocals" in self.sources:
            v = stems[self.sources.index("vocals")]
            inst = mix[:, : v.shape[1]] - v
            out["instrumentals"] = self._stereo_int16(inst, self.samplerate)
        return out


def route_separator(model_path: str, **kwargs):
    """Keyword routing (reference uvr5_cli.py:24-64 + Demucs v3/v4
    ``.th``/``.yaml`` packages): MDX models by name, dereverb/echo → VR
    'new' nets, demucs checkpoints → hybrid demucs, else the VR
    cascaded net."""
    name = os.path.basename(model_path).lower()
    if "roformer" in name:
        # coverage BEYOND the reference: its catalog lists these checkpoints
        # (settings/downloader.py) but has no code path that can run them.
        # Mel-Band RoFormer (overlapping mel bands, e.g. Kim_MelBandRoformer)
        # is a distinct architecture from band-split RoFormer.
        if "mel" in name:
            return "mel_roformer"
        return "bs_roformer"
    if name.endswith((".th", ".yaml")) or "demucs" in name or "tasnet" in name:
        return "demucs"
    if "mdx" in name:
        return "mdx"
    if any(k in name for k in ("reverb", "echo", "dereverb")):
        return "vr_new"
    return "vr"
