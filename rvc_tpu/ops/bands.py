"""Multi-band spectrogram processing for the UVR5-VR separation family.

Reference: lib/uvr5_pack/spec_utils.py:63-380 + model_param_init.py. The VR
networks operate on a composite magnitude spectrogram assembled from
per-band STFTs taken at different sample rates (each band resampled,
cropped to [crop_start, crop_stop) bins, stacked along frequency), then
the masked spectrogram is split back per band, lp/hp-filtered at the
seams, iSTFT'd and resampled up the chain.

Everything here is numpy host-side orchestration + jnp device transforms:
the per-band STFT/iSTFT use the shared DFT-matmul kernels, the band
resampling uses the polyphase device resampler. Band parameter files are
the same JSON format the reference ships (modelparams/*.json).
"""
from __future__ import annotations

import json
import math
from dataclasses import dataclass, field
from typing import Any

import jax.numpy as jnp
import numpy as np

from .resample import resample as device_resample
from .stft import stft as _stft, istft as _istft


DEFAULT_PARAM: dict[str, Any] = {
    # 2-band layout (numbers from the published UVR modelparams format)
    "bins": 768,
    "unstable_bins": 7,
    "reduction_bins": 705,
    "sr": 48000,
    "pre_filter_start": 710,
    "pre_filter_stop": 731,
    "band": {
        1: {"sr": 6000, "hl": 66, "n_fft": 512, "crop_start": 0, "crop_stop": 240,
            "lpf_start": 60, "lpf_stop": 240, "res_type": "sinc_fastest"},
        2: {"sr": 48000, "hl": 528, "n_fft": 1536, "crop_start": 22, "crop_stop": 505,
            "hpf_start": 82, "hpf_stop": 22, "res_type": "sinc_medium"},
    },
}

# The 4-band layout the reference's UVR5Base loads (modelparams/4band_v2.json)
FOURBAND_V2_PARAM: dict[str, Any] = {
    "bins": 672,
    "unstable_bins": 8,
    "reduction_bins": 637,
    "sr": 44100,
    "pre_filter_start": 668,
    "pre_filter_stop": 672,
    "band": {
        1: {"sr": 7350, "hl": 80, "n_fft": 640, "crop_start": 0, "crop_stop": 85,
            "lpf_start": 25, "lpf_stop": 53, "res_type": "polyphase"},
        2: {"sr": 7350, "hl": 80, "n_fft": 320, "crop_start": 4, "crop_stop": 87,
            "hpf_start": 25, "hpf_stop": 12, "lpf_start": 31, "lpf_stop": 62,
            "res_type": "polyphase"},
        3: {"sr": 14700, "hl": 160, "n_fft": 512, "crop_start": 17, "crop_stop": 216,
            "hpf_start": 48, "hpf_stop": 24, "lpf_start": 139, "lpf_stop": 210,
            "res_type": "polyphase"},
        4: {"sr": 44100, "hl": 480, "n_fft": 960, "crop_start": 78, "crop_stop": 383,
            "hpf_start": 130, "hpf_stop": 86, "res_type": "kaiser_fast"},
    },
}


class ModelParameters:
    """Band parameter container; loads the reference's JSON format."""

    def __init__(self, config_path: str = "", preset: str | None = None):
        if preset == "4band_v2":
            self.param = _int_band_keys(FOURBAND_V2_PARAM)
            for k in ("mid_side", "mid_side_b", "mid_side_b2", "stereo_w", "stereo_n",
                      "reverse"):
                self.param.setdefault(k, False)
            return
        if config_path:
            def int_keys(pairs):
                return {int(k) if k.isdigit() else k: v for k, v in pairs}

            with open(config_path) as f:
                self.param = json.load(f, object_pairs_hook=int_keys)
        else:
            self.param = _int_band_keys(DEFAULT_PARAM)
        for k in ("mid_side", "mid_side_b", "mid_side_b2", "stereo_w", "stereo_n", "reverse"):
            self.param.setdefault(k, False)


def _int_band_keys(param: dict) -> dict:
    import copy

    p = copy.deepcopy(param)
    p["band"] = {int(k): v for k, v in p["band"].items()}
    return p


def _stereo_encode(wave: np.ndarray, mid_side: bool, mid_side_b2: bool, reverse: bool):
    if reverse:
        return np.stack([np.flip(wave[0]), np.flip(wave[1])])
    if mid_side:
        return np.stack([(wave[0] + wave[1]) / 2, wave[0] - wave[1]])
    if mid_side_b2:
        return np.stack([wave[1] + wave[0] * 0.5, wave[0] - wave[1] * 0.5])
    return wave


def _stereo_decode(wave: np.ndarray, mid_side: bool, mid_side_b2: bool, reverse: bool):
    if reverse:
        return np.stack([np.flip(wave[0]), np.flip(wave[1])])
    if mid_side:
        return np.stack([wave[0] + wave[1] / 2, wave[0] - wave[1] / 2])
    if mid_side_b2:
        return np.stack([wave[1] / 1.25 + 0.4 * wave[0], wave[0] / 1.25 - 0.4 * wave[1]])
    return wave


def wave_to_spectrogram(wave: np.ndarray, hop_length: int, n_fft: int,
                        mid_side=False, mid_side_b2=False, reverse=False) -> np.ndarray:
    """(2, T) stereo -> complex (2, n_bins, frames), librosa.stft semantics
    (center=True, reflect pad, hann)."""
    w = _stereo_encode(np.asarray(wave, np.float32), mid_side, mid_side_b2, reverse)
    real, imag = _stft(jnp.asarray(w), n_fft, hop_length, n_fft, center=True)
    spec = np.asarray(real) + 1j * np.asarray(imag)
    return spec.transpose(0, 2, 1)  # (2, bins, frames)


def spectrogram_to_wave(spec: np.ndarray, hop_length: int,
                        mid_side=False, mid_side_b2=False, reverse=False) -> np.ndarray:
    n_fft = (spec.shape[1] - 1) * 2
    st = spec.transpose(0, 2, 1)  # (2, frames, bins)
    # split on host: the TPU backend has no complex transfer support
    real = jnp.asarray(np.ascontiguousarray(st.real, np.float32))
    imag = jnp.asarray(np.ascontiguousarray(st.imag, np.float32))
    wave = np.asarray(_istft(real, imag, n_fft, hop_length, center=True))
    return _stereo_decode(wave, mid_side, mid_side_b2, reverse)


def combine_spectrograms(specs: dict[int, np.ndarray], mp: ModelParameters) -> np.ndarray:
    """Stack per-band crops into the composite (2, bins+1, frames) spec
    (reference spec_utils.combine_spectrograms)."""
    p = mp.param
    l = min(specs[i].shape[2] for i in specs)
    out = np.zeros((2, p["bins"] + 1, l), np.complex64)
    offset = 0
    bands_n = len(p["band"])
    for d in range(1, bands_n + 1):
        bp = p["band"][d]
        h = bp["crop_stop"] - bp["crop_start"]
        out[:, offset : offset + h, :l] = specs[d][:, bp["crop_start"] : bp["crop_stop"], :l]
        offset += h
    if offset > p["bins"]:
        raise ValueError("Too much bins")
    if p["pre_filter_start"] > 0:
        if bands_n == 1:
            out = fft_lp_filter(out, p["pre_filter_start"], p["pre_filter_stop"])
        else:
            gp = 1.0
            for b in range(p["pre_filter_start"] + 1, p["pre_filter_stop"]):
                g = math.pow(10, -(b - p["pre_filter_start"]) * (3.5 - gp) / 20.0)
                gp = g
                out[:, b, :] *= g
    return out


def fft_lp_filter(spec: np.ndarray, bin_start: int, bin_stop: int) -> np.ndarray:
    g = 1.0
    for b in range(bin_start, bin_stop):
        g -= 1 / (bin_stop - bin_start)
        spec[:, b, :] = g * spec[:, b, :]
    spec[:, bin_stop:, :] *= 0
    return spec


def fft_hp_filter(spec: np.ndarray, bin_start: int, bin_stop: int) -> np.ndarray:
    g = 1.0
    for b in range(bin_start, bin_stop, -1):
        g -= 1 / (bin_start - bin_stop)
        spec[:, b, :] = g * spec[:, b, :]
    spec[:, 0 : bin_stop + 1, :] *= 0
    return spec


def cmb_spectrogram_to_wave(spec_m: np.ndarray, mp: ModelParameters,
                            extra_bins_h: int | None = None,
                            extra_bins: np.ndarray | None = None) -> np.ndarray:
    """Composite masked spec -> waveform via per-band iSTFT + resample chain
    (reference spec_utils.cmb_spectrogram_to_wave)."""
    p = mp.param
    bands_n = len(p["band"])
    offset = 0
    wave = None
    ms, msb2, rev = p["mid_side"], p["mid_side_b2"], p["reverse"]
    for d in range(1, bands_n + 1):
        bp = p["band"][d]
        spec_s = np.zeros((2, bp["n_fft"] // 2 + 1, spec_m.shape[2]), complex)
        h = bp["crop_stop"] - bp["crop_start"]
        spec_s[:, bp["crop_start"] : bp["crop_stop"], :] = spec_m[:, offset : offset + h, :]
        offset += h
        if d == bands_n:  # highest band
            if extra_bins_h:
                max_bin = bp["n_fft"] // 2
                spec_s[:, max_bin - extra_bins_h : max_bin, :] = extra_bins[:, :extra_bins_h, :]
            if bp.get("hpf_start", 0) > 0:
                spec_s = fft_hp_filter(spec_s, bp["hpf_start"], bp["hpf_stop"] - 1)
            band_wave = spectrogram_to_wave(spec_s, bp["hl"], ms, msb2, rev)
            wave = band_wave if bands_n == 1 else _add_trunc(wave, band_wave)
        else:
            sr_next = p["band"][d + 1]["sr"]
            if d == 1:  # lowest
                spec_s = fft_lp_filter(spec_s, bp["lpf_start"], bp["lpf_stop"])
                band_wave = spectrogram_to_wave(spec_s, bp["hl"], ms, msb2, rev)
                wave = _resample_np(band_wave, bp["sr"], sr_next)
            else:  # mid bands
                spec_s = fft_hp_filter(spec_s, bp["hpf_start"], bp["hpf_stop"] - 1)
                spec_s = fft_lp_filter(spec_s, bp["lpf_start"], bp["lpf_stop"])
                wave2 = _add_trunc(wave, spectrogram_to_wave(spec_s, bp["hl"], ms, msb2, rev))
                wave = _resample_np(wave2, bp["sr"], sr_next)
    return wave


def _add_trunc(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    n = min(a.shape[-1], b.shape[-1])
    return a[..., :n] + b[..., :n]


def _resample_np(wave: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    return np.asarray(device_resample(jnp.asarray(wave), orig_sr, target_sr))


def mirroring(mode: str, spec_m: np.ndarray, input_high_end: np.ndarray,
              mp: ModelParameters) -> np.ndarray:
    """High-end reconstruction by spectral mirroring (reference :359-372)."""
    pfs = mp.param["pre_filter_start"]
    mirror = np.flip(
        np.abs(spec_m[:, pfs - 10 - input_high_end.shape[1] : pfs - 10, :]), 1
    )
    if mode == "mirroring":
        mirror = mirror * np.exp(1.0j * np.angle(input_high_end))
        return np.where(np.abs(input_high_end) <= np.abs(mirror), input_high_end, mirror)
    if mode == "mirroring2":
        mi = mirror * input_high_end * 1.7
        return np.where(np.abs(input_high_end) <= np.abs(mi), input_high_end, mi)
    return input_high_end


def crop_center(h1: np.ndarray, target_width: int) -> np.ndarray:
    """Center-crop the time axis (reference spec_utils.crop_center)."""
    w = h1.shape[-1]
    if w == target_width:
        return h1
    if w < target_width:
        raise ValueError("h1_shape[3] must be greater than h2_shape[3]")
    s = (w - target_width) // 2
    return h1[..., s : s + target_width]


def reduce_vocal_aggressively(X: np.ndarray, y: np.ndarray, softmask: float) -> np.ndarray:
    v = X - y
    y_mag = np.abs(y)
    v_mag = np.abs(v)
    mask = v_mag > y_mag
    out = np.clip(y_mag - v_mag * mask * softmask, 0, np.inf)
    return out * np.exp(1.0j * np.angle(y))
