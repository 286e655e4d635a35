"""Fused device-resident VR separation.

The host band chain (pipelines/separate.py VRSeparator.run_inference)
crosses host↔device per band per direction — ~10 transfers per song over a
~40 MB/s link. This module compiles the ENTIRE VR path into two jitted
dispatches:

  analysis+mask: wave (2, T) → band resample → band STFTs → composite →
                 windowed CascadedASPPNet mask (batched windows) →
                 masked/complement spectra
  synthesis:     per-band crop → static lp/hp gain ramps → iSTFT →
                 resample-up chain → stems, peak-normalized int16

Static per (song-length bucket, params); all band arithmetic is the jnp
port of ops/bands.py with the python gain loops precomputed into static
vectors. The mirroring high-end reconstruction operates on device too.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bands as B
from ..ops.resample import resample as dev_resample
from ..ops.stft import stft as _stft, istft as _istft
from .separate import make_padding


def _lp_gain(n_bins: int, start: int, stop: int) -> np.ndarray:
    g = np.ones(n_bins, np.float32)
    val = 1.0
    for b in range(start, stop):
        val -= 1.0 / (stop - start)
        g[b] = val
    g[stop:] = 0.0
    return g


def _hp_gain(n_bins: int, start: int, stop: int) -> np.ndarray:
    g = np.ones(n_bins, np.float32)
    val = 1.0
    for b in range(start, stop, -1):
        val -= 1.0 / (start - stop)
        g[b] = val
    g[: stop + 1] = 0.0
    return g


def _pre_filter_gain(p: dict) -> np.ndarray:
    g = np.ones(p["bins"] + 1, np.float32)
    if p["pre_filter_start"] > 0:
        if len(p["band"]) == 1:
            g = _lp_gain(p["bins"] + 1, p["pre_filter_start"], p["pre_filter_stop"])
        else:
            gp = 1.0
            for b in range(p["pre_filter_start"] + 1, p["pre_filter_stop"]):
                gp = math.pow(10, -(b - p["pre_filter_start"]) * (3.5 - gp) / 20.0)
                g[b] = gp
    return g


class FusedVRSeparator:
    """Same contract as VRSeparator.run_inference, two device dispatches."""

    def __init__(self, params, model_params: B.ModelParameters | None = None,
                 agg: float = 10.0, window_size: int = 512,
                 high_end_process: str = "mirroring", dtype=jnp.float32):
        from ..models.vr_network import CascadedASPPNet

        self.mp = model_params or B.ModelParameters()
        self.model = CascadedASPPNet(self.mp.param["bins"] * 2, dtype=dtype)
        self.params = params
        self.offset = 128
        self.window_size = window_size
        self.agg = agg
        self.high_end_process = high_end_process
        self._fns: dict = {}

    def _build(self, T: int):
        p = self.mp.param
        bands_n = len(p["band"])
        split_bin = p["band"][1]["crop_stop"]
        aggv = self.agg / 100.0
        ws, off = self.window_size, self.offset
        model, params = self.model, self.params
        mirror_mode = self.high_end_process

        def run(wave):  # wave: (2, T) at p['sr']
            # --- per-band analysis (high band first, resampling down)
            specs = {}
            waves = {bands_n: wave}
            for d in range(bands_n, 0, -1):
                bp = p["band"][d]
                if d < bands_n:
                    waves[d] = dev_resample(waves[d + 1], p["band"][d + 1]["sr"], bp["sr"])
                w = waves[d]
                real, imag = _stft(w, bp["n_fft"], bp["hl"], bp["n_fft"], center=True)
                specs[d] = (jnp.swapaxes(real, 1, 2), jnp.swapaxes(imag, 1, 2))

            # --- composite (combine_spectrograms)
            l = min(specs[d][0].shape[2] for d in specs)
            parts_r, parts_i = [], []
            for d in range(1, bands_n + 1):
                bp = p["band"][d]
                parts_r.append(specs[d][0][:, bp["crop_start"]: bp["crop_stop"], :l])
                parts_i.append(specs[d][1][:, bp["crop_start"]: bp["crop_stop"], :l])
            Xr = jnp.concatenate(parts_r, axis=1)
            Xi = jnp.concatenate(parts_i, axis=1)
            pad_rows = p["bins"] + 1 - Xr.shape[1]
            Xr = jnp.pad(Xr, ((0, 0), (0, pad_rows), (0, 0)))
            Xi = jnp.pad(Xi, ((0, 0), (0, pad_rows), (0, 0)))
            pre = jnp.asarray(_pre_filter_gain(p))[None, :, None]
            Xr, Xi = Xr * pre, Xi * pre

            # high-end capture for mirroring
            bp_hi = p["band"][bands_n]
            he_h = (bp_hi["n_fft"] // 2 - bp_hi["crop_stop"]) + (
                p["pre_filter_stop"] - p["pre_filter_start"])
            he_r = specs[bands_n][0][:, bp_hi["n_fft"] // 2 - he_h : bp_hi["n_fft"] // 2, :l]
            he_i = specs[bands_n][1][:, bp_hi["n_fft"] // 2 - he_h : bp_hi["n_fft"] // 2, :l]

            # --- batched window inference
            X_mag = jnp.sqrt(Xr**2 + Xi**2)
            coef = jnp.maximum(X_mag.max(), 1e-9)
            X_pre = X_mag / coef
            n_frame = l
            pad_l, pad_r, roi = make_padding(n_frame, ws, off)
            n_window = int(np.ceil(n_frame / roi))
            need = (n_window - 1) * roi + ws
            Xp = jnp.pad(X_pre, ((0, 0), (0, 0), (pad_l, max(pad_r, need - n_frame - pad_l))))
            wins = jnp.stack(
                [Xp[:, :, i * roi : i * roi + ws] for i in range(n_window)]
            )  # (N, 2, bins, ws)
            x_in = wins.transpose(0, 3, 2, 1)
            mask = model.apply(params, x_in,
                               aggressiveness={"split_bin": split_bin, "value": aggv})
            mask = mask.transpose(0, 3, 2, 1)[:, :, :, off : ws - off]
            mask = jnp.concatenate(list(mask), axis=2)[:, :, :n_frame]
            pred = mask * coef

            y_r, y_i = pred * jnp.where(X_mag > 0, Xr / jnp.maximum(X_mag, 1e-9), 0.0), \
                       pred * jnp.where(X_mag > 0, Xi / jnp.maximum(X_mag, 1e-9), 0.0)
            v_r, v_i = Xr - y_r, Xi - y_i

            # --- synthesis per stem
            def synth(sr_, si_):
                # mirroring high end
                if mirror_mode.startswith("mirroring"):
                    pfs = p["pre_filter_start"]
                    mag_m = jnp.sqrt(sr_**2 + si_**2)
                    mir = jnp.flip(mag_m[:, pfs - 10 - he_h : pfs - 10, :], 1)
                    he_mag = jnp.sqrt(he_r**2 + he_i**2)
                    phase_r = jnp.where(he_mag > 0, he_r / jnp.maximum(he_mag, 1e-9), 1.0)
                    phase_i = jnp.where(he_mag > 0, he_i / jnp.maximum(he_mag, 1e-9), 0.0)
                    use_mir = he_mag > mir
                    her = jnp.where(use_mir, mir * phase_r, he_r)
                    hei = jnp.where(use_mir, mir * phase_i, he_i)
                else:
                    her = hei = None
                wave_acc = None
                offset_bins = 0
                for d in range(1, bands_n + 1):
                    bp = p["band"][d]
                    nb = bp["n_fft"] // 2 + 1
                    h = bp["crop_stop"] - bp["crop_start"]
                    br = jnp.zeros((2, nb, sr_.shape[2]))
                    bi = jnp.zeros((2, nb, sr_.shape[2]))
                    br = br.at[:, bp["crop_start"]: bp["crop_stop"]].set(
                        sr_[:, offset_bins : offset_bins + h])
                    bi = bi.at[:, bp["crop_start"]: bp["crop_stop"]].set(
                        si_[:, offset_bins : offset_bins + h])
                    offset_bins += h
                    gain = np.ones(nb, np.float32)
                    if d == bands_n:
                        if her is not None:
                            mx = bp["n_fft"] // 2
                            br = br.at[:, mx - he_h : mx].set(her)
                            bi = bi.at[:, mx - he_h : mx].set(hei)
                        if bp.get("hpf_start", 0) > 0:
                            gain = gain * _hp_gain(nb, bp["hpf_start"], bp["hpf_stop"] - 1)
                    elif d == 1:
                        gain = gain * _lp_gain(nb, bp["lpf_start"], bp["lpf_stop"])
                    else:
                        gain = gain * _hp_gain(nb, bp["hpf_start"], bp["hpf_stop"] - 1)
                        gain = gain * _lp_gain(nb, bp["lpf_start"], bp["lpf_stop"])
                    g = jnp.asarray(gain)[None, :, None]
                    br, bi = br * g, bi * g
                    w = _istft(jnp.swapaxes(br, 1, 2), jnp.swapaxes(bi, 1, 2),
                               bp["n_fft"], bp["hl"], center=True)
                    if d == bands_n:
                        if wave_acc is None:
                            wave_acc = w
                        else:
                            n = min(wave_acc.shape[-1], w.shape[-1])
                            wave_acc = wave_acc[..., :n] + w[..., :n]
                    else:
                        sr_next = p["band"][d + 1]["sr"]
                        if wave_acc is not None:
                            n = min(wave_acc.shape[-1], w.shape[-1])
                            w = wave_acc[..., :n] + w[..., :n]
                        wave_acc = dev_resample(w, bp["sr"], sr_next)
                return wave_acc

            inst = synth(y_r, y_i)
            voc = synth(v_r, v_i)
            # downmix + int16 on device (reference returns mono int16 stems
            # via remix_audio(..., to_int16=True, axis=0)); 4× smaller
            # download over the bandwidth-limited link

            def to_i16(w):
                mono = jnp.median(w, axis=0)
                peak = jnp.maximum(jnp.max(jnp.abs(mono)) / 0.95, 1.0)
                out = jnp.clip(mono / peak * 32768.0, 1 - 32768, 32767)
                return out.astype(jnp.int16)

            return to_i16(inst), to_i16(voc)

        return jax.jit(run)

    def run_inference(self, audio: np.ndarray, sr: int) -> dict:
        from ..io.audio import remix_audio
        from .karafan import _to_stereo_44k

        p = self.mp.param
        wave = audio if audio.ndim == 2 else np.stack([audio, audio])
        if sr != p["sr"]:
            from scipy import signal as _ss

            g = math.gcd(sr, p["sr"])
            wave = _ss.resample_poly(wave, p["sr"] // g, sr // g, axis=-1).astype(np.float32)
        T = wave.shape[-1]
        Tb = int(np.ceil(T / p["sr"]) * p["sr"])  # 1 s buckets
        wave_b = np.pad(wave, ((0, 0), (0, Tb - T)))
        if Tb not in self._fns:
            self._fns[Tb] = self._build(Tb)
        inst, voc = self._fns[Tb](jnp.asarray(wave_b))
        inst = np.asarray(inst)[..., :T]
        voc = np.asarray(voc)[..., :T]
        return {
            "sr": p["sr"],
            "instrumentals": (inst, p["sr"]),
            "vocals": (voc, p["sr"]),
            "input_audio": (wave, p["sr"]),
        }
