"""Pitch extraction: method dispatch, hybrid merging, coarse quantization.

Covers the reference FeatureExtractor (pitch_extraction.py:13-304):

  * rmvpe / rmvpe+ — the RMVPE salience network (device);
  * crepe / crepe-tiny / mangio-crepe / mangio-crepe-tiny — CREPE CNN
    (device); the mangio variants use a caller-set hop and nan-interp
    resize like the reference (:76-119);
  * pm — TPU-native windowed-autocorrelation estimator (Wiener-Khinchin
    ACF via the DFT-matmul STFT, parabolic peak refinement, praat-style
    octave cost). Faithful algorithm family: parselmouth's to_pitch_ac
    (reference :155-160) IS Boersma's autocorrelation method.
  * dio / harvest — WORLD candidate-grid algorithms (pitch/world.py:
    Nuttall filter-bank band decomposition, four event-interval period
    estimators per band, deviation-scored candidate selection; harvest
    adds a denser grid + temporal-continuity Viterbi), then stonemask
    spectral refinement — the reference pipeline pw.dio/pw.harvest →
    pw.stonemask (:168-188) without the pyworld C extension.
  * hybrid — any list of methods merged with a nan-aware reducer
    (median/mean/min/max) after length-padding (reference :205-248).

The coarse mel quantization (:299-302) feeds the synthesizer's pitch
embedding; it is computed on device so f0 never leaves the chip.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stft import frame_signal

F0_BINS = 256
HUBERT_SR = 16000
HUBERT_WINDOW = 160


def hz_to_mel(hz):
    return 2595.0 * jnp.log10(1.0 + hz / 700.0)


def coarse_f0(f0: jax.Array, f0_min: float = 50.0, f0_max: float = 1100.0) -> jax.Array:
    """Quantize f0 Hz to 1..255 mel bins (reference pitch_extraction.py:299-302)."""
    mel_min = 2595.0 * np.log10(1.0 + f0_min / 700.0)
    mel_max = 2595.0 * np.log10(1.0 + f0_max / 700.0)
    mel = hz_to_mel(f0)
    mel = (mel - mel_min) * (F0_BINS - 2) / (mel_max - mel_min) + 1.0
    mel = jnp.clip(mel, 1.0, F0_BINS - 1)
    return jnp.rint(mel).astype(jnp.int32)


def shift_semitones(f0: jax.Array, semitones: float) -> jax.Array:
    return f0 * (2.0 ** (semitones / 12.0))


def autotune(f0: jax.Array, threshold: float = 0.0) -> jax.Array:
    """Snap to the 72-note equal-tempered table (reference lib/audio.py:274-300)."""
    notes = jnp.asarray(440.0 * 2.0 ** ((np.arange(72) - 33) / 12.0), f0.dtype)
    diff = jnp.abs(notes[None, :] - f0[..., None])
    idx = jnp.argmin(diff, axis=-1)
    nearest = notes[idx]
    best = jnp.take_along_axis(diff, idx[..., None], axis=-1)[..., 0]
    return jnp.where(best < threshold, f0, nearest)


# ---------------------------------------------------------------------------
# Autocorrelation estimator (pm/dio/harvest TPU-native equivalents)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _acf_bases(n_fft: int, max_lag: int) -> tuple[np.ndarray, np.ndarray]:
    """DFT power → ACF bases: acf[τ] = Σ_k |X_k|² cos(2π k τ / N) / N."""
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins)[:, None]
    tau = np.arange(max_lag + 1)[None, :]
    cos_b = np.cos(2 * np.pi * k * tau / n_fft) / n_fft
    wk = np.full((n_bins, 1), 2.0)
    wk[0] = 1.0
    if n_fft % 2 == 0:
        wk[-1] = 1.0
    return (cos_b * wk).astype(np.float32), None


def acf_pitch(
    audio: jax.Array,
    sr: int = HUBERT_SR,
    hop: int = HUBERT_WINDOW,
    f0_min: float = 50.0,
    f0_max: float = 1100.0,
    frame_length: int = 1024,
    voicing_threshold: float = 0.45,
    octave_cost: float = 0.01,
) -> jax.Array:
    """Windowed-autocorrelation f0 with parabolic peak refinement.

    audio: (B, T) -> (B, 1 + T//hop) Hz (0 where unvoiced).
    """
    B, T = audio.shape
    n_fft = 2 * frame_length
    pad = frame_length // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)))
    frames = frame_signal(x, frame_length, hop)  # (B, F, W)
    frames = frames - frames.mean(axis=-1, keepdims=True)
    # zero-pad to 2W so the circular ACF equals the linear ACF
    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, n_fft - frame_length)))

    min_lag = max(int(sr / f0_max), 2)
    max_lag = min(int(sr / f0_min) + 1, frame_length - 2)

    from ..ops.stft import _dft_basis_np

    # rectangular-window DFT (window folded out — ACF of the raw frame)
    n_bins = n_fft // 2 + 1
    kk = np.arange(n_fft)[:, None] * np.arange(n_bins)[None, :]
    cosb = jnp.asarray(np.cos(2 * np.pi * kk / n_fft), jnp.float32)
    sinb = jnp.asarray(-np.sin(2 * np.pi * kk / n_fft), jnp.float32)
    re = jnp.matmul(frames, cosb, precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(frames, sinb, precision=jax.lax.Precision.HIGHEST)
    power = re * re + im * im  # (B, F, n_bins)
    acf_basis, _ = _acf_bases(n_fft, max_lag)
    acf = jnp.matmul(power, jnp.asarray(acf_basis), precision=jax.lax.Precision.HIGHEST)
    r0 = jnp.maximum(acf[..., :1], 1e-9)
    nacf = acf / r0  # normalized ACF, (B, F, max_lag+1)

    lags = jnp.arange(max_lag + 1)
    valid = (lags >= min_lag) & (lags <= max_lag)
    # slight high-lag (low-pitch) preference to counter harmonic halving,
    # praat-style octave cost
    score = nacf - octave_cost * jnp.log2(jnp.maximum(lags, 1) / min_lag)
    score = jnp.where(valid[None, None, :], score, -jnp.inf)
    best = jnp.argmax(score, axis=-1)  # (B, F)

    # parabolic interpolation around the peak
    bm1 = jnp.clip(best - 1, 0, max_lag)
    bp1 = jnp.clip(best + 1, 0, max_lag)
    ym1 = jnp.take_along_axis(nacf, bm1[..., None], -1)[..., 0]
    y0 = jnp.take_along_axis(nacf, best[..., None], -1)[..., 0]
    yp1 = jnp.take_along_axis(nacf, bp1[..., None], -1)[..., 0]
    denom = ym1 - 2 * y0 + yp1
    delta = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (ym1 - yp1) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    lag = best.astype(jnp.float32) + delta
    f0 = sr / jnp.maximum(lag, 1.0)
    voiced = (y0 > voicing_threshold) & (best >= min_lag)
    return jnp.where(voiced, f0, 0.0)


# ---------------------------------------------------------------------------
# StoneMask refinement (pyworld's second stage, reference
# pitch_extraction.py:168-188 runs pw.stonemask after dio/harvest)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _spec_bases(frame_length: int, n_fft: int, n_bins: int):
    """Truncated high-res DFT bases (Hann window folded in): zero-padding a
    windowed frame to n_fft is the same matmul over the raw frame samples
    with bases sampled at the fine bin grid."""
    n = np.arange(frame_length)
    win = 0.5 - 0.5 * np.cos(2 * np.pi * n / frame_length)
    k = np.arange(n_bins)[None, :]
    ang = 2 * np.pi * n[:, None] * k / n_fft
    return ((np.cos(ang) * win[:, None]).astype(np.float32),
            (np.sin(ang) * win[:, None]).astype(np.float32))


def stonemask_refine(
    audio: jax.Array,
    f0: jax.Array,
    sr: int = HUBERT_SR,
    hop: int = HUBERT_WINDOW,
    frame_length: int = 1024,
    n_fft: int = 4096,
    search: float = 0.2,
    K: int = 64,
) -> jax.Array:
    """Refine candidate f0 to the exact fundamental spectral peak.

    pyworld's StoneMask re-estimates each frame's f0 from the signal
    spectrum around the candidate; here: a high-resolution (zero-padded)
    power spectrum per frame (DFT-as-matmul, MXU form), gather the K bins
    around each frame's candidate bin, argmax within ±``search`` of the
    candidate, parabolic interpolation → refined Hz. Unvoiced frames
    (f0 == 0) pass through; frames whose window holds < 2 periods keep the
    candidate.

    audio: (B, T); f0: (B, F) Hz aligned to the same hop grid.
    """
    B, T = audio.shape
    pad = frame_length // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)))
    frames = frame_signal(x, frame_length, hop)[:, : f0.shape[1]]
    f0 = f0[:, : frames.shape[1]]
    n_bins = min(n_fft // 2 + 1,
                 int(np.ceil(1100.0 * 1.3 * n_fft / sr)) + K + 2)
    cosb, sinb = _spec_bases(frame_length, n_fft, n_bins)
    re = jnp.matmul(frames, jnp.asarray(cosb), precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(frames, jnp.asarray(sinb), precision=jax.lax.Precision.HIGHEST)
    power = re * re + im * im  # (B, F, n_bins)

    bin_hz = sr / n_fft
    b0 = f0 / bin_hz  # candidate bin (fractional)
    center = jnp.clip(jnp.rint(b0).astype(jnp.int32), 0, n_bins - 1)
    offs = jnp.arange(-(K // 2), K // 2 + 1)
    idx = jnp.clip(center[..., None] + offs, 0, n_bins - 1)  # (B, F, K+1)
    neigh = jnp.take_along_axis(power, idx, axis=-1)
    # restrict to ±search of the candidate
    freq = idx.astype(jnp.float32) * bin_hz
    ok = (freq >= f0[..., None] * (1.0 - search)) & \
         (freq <= f0[..., None] * (1.0 + search)) & (f0[..., None] > 0)
    neigh = jnp.where(ok, neigh, -1.0)
    j = jnp.argmax(neigh, axis=-1)
    peak_bin = jnp.take_along_axis(idx, j[..., None], -1)[..., 0]
    # parabolic interpolation on log-power (pure tones interpolate better
    # in dB; guard zeros)
    logp = jnp.log(jnp.maximum(power, 1e-12))
    pm1 = jnp.clip(peak_bin - 1, 0, n_bins - 1)
    pp1 = jnp.clip(peak_bin + 1, 0, n_bins - 1)
    ym1 = jnp.take_along_axis(logp, pm1[..., None], -1)[..., 0]
    y0 = jnp.take_along_axis(logp, peak_bin[..., None], -1)[..., 0]
    yp1 = jnp.take_along_axis(logp, pp1[..., None], -1)[..., 0]
    denom = ym1 - 2 * y0 + yp1
    delta = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (ym1 - yp1) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    refined = (peak_bin.astype(jnp.float32) + delta) * bin_hz
    # keep the candidate when the window can't resolve it (<2 periods) or
    # nothing was inside the search band
    resolvable = f0 * frame_length / sr >= 2.0
    any_ok = jnp.any(ok, axis=-1)
    out = jnp.where(resolvable & any_ok, refined, f0)
    return jnp.where(f0 > 0, out, 0.0)


# ---------------------------------------------------------------------------


def _median_filter(f0: jax.Array, radius: int) -> jax.Array:
    if radius <= 2:
        return f0
    from ..ops.filters import median_filter_1d

    return median_filter_1d(f0, radius)


def nan_merge(stack: jax.Array, merge_type: str = "median") -> jax.Array:
    """nan-aware merge over the method axis (reference get_merge_func)."""
    fns = {
        "median": jnp.nanmedian,
        "mean": jnp.nanmean,
        "min": jnp.nanmin,
        "max": jnp.nanmax,
    }
    nan_stack = jnp.where(stack > 0, stack, jnp.nan)
    merged = fns.get(merge_type, jnp.nanmedian)(nan_stack, axis=0)
    return jnp.nan_to_num(merged, nan=0.0)


class PitchExtractor:
    """Method dispatch + post-processing, device-resident.

    rmvpe_params / crepe_params are Flax param trees (loaded via compat/);
    methods that need absent weights raise KeyError like the reference
    raises on a missing method (pitch_extraction.py:230-233).
    """

    def __init__(self, rmvpe_params=None, crepe_params=None, crepe_tiny_params=None,
                 dtype=jnp.float32):
        self.rmvpe_params = rmvpe_params
        self.crepe_params = crepe_params
        self.crepe_tiny_params = crepe_tiny_params
        self.dtype = dtype
        self._rmvpe_jit = None
        self._get_f0_cache: dict = {}
        self.methods: dict[str, Callable] = {
            "pm": self._pm,
            "dio": self._dio,
            "harvest": self._harvest,
            "rmvpe": self._rmvpe,
            "rmvpe+": self._rmvpe_clipped,
            "crepe": functools.partial(self._crepe, capacity="full"),
            "crepe-tiny": functools.partial(self._crepe, capacity="tiny"),
            "mangio-crepe": functools.partial(self._crepe, capacity="full", mangio=True),
            "mangio-crepe-tiny": functools.partial(self._crepe, capacity="tiny", mangio=True),
        }

    # -- individual methods ------------------------------------------------
    def _pm(self, audio, f0_min, f0_max, **kw):
        return acf_pitch(audio, f0_min=f0_min, f0_max=f0_max, voicing_threshold=0.45)

    def _dio(self, audio, f0_min, f0_max, **kw):
        # WORLD candidate-grid algorithm (pitch/world.py) + stonemask,
        # matching the reference pipeline pw.dio → pw.stonemask
        # (pitch_extraction.py:179-188)
        from .world import dio as world_dio

        f0 = world_dio(audio, f0_floor=f0_min, f0_ceil=f0_max)
        return stonemask_refine(audio, f0)

    def _harvest(self, audio, f0_min, f0_max, filter_radius=3, **kw):
        # WORLD harvest (denser candidate grid + continuity selection) +
        # stonemask (reference pitch_extraction.py:168-177). The optional
        # median pass (filter_radius > 2) is an extension the reference
        # exposes through the same signature for its other methods.
        from .world import harvest as world_harvest

        f0 = world_harvest(audio, f0_floor=f0_min, f0_ceil=f0_max)
        f0 = stonemask_refine(audio, f0)
        return _median_filter(f0, filter_radius if filter_radius > 2 else 0)

    def _rmvpe(self, audio, f0_min, f0_max, thred=0.03, **kw):
        if self._rmvpe_jit is None:
            from ..models.rmvpe import RMVPE

            model = RMVPE(dtype=self.dtype)
            self._rmvpe_jit = jax.jit(
                lambda p, a, t: model.apply(p, a, t), static_argnums=()
            )
        return self._rmvpe_jit(self.rmvpe_params, audio, jnp.float32(thred))

    def _rmvpe_clipped(self, audio, f0_min, f0_max, thred=0.03, **kw):
        return jnp.clip(self._rmvpe(audio, f0_min, f0_max, thred), f0_min, f0_max)

    def _crepe(self, audio, f0_min, f0_max, capacity="full", mangio=False,
               crepe_hop_length=160, **kw):
        from ..models import crepe as crepe_mod

        params = self.crepe_params if capacity == "full" else self.crepe_tiny_params
        hop = crepe_hop_length if mangio else HUBERT_WINDOW
        f0, pd = crepe_mod.predict(
            params, audio, hop_length=hop, fmin=f0_min, fmax=f0_max,
            capacity=capacity, decoder="weighted_argmax" if mangio else "viterbi",
            dtype=self.dtype,
        )
        if not mangio:
            # reference: median(pd,3), mean(f0,3), zero where pd<0.1 (:146-148)
            from ..ops.filters import median_filter_1d

            pd = median_filter_1d(pd, 3)
            kernel = jnp.ones(3) / 3.0
            f0 = jax.vmap(lambda row: jnp.convolve(row, kernel, mode="same"))(f0)
            f0 = jnp.where(pd < 0.1, 0.0, f0)
        if hop != HUBERT_WINDOW:
            # resize to the 100 Hz grid by linear interp (reference :109-118)
            target_len = audio.shape[-1] // HUBERT_WINDOW
            pos = jnp.linspace(0, f0.shape[-1] - 1, target_len)
            lo = jnp.floor(pos).astype(jnp.int32)
            hi = jnp.minimum(lo + 1, f0.shape[-1] - 1)
            w = pos - lo
            f0 = f0[..., lo] * (1 - w) + f0[..., hi] * w
        return f0

    # -- fused-dispatch plumbing ---------------------------------------------
    def _method_params(self, method: str):
        if method in ("rmvpe", "rmvpe+"):
            return self.rmvpe_params
        if method in ("crepe", "mangio-crepe"):
            return self.crepe_params
        if method in ("crepe-tiny", "mangio-crepe-tiny"):
            return self.crepe_tiny_params
        return {}

    def _build_method_fn(self, method: str, f0_min, f0_max, filter_radius,
                         crepe_hop_length):
        """A (params, audio) -> f0 function with weights as arguments."""
        if method in ("rmvpe", "rmvpe+"):
            from ..models.rmvpe import RMVPE

            model = RMVPE(dtype=self.dtype)

            def fn(params, a):
                f0 = model.apply(params, a, 0.03)
                if method == "rmvpe+":
                    f0 = jnp.clip(f0, f0_min, f0_max)
                return f0

            return fn
        if method.endswith("crepe") or method.endswith("crepe-tiny"):
            capacity = "tiny" if method.endswith("tiny") else "full"
            mangio = method.startswith("mangio")

            def fn(params, a):
                old_full, old_tiny = self.crepe_params, self.crepe_tiny_params
                try:
                    if capacity == "full":
                        self.crepe_params = params
                    else:
                        self.crepe_tiny_params = params
                    return self._crepe(a, f0_min, f0_max, capacity=capacity,
                                       mangio=mangio,
                                       crepe_hop_length=crepe_hop_length)
                finally:
                    self.crepe_params, self.crepe_tiny_params = old_full, old_tiny

            return fn
        impl = self.methods[method]
        return lambda params, a: impl(a, f0_min, f0_max,
                                      filter_radius=filter_radius,
                                      crepe_hop_length=crepe_hop_length)

    # -- public API ---------------------------------------------------------
    def compute(
        self,
        audio: jax.Array,
        method: str | Sequence[str] = "rmvpe",
        merge_type: str = "median",
        f0_min: float = 50.0,
        f0_max: float = 1100.0,
        **kw,
    ) -> jax.Array:
        """(B, T) 16 kHz -> f0 Hz at the 100 Hz HuBERT frame grid."""
        if isinstance(method, (list, tuple)) and len(method) == 1:
            method = method[0]
        if isinstance(method, (list, tuple)):
            outs = [self.methods[m](audio, f0_min, f0_max, **kw) for m in method]
            n = min(o.shape[-1] for o in outs)
            stack = jnp.stack([o[..., :n] for o in outs], axis=0)
            return nan_merge(stack, merge_type)
        if method not in self.methods:
            raise KeyError(f"pitch method {method!r} not found")
        return self.methods[method](audio, f0_min, f0_max, **kw)

    def get_f0(
        self,
        audio: jax.Array,
        f0_up_key: float = 0.0,
        method: str | Sequence[str] = "rmvpe",
        merge_type: str = "median",
        filter_radius: int = 3,
        crepe_hop_length: int = 160,
        f0_autotune: bool = False,
        f0_min: float = 50.0,
        f0_max: float = 1100.0,
    ) -> tuple[jax.Array, jax.Array]:
        """Returns (coarse int bins, f0 Hz) like the reference get_f0
        (pitch_extraction.py:250-304). Single-method calls run the whole
        chain (model → autotune → shift → quantize) as ONE jitted dispatch
        keyed by (method, flags) — a dozen eager dispatches otherwise."""
        if isinstance(method, str):
            # ONE jitted dispatch for the whole chain. Model weights must be
            # jit ARGUMENTS (closure capture would embed them as constants —
            # a 100 MB compile payload the remote-compile relay rejects).
            key = (method, bool(f0_autotune), filter_radius, crepe_hop_length,
                   float(f0_min), float(f0_max))
            method_params = self._method_params(method)
            if key not in self._get_f0_cache:
                method_fn = self._build_method_fn(
                    method, f0_min, f0_max, filter_radius, crepe_hop_length)

                def full(params, a, up_key):
                    f0 = method_fn(params, a)
                    if f0_autotune:
                        f0 = autotune(f0)
                    f0 = shift_semitones(f0, up_key)
                    return coarse_f0(f0, f0_min, f0_max), f0

                self._get_f0_cache[key] = jax.jit(full)
            return self._get_f0_cache[key](method_params, audio,
                                           jnp.float32(f0_up_key))
        f0 = self.compute(
            audio, method, merge_type, f0_min, f0_max,
            filter_radius=filter_radius, crepe_hop_length=crepe_hop_length,
        )
        if f0_autotune:
            f0 = autotune(f0)
        f0 = shift_semitones(f0, f0_up_key)
        return coarse_f0(f0, f0_min, f0_max), f0
