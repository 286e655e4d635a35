"""STFT / iSTFT as windowed-DFT matmuls (MXU-native).

Semantics match the reference's torch frontends:
  * ``spectrogram`` reproduces ``spectrogram_torch``
    (reference lib/train/mel_processing.py:47-87): reflect-pad by
    (n_fft - hop)/2, center=False, periodic Hann, magnitude with +1e-8
    under the sqrt.
  * ``stft``/``istft`` are the general complex transforms used by the
    separation models (reference lib/mdx.py:36-52, lib/karafan/tfc_tdf.py:52-82).

TPU-first design: frames are extracted with
``lax.conv_general_dilated_patches`` (a strided im2col XLA lowers well) and
multiplied against a precomputed window-folded DFT basis — one big matmul
on the MXU instead of an FFT. For n_fft up to 2048 this beats FFT-style
decompositions on TPU and fuses cleanly with downstream mel matmuls.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window, identical to torch.hann_window(win_length)."""
    n = np.arange(win_length)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    return jnp.asarray(w, dtype=dtype)


@functools.lru_cache(maxsize=None)
def _dft_basis_np(n_fft: int, win_length: int) -> tuple[np.ndarray, np.ndarray]:
    """Window-folded real-DFT basis.

    Returns (cos_basis, sin_basis), each (n_fft, n_bins) with
    n_bins = n_fft//2 + 1, such that for a frame x of length n_fft:
        real = x @ cos_basis, imag = x @ sin_basis
    matches np.fft.rfft(x * window) where the (zero-padded, centered)
    window is already folded into the basis.
    """
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    cos_b = np.cos(ang)
    sin_b = -np.sin(ang)
    # Zero-padded centered window (torch.stft semantics for win < n_fft).
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(win_length) / win_length))
    wfull = np.zeros(n_fft)
    off = (n_fft - win_length) // 2
    wfull[off : off + win_length] = w
    cos_b = cos_b * wfull[:, None]
    sin_b = sin_b * wfull[:, None]
    return cos_b.astype(np.float32), sin_b.astype(np.float32)


def frame_signal(x: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """(..., T) -> (..., n_frames, frame_length) via strided patches.

    n_frames = 1 + (T - frame_length) // hop  (no padding).

    Two lowerings: conv-patches (identity kernel, fuses well) for small
    frames, and a gather for large frames — the conv path materializes a
    frame_length² identity kernel, which for e.g. the half-second RMS
    frames (48000 samples) would be a 9 GB constant.
    """
    *lead, T = x.shape
    n_frames = 1 + (T - frame_length) // hop
    if frame_length > 4096:
        idx = jnp.arange(frame_length)[None, :] + hop * jnp.arange(n_frames)[:, None]
        return x[..., idx]
    x2 = x.reshape((-1, 1, T))
    # conv_general_dilated_patches: (N, C, T) -> (N, C*frame_length, n_frames)
    patches = jax.lax.conv_general_dilated_patches(
        x2,
        filter_shape=(frame_length,),
        window_strides=(hop,),
        padding="VALID",
    )
    patches = patches.reshape((*lead, frame_length, n_frames))
    return jnp.swapaxes(patches, -1, -2)


def stft(
    x: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    center: bool = True,
    pad_mode: str = "reflect",
) -> tuple[jax.Array, jax.Array]:
    """Real STFT. x: (..., T) -> (real, imag) each (..., n_frames, n_bins).

    Note the TPU-friendly frame-major layout (frames on the sublane axis,
    frequency bins on the lane axis) — transposed vs torch's (freq, time).
    """
    if win_length is None:
        win_length = n_fft
    if center:
        pad = n_fft // 2
        padding = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, padding, mode=pad_mode)
    frames = frame_signal(x, n_fft, hop_length)
    cos_b, sin_b = _dft_basis_np(n_fft, win_length)
    dtype = frames.dtype
    real = jnp.matmul(frames, jnp.asarray(cos_b, dtype), precision=jax.lax.Precision.HIGHEST)
    imag = jnp.matmul(frames, jnp.asarray(sin_b, dtype), precision=jax.lax.Precision.HIGHEST)
    return real, imag


@functools.lru_cache(maxsize=None)
def _idft_basis_np(n_fft: int, win_length: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse basis: (n_bins, n_fft) pair st. frame = real @ icos + imag @ isin,
    then window-multiplied and overlap-added (window folded in here)."""
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    # irfft synthesis with hermitian weights: x[n] = (1/N) Σ_k w_k (Re cos + Im' sin)
    wk = np.full((n_bins, 1), 2.0)
    wk[0] = 1.0
    if n_fft % 2 == 0:
        wk[-1] = 1.0
    icos = wk * np.cos(ang) / n_fft
    isin = -wk * np.sin(ang) / n_fft
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(win_length) / win_length))
    wfull = np.zeros(n_fft)
    off = (n_fft - win_length) // 2
    wfull[off : off + win_length] = w
    icos = icos * wfull[None, :]
    isin = isin * wfull[None, :]
    return icos.astype(np.float32), isin.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _ola_norm_np(n_fft: int, win_length: int, hop: int, n_frames: int) -> np.ndarray:
    """Squared-window overlap-add normalization buffer of length
    n_fft + hop*(n_frames-1)."""
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(win_length) / win_length))
    wfull = np.zeros(n_fft)
    off = (n_fft - win_length) // 2
    wfull[off : off + win_length] = w
    T = n_fft + hop * (n_frames - 1)
    norm = np.zeros(T)
    for i in range(n_frames):
        norm[i * hop : i * hop + n_fft] += wfull**2
    return np.maximum(norm, 1e-11).astype(np.float32)


def _overlap_add(frames: jax.Array, hop: int) -> jax.Array:
    """(..., n_frames, frame_len) -> (..., n_frames*hop + frame_len - hop).

    Expressed as a reshape + shifted adds: split each frame into
    frame_len//hop hop-sized chunks (frame_len % hop == 0 enforced by
    padding), then each chunk stream is a contiguous signal — sum the
    shifted streams. Fully vectorized, no scatter.
    """
    *lead, n_frames, frame_len = frames.shape
    pad_to = ((frame_len + hop - 1) // hop) * hop
    if pad_to != frame_len:
        frames = jnp.pad(frames, [(0, 0)] * (len(lead) + 1) + [(0, pad_to - frame_len)])
    k = pad_to // hop  # chunks per frame
    T_out = n_frames * hop + pad_to - hop
    chunks = frames.reshape(*lead, n_frames, k, hop)
    out = jnp.zeros((*lead, T_out + hop), frames.dtype)
    for j in range(k):
        stream = chunks[..., :, j, :].reshape(*lead, n_frames * hop)
        out = out.at[..., j * hop : j * hop + n_frames * hop].add(stream)
    out = out[..., : n_frames * hop + frame_len - hop]
    return out


def istft(
    real: jax.Array,
    imag: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    center: bool = True,
    length: int | None = None,
) -> jax.Array:
    """Inverse STFT with squared-window OLA normalization (torch.istft parity).

    real/imag: (..., n_frames, n_bins) -> (..., T).
    """
    if win_length is None:
        win_length = n_fft
    icos, isin = _idft_basis_np(n_fft, win_length)
    dtype = real.dtype
    frames = jnp.matmul(real, jnp.asarray(icos, dtype), precision=jax.lax.Precision.HIGHEST)
    frames = frames + jnp.matmul(
        imag, jnp.asarray(isin, dtype), precision=jax.lax.Precision.HIGHEST
    )
    n_frames = frames.shape[-2]
    sig = _overlap_add(frames, hop_length)
    norm = jnp.asarray(_ola_norm_np(n_fft, win_length, hop_length, n_frames), dtype)
    sig = sig / norm
    if center:
        sig = sig[..., n_fft // 2 : sig.shape[-1] - n_fft // 2]
    if length is not None:
        sig = sig[..., :length]
    return sig


def spectrogram(
    y: jax.Array, n_fft: int, hop_size: int, win_size: int, center: bool = False
) -> jax.Array:
    """Linear magnitude spectrogram matching reference
    ``spectrogram_torch`` (lib/train/mel_processing.py:47-87).

    y: (..., T) -> (..., n_frames, n_bins)   [frame-major layout]
    """
    y = jnp.clip(y, -1.05, 1.05)
    pad = int((n_fft - hop_size) / 2)
    padding = [(0, 0)] * (y.ndim - 1) + [(pad, pad)]
    y = jnp.pad(y, padding, mode="reflect")
    real, imag = stft(y, n_fft, hop_size, win_size, center=center)
    return jnp.sqrt(real * real + imag * imag + 1e-8)
