"""Multichannel Wiener filtering (expectation-maximization refinement).

TPU-native equivalent of the reference's OpenUnmix-derived EM filter
(reference lib/uvr5_pack/demucs/filtering.py:336 ``wiener`` and :152
``expectation_maximization``), used by non-CaC Demucs checkpoints to
refine magnitude-estimate sources against the complex mixture STFT.

Design differences from the torch implementation (same math):
  * complex arrays instead of interleaved (..., 2) reals, so the spatial
    covariances / gains are einsums the MXU executes directly;
  * the per-300-frame EM windows of the reference's ``_wiener``
    (hdemucs.py:659, ``wiener_win_len``) become a padded (W, win, ...)
    reshape + ``lax.map`` — static shapes, no host loop;
  * the EM iteration count is a static Python int (unrolled — it is ≤ 2
    in every released config), keeping everything inside one jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _invert_hermitian(M: jax.Array) -> jax.Array:
    """Invert (..., C, C) complex matrices for C in {1, 2} analytically
    (reference filtering.py:107 ``_invert``)."""
    C = M.shape[-1]
    if C == 1:
        return 1.0 / M
    if C == 2:
        det = M[..., 0, 0] * M[..., 1, 1] - M[..., 0, 1] * M[..., 1, 0]
        inv_det = 1.0 / det
        row0 = jnp.stack([M[..., 1, 1], -M[..., 0, 1]], axis=-1)
        row1 = jnp.stack([-M[..., 1, 0], M[..., 0, 0]], axis=-1)
        return jnp.stack([row0, row1], axis=-2) * inv_det[..., None, None]
    raise NotImplementedError("only 1 or 2 channels supported")


def expectation_maximization(y: jax.Array, x: jax.Array, iterations: int,
                             eps: float = 1e-10) -> jax.Array:
    """EM refinement of source estimates (reference filtering.py:152).

    y: (T, F, C, S) complex initial source STFTs
    x: (T, F, C) complex mixture STFT
    Returns the refined y.
    """
    C = x.shape[-1]
    reg = jnp.sqrt(jnp.asarray(eps, jnp.float32)) * jnp.eye(C, dtype=y.dtype)
    for _ in range(iterations):
        # source PSD: average spectrogram over channels (T, F, S)
        v = jnp.mean(jnp.abs(y) ** 2, axis=2)
        # spatial covariance per source, frame-summed and PSD-weighted:
        # R_j = Σ_t y_j y_j^H / (eps + Σ_t v_j)  → (F, C, C, S)
        R = jnp.einsum("tfcs,tfds->fcds", y, jnp.conj(y))
        R = R / (eps + jnp.sum(v, axis=0))[:, None, None, :]
        # mixture covariance Cxx = reg + Σ_j v_j R_j → (T, F, C, C)
        Cxx = reg + jnp.einsum("tfs,fcds->tfcd", v, R)
        inv_Cxx = _invert_hermitian(Cxx)
        # Wiener gain G_j = v_j · R_j · Cxx⁻¹, sources re-estimated G_j x
        gain = jnp.einsum("fces,tfed->tfcds", R, inv_Cxx)
        gain = gain * v[:, :, None, None, :].astype(y.dtype)
        y = jnp.einsum("tfcds,tfd->tfcs", gain, x)
    return y


def wiener(mag: jax.Array, mix: jax.Array, iterations: int,
           softmask: bool = False, residual: bool = False,
           win_len: int = 300, scale_factor: float = 10.0,
           eps: float = 1e-10) -> jax.Array:
    """Wiener-based separation (reference filtering.py:336 + the 300-frame
    windowing of hdemucs.py:655-668 ``_wiener``).

    mag: (T, F, C, S) float magnitude estimates
    mix: (T, F, C) complex mixture STFT
    Returns (T, F, C, S) complex source STFTs (the residual source, when
    requested, is refined during EM but not returned — reference
    hdemucs.py:668 drops it).
    """
    T = mag.shape[0]
    n_win = max(1, -(-T // win_len))
    pad = n_win * win_len - T
    mag_w = jnp.pad(mag, ((0, pad),) + ((0, 0),) * (mag.ndim - 1))
    mix_w = jnp.pad(mix, ((0, pad),) + ((0, 0),) * (mix.ndim - 1))
    mag_w = mag_w.reshape((n_win, win_len) + mag.shape[1:])
    mix_w = mix_w.reshape((n_win, win_len) + mix.shape[1:])

    def one_window(args):
        m, x = args
        if softmask:
            ratio = m / (eps + jnp.sum(m, axis=-1, keepdims=True))
            y = x[..., None] * ratio.astype(x.dtype)
        else:
            norm = jnp.abs(x)
            unit = jnp.where(norm > 0, x / jnp.maximum(norm, 1e-30),
                             jnp.ones_like(x))
            y = m.astype(jnp.float32) * unit[..., None]
        if residual:
            res = x[..., None] - jnp.sum(y, axis=-1, keepdims=True)
            y = jnp.concatenate([y, res], axis=-1)
        if iterations == 0:
            return y
        # scale down for numerical stability (reference :461-469)
        max_abs = jnp.maximum(1.0, jnp.max(jnp.abs(x)) / scale_factor)
        y = expectation_maximization(y / max_abs, x / max_abs,
                                     iterations, eps=eps)
        return y * max_abs

    y = jax.lax.map(one_window, (mag_w, mix_w))
    S_out = mag.shape[-1] + (1 if residual else 0)
    y = y.reshape((n_win * win_len,) + mix.shape[1:] + (S_out,))[:T]
    if residual:
        y = y[..., : mag.shape[-1]]
    return y
