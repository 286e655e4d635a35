"""Polyphase resampling as a dilated convolution (device-resident).

Replaces the reference's librosa.resample calls (reference
lib/audio.py:150, vc_infer_pipeline.py:186) with a Kaiser-windowed
polyphase FIR resampler that XLA lowers to a single strided conv — the
conv's taps are static so the whole thing compiles into the graph and can
fuse with the surrounding pipeline. Semantics follow
scipy.signal.resample_poly (which we test against).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as _ss


@functools.lru_cache(maxsize=None)
def _poly_filter_np(up: int, down: int, window=("kaiser", 5.0)) -> np.ndarray:
    """The FIR used by scipy.signal.resample_poly for (up, down)."""
    max_rate = max(up, down)
    f_c = 1.0 / max_rate
    half_len = 10 * max_rate
    h = _ss.firwin(2 * half_len + 1, f_c, window=window) * up
    return h.astype(np.float64)


def resample_poly(x: jax.Array, up: int, down: int) -> jax.Array:
    """scipy.signal.resample_poly semantics on device. x: (..., T)."""
    if up == down:
        return x
    g = math.gcd(up, down)
    up //= g
    down //= g
    if up == 1 and down == 1:
        return x
    h = _poly_filter_np(up, down)
    n_in = x.shape[-1]
    n_out = -(-n_in * up // down)  # ceil

    # scipy pads the filter so that the output is "centered": it prepends
    # zeros to make the group delay land on integer output samples.
    half_len = (len(h) - 1) // 2
    n_pre_pad = down - (half_len % down)
    n_post_pad = 0
    n_pre_remove = (half_len + n_pre_pad) // down
    while (
        _out_len(n_in, up, down, len(h) + n_pre_pad + n_post_pad) - n_pre_remove < n_out
    ):
        n_post_pad += 1
    hp = np.concatenate([np.zeros(n_pre_pad), h, np.zeros(n_post_pad)])

    *lead, T = x.shape
    xf = x.reshape((-1, 1, T)).astype(jnp.float32)
    # Upsample-by-zero-stuffing via lhs_dilation, then stride by `down`.
    kernel = jnp.asarray(hp[::-1].copy(), jnp.float32).reshape(1, 1, -1)
    pad_l = len(hp) - 1
    pad_r = len(hp) - 1
    y = jax.lax.conv_general_dilated(
        xf,
        kernel,
        window_strides=(down,),
        padding=[(pad_l, pad_r)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    y = y[..., n_pre_remove : n_pre_remove + n_out]
    return y.reshape((*lead, n_out)).astype(x.dtype)


def _out_len(n_in: int, up: int, down: int, n_taps: int) -> int:
    return ((n_in - 1) * up + n_taps) // down


def resample(x: jax.Array, orig_sr: int, target_sr: int) -> jax.Array:
    """Rational resample between integer sample rates."""
    if orig_sr == target_sr:
        return x
    g = math.gcd(orig_sr, target_sr)
    return resample_poly(x, target_sr // g, orig_sr // g)
