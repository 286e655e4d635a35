"""Monotonic alignment search (VITS maximum_path) as a lax.scan DP.

The reference uses the Cython ``monotonic_align`` package for the (unused
by RVC voice conversion, but present) VITS TTS SynthesizerTrn
(lib/infer_pack/models.py:1353). TPU-native equivalent of the published
algorithm: a forward DP over decoder frames (each row is a vectorized
max over the previous row and its right-shift) and a backtracking scan —
no Python loops over time inside jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e9


def maximum_path(neg_cent: jax.Array, mask: jax.Array) -> jax.Array:
    """neg_cent: (B, T_y, T_x) alignment scores (y = decoder/spec frames,
    x = text tokens); mask: same shape, 1 inside the valid (t_y, t_x)
    rectangle. Returns a hard 0/1 monotonic path of the same shape."""
    B, T_y, T_x = neg_cent.shape
    value = jnp.where(mask > 0, neg_cent, _NEG)
    t_ys = jnp.sum(mask[:, :, 0], axis=1).astype(jnp.int32)  # (B,)
    t_xs = jnp.sum(mask[:, 0, :], axis=1).astype(jnp.int32)

    xs = jnp.arange(T_x)

    def forward(carry, inp):
        prev, y = carry  # prev: (B, T_x) cumulative values of row y-1
        row = inp  # (B, T_x)
        stay = jnp.where(xs[None, :] == y, _NEG, prev)  # can't stay on x==y
        shifted = jnp.concatenate(
            [jnp.full((B, 1), _NEG, prev.dtype), prev[:, :-1]], axis=1)
        move = jnp.where((xs[None, :] == 0) & (y == 0), 0.0, shifted)
        move = jnp.where((xs[None, :] == 0) & (y > 0), _NEG, move)
        best = jnp.maximum(stay, move)
        best = jnp.where((xs[None, :] == 0) & (y == 0), 0.0, best)
        # only x ≤ y is reachable
        best = jnp.where(xs[None, :] > y, _NEG, best)
        cur = row + best
        return (cur, y + 1), cur

    init = (jnp.zeros((B, T_x), value.dtype), jnp.asarray(0, jnp.int32))
    _, vrows = jax.lax.scan(forward, init, jnp.moveaxis(value, 1, 0))
    v = jnp.moveaxis(vrows, 0, 1)  # (B, T_y, T_x) cumulative

    # backtrack from (t_y-1, t_x-1) downward
    def backward(carry, y):
        index = carry  # (B,) current x
        onehot = jax.nn.one_hot(index, T_x, dtype=neg_cent.dtype)
        active = (y < t_ys).astype(neg_cent.dtype)[:, None]
        prev_row = v[:, jnp.maximum(y - 1, 0)]  # (B, T_x)
        at_idx = jnp.take_along_axis(prev_row, index[:, None], 1)[:, 0]
        at_prev = jnp.take_along_axis(prev_row,
                                      jnp.maximum(index - 1, 0)[:, None], 1)[:, 0]
        step_down = (index > 0) & ((index == y) | (at_idx < at_prev)) & (y > 0)
        new_index = jnp.where(step_down & (y < t_ys), index - 1, index)
        return new_index, onehot * active

    ys = jnp.arange(T_y - 1, -1, -1)
    _, rows = jax.lax.scan(backward, t_xs - 1, ys)
    path = jnp.flip(jnp.moveaxis(rows, 0, 1), axis=1)  # (B, T_y, T_x)
    return path * mask
