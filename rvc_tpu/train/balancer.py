"""Adaptive loss balancer — pure-jnp port of the reference LossBalancer
(lib/train/losses.py:14-233, slope mode).

The reference mutates python-side EMA dicts every step; here the balancer
is a pure function over a small state pytree (fixed loss-key order), so it
lives *inside* the jitted train step — no host sync. Semantics preserved
(slope mode, the reference default):

  slope_k   = |w_k·L_k − ema_k| / (ema_k + ε)        (vs historical EMA)
  pareto    = 80/20 re-weighting of historical losses
  w_ratio_k = slope_k / Σ slope                       (gradient proxy)
  weight_k  = 1 + (Σ w0 − K) · (0.5·pareto_k + 0.5·w_ratio_k)
  ema update of weights, EMA update of losses (decay 0 by default → track)

Losses that are exactly 0 are skipped (weight contribution 0), matching
the reference's `loss == 0: continue`.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


class BalancerState(NamedTuple):
    ema_weights: jax.Array  # (K,)
    hist_losses: jax.Array  # (K,)
    initialized: jax.Array  # () bool


def init_state(n_losses: int) -> BalancerState:
    return BalancerState(
        ema_weights=jnp.ones((n_losses,), jnp.float32),
        hist_losses=jnp.zeros((n_losses,), jnp.float32),
        initialized=jnp.asarray(False),
    )


def _pareto_weights(hist: jax.Array, active: jax.Array, weight: float = 0.8,
                    eps: float = 1e-8) -> jax.Array:
    """80/20 normalization over historical losses (reference :94-135)."""
    k = hist.shape[0]
    losses = jnp.where(active, hist, 0.0)
    total = jnp.sum(losses)
    contrib = losses / jnp.maximum(total, eps)
    order = jnp.argsort(-contrib)
    sorted_c = contrib[order]
    cum = jnp.cumsum(sorted_c)
    top_idx = jnp.argmax(cum >= weight)
    boost_sorted = jnp.where(jnp.arange(k) <= top_idx, float(k), 1.0)
    boost = jnp.zeros((k,)).at[order].set(boost_sorted)
    normalized = losses * boost
    return normalized / (jnp.sum(normalized) + eps)


def balance(
    state: BalancerState,
    losses: jax.Array,            # (K,) raw loss values, 0 = inactive
    initial_weights: jax.Array,   # (K,) static coefficient per loss
    active: bool | jax.Array = True,
    weights_decay: float = 0.0,
    loss_decay: float = 0.0,
    use_pareto: bool = True,
    eps: float = 1e-8,
) -> tuple[jax.Array, BalancerState, jax.Array]:
    """Returns (balanced_total, new_state, weights_used)."""
    k = losses.shape[0]
    losses = losses.astype(jnp.float32)
    act = (initial_weights != 0) & (losses != 0)
    weighted = losses * initial_weights

    hist0 = jnp.where(state.initialized, state.hist_losses, losses)
    ema = jnp.where(act, hist0, weighted) + eps
    slope = jnp.abs(weighted - jnp.where(act, hist0, weighted)) / ema
    grads = jnp.where(act, jnp.maximum(slope, eps), 0.0)

    # redistribute (reference :137-159)
    inv_total_grad = 1.0 / (jnp.sum(grads) + eps)
    n_active = jnp.sum(act)
    total_initial = jnp.sum(jnp.where(act, initial_weights, 0.0)) - n_active
    w_ratio = grads * inv_total_grad
    pareto = _pareto_weights(hist0, act) if use_pareto else w_ratio
    smoothed = 0.5 * pareto + 0.5 * w_ratio
    new_weights = 1.0 + total_initial * smoothed
    # degenerate case (reference :143): all-ones when Σw0 < K
    new_weights = jnp.where(total_initial < 0, jnp.ones_like(new_weights), new_weights)
    new_weights = jnp.where(act, new_weights, state.ema_weights)

    ema_w = jnp.where(
        state.initialized,
        weights_decay * state.ema_weights + (1.0 - weights_decay) * new_weights,
        new_weights,
    )
    hist_new = jnp.where(
        state.initialized,
        jnp.where(act, loss_decay * hist0 + (1.0 - loss_decay) * losses, hist0),
        jnp.where(act, losses, 0.0),
    )
    balanced = jnp.sum(jnp.where(act, ema_w * losses, 0.0))
    passthrough = jnp.sum(jnp.where(act, initial_weights * losses, 0.0))
    active_flag = jnp.asarray(active)
    total = jnp.where(active_flag, balanced, passthrough)
    new_state = BalancerState(
        ema_weights=jnp.nan_to_num(ema_w, nan=eps),
        hist_losses=jnp.nan_to_num(hist_new, nan=eps),
        initialized=jnp.asarray(True),
    )
    return total, new_state, ema_w
