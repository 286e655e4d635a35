"""Import torch Adam/AdamW optimizer state into optax — full training-resume
parity with reference G_*.pth/D_*.pth checkpoints.

The reference training checkpoint stores {model, optimizer, learning_rate,
iteration} (lib/train/utils.py:119-134); its optimizer dict is torch Adam
state: per-parameter {step, exp_avg, exp_avg_sq} keyed by param order.
optax.adamw state is ScaleByAdamState(count, mu, nu) pytrees + the weight-
decay/schedule wrappers. This module maps torch state onto an existing
optax state template by matching the torch param-group ordering against
the flattened flax tree (torch iterates parameters() in registration
order; our trees use the same module structure, so sorted state_dict paths
align 1:1 after the standard name mapping).
"""
from __future__ import annotations

from typing import Any, Mapping

import jax
import numpy as np

from .torch_import import torch_key_to_path


def torch_adam_to_optax(
    torch_ckpt: Mapping[str, Any],
    params: Mapping,
    opt_state,
):
    """Returns (new_opt_state, iteration).

    torch_ckpt: the reference training checkpoint (keys: optimizer, model,
    iteration, learning_rate). params/opt_state: the target flax params and
    an optax.adamw state built for them.
    """
    model_sd = torch_ckpt.get("model", {})
    opt_sd = torch_ckpt.get("optimizer", {})
    state = opt_sd.get("state", {})
    groups = opt_sd.get("param_groups", [])
    # torch param ids in group order == parameters() registration order ==
    # state_dict key order (for these models)
    ordered_ids: list[int] = []
    for g in groups:
        ordered_ids.extend(g.get("params", []))
    torch_keys = [k for k in model_sd.keys()]
    if len(torch_keys) != len(ordered_ids):
        raise ValueError(
            f"optimizer state has {len(ordered_ids)} params but model has "
            f"{len(torch_keys)} tensors — cannot align")

    # map: flax path -> (exp_avg, exp_avg_sq)
    moments: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}
    step = 0
    for key, pid in zip(torch_keys, ordered_ids):
        st = state.get(pid)
        if st is None:
            continue
        path = torch_key_to_path(key)
        mu = st["exp_avg"].detach().cpu().numpy()
        nu = st["exp_avg_sq"].detach().cpu().numpy()
        s = st.get("step", 0)
        step = max(step, int(s.item() if hasattr(s, "item") else s))
        moments[path] = (mu, nu)

    flat_params = _flatten(params.get("params", params))

    def fill(template_tree, which: int):
        flat_t = _flatten(template_tree)
        out = {}
        for path, leaf in flat_t.items():
            m = moments.get(path)
            if m is not None and m[which].shape == np.shape(leaf):
                out[path] = np.asarray(m[which], dtype=np.asarray(leaf).dtype)
            else:
                out[path] = np.asarray(leaf)
        return _unflatten(out)

    new_state = []
    for part in opt_state:
        if hasattr(part, "mu") and hasattr(part, "nu"):
            inner_mu = part.mu.get("params", part.mu) if isinstance(part.mu, dict) else part.mu
            inner_nu = part.nu.get("params", part.nu) if isinstance(part.nu, dict) else part.nu
            mu_new = fill(inner_mu, 0)
            nu_new = fill(inner_nu, 1)
            if isinstance(part.mu, dict) and "params" in part.mu:
                mu_new = {"params": mu_new}
                nu_new = {"params": nu_new}
            import jax.numpy as jnp

            new_state.append(part._replace(
                count=jnp.asarray(step, part.count.dtype), mu=mu_new, nu=nu_new))
        else:
            new_state.append(part)
    return tuple(new_state), int(torch_ckpt.get("iteration", step))


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat):
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return tree
