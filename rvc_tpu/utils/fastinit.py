"""Fast parameter materialization without compiling the init graph.

``flax.Module.init`` executes (and on TPU, compiles) the whole forward
pass just to learn parameter shapes — measured at 70–140 s per model on
the v5e tunnel. ``fast_init`` instead traces shapes with ``jax.eval_shape``
(no compile, host-only) and materializes random arrays directly. Used for
benchmarks and tests; real training uses the proper distribution-aware
``init`` once, and real inference loads converted checkpoints.
"""
from __future__ import annotations

import jax
import numpy as np


def fast_init(init_fn, *args, seed: int = 0, scale: float = 0.02, **kwargs):
    """init_fn: usually functools.partial(model.init, rngs). Returns a
    param pytree with N(0, scale²) leaves (ones for scale-like params)."""
    shapes = jax.eval_shape(init_fn, *args, **kwargs)
    rng = np.random.default_rng(seed)

    def materialize(path, sds):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        shape, dtype = sds.shape, sds.dtype
        if name in ("gamma", "weight_g", "running_var"):
            arr = np.ones(shape, dtype)
        elif name in ("beta", "running_mean", "bias"):
            arr = np.zeros(shape, dtype)
        else:
            arr = (scale * rng.standard_normal(shape)).astype(dtype)
        return jax.device_put(arr)

    return jax.tree_util.tree_map_with_path(materialize, shapes)
