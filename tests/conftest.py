"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding tests run on CPU with
``--xla_force_host_platform_device_count=8`` (the JAX-native replacement
for the reference's spawn-a-process-per-GPU testing approach, cf.
reference training_cli.py:104-121 which has no test equivalent at all).
Must run before jax is imported anywhere.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# the persistent-cache AOT loader logs benign machine-feature-mismatch
# errors (pseudo-features like prefer-no-scatter) at C++ level; silence them
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: dedups identical HLO across test files in a
# single run (each file builds its own tiny-model instances → same HLO) and
# warm-starts repeat runs. Keyed on backend+flags so the CPU cache never
# collides with the TPU one (bench.py uses .jax_cache).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def finit(module, *args, rngs=None, method=None, seed=0, **kwargs):
    """Shape-traced random params (utils.fastinit) — skips compiling the
    init graph, which dominates the wall time of full-size-model tests on
    this 1-core host (e.g. RMVPE/S3FD inits: 30-60 s → <1 s). Use wherever
    a test only needs *some* finite params, not the init distribution."""
    import functools

    import jax

    from rvc_tpu.utils.fastinit import fast_init

    if rngs is None:
        rngs = jax.random.PRNGKey(0)
    if method is not None:
        kwargs["method"] = method
    return fast_init(functools.partial(module.init, rngs, **kwargs),
                     *args, seed=seed)
