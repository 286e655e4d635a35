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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
