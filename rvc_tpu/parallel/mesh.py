"""Device mesh + sharding helpers.

The reference scales with one process per GPU + gloo DDP
(training_cli.py:104-121,158). TPU-native replacement: a single JAX
process owns all local chips; we build a ('dp',) Mesh over ICI, shard the
batch with NamedSharding, replicate params, and jit the train step — XLA
inserts the gradient all-reduce. Multi-host extends the same mesh over DCN
via jax.distributed.initialize (no user-visible backend knob).

A second mesh axis ('tp') is reserved for tensor-parallel sharding of the
HuBERT encoder / discriminator ensemble if model sizes ever warrant it;
RVC models are small (G ≈ 55 MB fp16) so DP is the production layout.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_dp: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_dp is None:
        n_dp = len(devices)
    return Mesh(np.asarray(devices[:n_dp]).reshape(n_dp), ("dp",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place every array in the batch pytree with its leading dim sharded
    over dp."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
