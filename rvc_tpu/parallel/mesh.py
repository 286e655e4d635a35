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


# ---------------------------------------------------------------------------
# 2-D (dp, tp) mesh: tensor-parallel weight sharding
# ---------------------------------------------------------------------------


def make_mesh_2d(n_dp: int, n_tp: int, devices=None) -> Mesh:
    """('dp', 'tp') mesh. Batches shard over dp; eligible weight matrices
    shard over tp (XLA inserts the all-gathers/reduce-scatters)."""
    devices = devices if devices is not None else jax.devices()
    n = n_dp * n_tp
    return Mesh(np.asarray(devices[:n]).reshape(n_dp, n_tp), ("dp", "tp"))


def tp_param_spec(leaf, n_tp: int) -> P:
    """Partition rule for torch-layout params: shard the output-channel
    axis (dim 0 of Conv (O,I,K) / Linear (O,I) / weight-norm g (O,1,..))
    over tp when divisible. Weight-norm reconstruction stays local —
    ``_norm_except_dim0`` reduces over the unsharded axes only."""
    shape = getattr(leaf, "shape", ())
    if len(shape) >= 2 and shape[0] % n_tp == 0 and shape[0] >= 2 * n_tp:
        return P("tp", *([None] * (len(shape) - 1)))
    if len(shape) == 1 and shape[0] % n_tp == 0 and shape[0] >= 2 * n_tp:
        return P("tp")
    return P()


def shard_params_tp(mesh: Mesh, tree):
    """device_put every leaf with its tp partition spec (replicated over
    dp). jit consumes the committed layouts and propagates shardings."""
    n_tp = mesh.shape["tp"]

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, tp_param_spec(x, n_tp)))

    return jax.tree_util.tree_map(put, tree)
