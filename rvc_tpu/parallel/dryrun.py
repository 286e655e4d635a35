"""Multi-chip dry run: one dp-sharded GAN training step on tiny shapes.

Used by __graft_entry__.dryrun_multichip — the driver runs it with N
virtual CPU devices to validate that the full training step (generator
vjp, discriminator update, balancer state, optimizers) compiles and
executes under a real Mesh with NamedSharding-ed batches and replicated
params.
"""
from __future__ import annotations

import numpy as np


def make_tiny_batch(n: int, seed: int = 0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    T = 24
    seg = 640  # segment_size for the tiny config
    hop = 64
    spec_ch = 33
    feat = 16
    wave_len = T * hop + seg
    return {
        "phone": jnp.asarray(rng.standard_normal((n, T, feat)).astype(np.float32)),
        "phone_lengths": jnp.full((n,), T, jnp.int32),
        "pitch": jnp.asarray(rng.integers(1, 255, (n, T)).astype(np.int32)),
        "pitchf": jnp.asarray(rng.uniform(100, 300, (n, T)).astype(np.float32)),
        "spec": jnp.asarray(rng.standard_normal((n, T, spec_ch)).astype(np.float32)),
        "spec_lengths": jnp.full((n,), T, jnp.int32),
        "wave": jnp.asarray(
            (0.1 * rng.standard_normal((n, wave_len))).astype(np.float32)
        ),
        "sid": jnp.zeros((n,), jnp.int32),
    }


def tiny_config():
    from ..config import RVCConfig, DataConfig, ModelConfig, TrainConfig

    return RVCConfig(
        data=DataConfig(sampling_rate=6400, filter_length=64, hop_length=64,
                        win_length=64, n_mel_channels=16),
        model=ModelConfig(
            inter_channels=8, hidden_channels=8, filter_channels=16, n_heads=2,
            n_layers=1, kernel_size=3, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),), upsample_rates=(8, 4, 2),
            upsample_initial_channel=16, upsample_kernel_sizes=(16, 8, 4),
            gin_channels=8, spk_embed_dim=2, version="v2", use_f0=True,
        ),
        train=TrainConfig(batch_size=8, segment_size=640, c_hd=0.0, c_tsi=0.0,
                          c_tefs=0.0),
    )


def run_dryrun(n_devices: int) -> None:
    import jax
    import jax.numpy as jnp

    from ..train.step import Trainer
    from .mesh import make_mesh, shard_batch, replicate

    devices = jax.devices()
    assert len(devices) >= n_devices, f"need {n_devices} devices, have {len(devices)}"
    mesh = make_mesh(n_devices, devices)

    cfg = tiny_config()
    # ModelConfig.feature_dim is derived from version; tiny batch uses 16 dims,
    # so monkey-build the synthesizer with feature_dim=16 via a subclassed cfg.
    trainer = Trainer(cfg, dtype=jnp.float32)
    object.__setattr__(trainer.synth, "feature_dim", 16)

    batch = make_tiny_batch(n_devices * 2)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    state = replicate(mesh, state)
    batch = shard_batch(mesh, batch)

    step = trainer.step_fn()
    with mesh:
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        val = float(v)
        assert np.isfinite(val), f"metric {k} not finite: {val}"
    assert int(new_state.step) == 1
    print(f"dryrun_multichip OK on {n_devices} devices; "
          f"loss_gen_all={float(metrics['loss_gen_all']):.3f} "
          f"loss_disc={float(metrics['loss_disc']):.3f}")

    if n_devices >= 4:
        _dryrun_dp_tp(trainer, make_tiny_batch(n_devices * 2), metrics)


def _dryrun_dp_tp(trainer, batch, ref_metrics) -> None:
    """The same step and batch over a 2-D (dp, tp) mesh: batch sharded
    over dp, weight matrices sharded over tp (mesh.shard_params_tp) —
    GSPMD inserts the collectives. Losses must match the replicated run
    bit-for-bit-ish. Runs on a fixed 2×2 submesh so the compile cost
    stays bounded at any device count."""
    import jax
    import numpy as np

    from .mesh import make_mesh_2d, shard_batch, shard_params_tp

    mesh2 = make_mesh_2d(2, 2, jax.devices())
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state = shard_params_tp(mesh2, state)
    batch = shard_batch(mesh2, batch)
    step = trainer.step_fn()
    with mesh2:
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    n_sharded = 0

    def count(x):
        nonlocal n_sharded
        spec = getattr(getattr(x, "sharding", None), "spec", None)
        if spec and any(s == "tp" for s in spec):
            n_sharded += 1
        return x

    jax.tree_util.tree_map(count, new_state.params_g)
    for k in ("loss_gen_all", "loss_disc"):
        a, b = float(metrics[k]), float(ref_metrics[k])
        assert np.isfinite(a)
        assert abs(a - b) < 1e-2 * max(1.0, abs(b)), (k, a, b)
    print(f"dp×tp mesh (2×2) OK; {n_sharded} generator "
          f"params tp-sharded; losses match the replicated run")
