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
            # all 9 discriminators at 1/16 width: the full-width ensemble's
            # EXECUTION alone measured 128 s on a 1-core 8-virtual-device
            # host — the round-3 driver-timeout culprit alongside compiles
            disc_scale=1.0 / 16.0,
        ),
        train=TrainConfig(batch_size=8, segment_size=640, c_hd=0.0, c_tsi=0.0,
                          c_tefs=0.0),
    )


def _cache_stats():
    """(n_entries, total_bytes) of the persistent compile cache, so the
    dryrun output says whether a run was warm (hits) or cold (new writes)."""
    import os

    import jax

    d = jax.config.jax_compilation_cache_dir
    if not d or not os.path.isdir(d):
        return 0, 0
    sizes = [os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
             if os.path.isfile(os.path.join(d, f))]
    return len(sizes), sum(sizes)


def run_dryrun(n_devices: int) -> None:
    import time

    import jax
    import jax.numpy as jnp

    from ..train.step import Trainer
    from .mesh import make_mesh, shard_batch, replicate

    t_start = time.perf_counter()
    cache_n0, _ = _cache_stats()

    def stage(msg):
        # flushed per-stage breadcrumbs: a partial (timed-out) run must be
        # diagnosable from the driver's captured tail alone
        print(f"[dryrun +{time.perf_counter() - t_start:.0f}s] {msg}",
              flush=True)

    devices = jax.devices()
    assert len(devices) >= n_devices, f"need {n_devices} devices, have {len(devices)}"
    mesh = make_mesh(n_devices, devices)
    stage(f"stage 1/3: dp train step over {n_devices} devices — compiling")

    cfg = tiny_config()
    # ModelConfig.feature_dim is derived from version; tiny batch uses 16 dims,
    # so monkey-build the synthesizer with feature_dim=16 via a subclassed cfg.
    trainer = Trainer(cfg, dtype=jnp.float32)
    object.__setattr__(trainer.synth, "feature_dim", 16)

    batch = make_tiny_batch(n_devices * 2)
    state = trainer.init_state(jax.random.PRNGKey(0), batch, fast_params=True)

    state = replicate(mesh, state)
    batch = shard_batch(mesh, batch)

    step = trainer.step_fn()
    with mesh:
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        if k == "viz":  # TB image/audio tensors, not scalars
            continue
        val = float(v)
        assert np.isfinite(val), f"metric {k} not finite: {val}"
    assert int(new_state.step) == 1
    print(f"dryrun_multichip OK on {n_devices} devices; "
          f"loss_gen_all={float(metrics['loss_gen_all']):.3f} "
          f"loss_disc={float(metrics['loss_disc']):.3f}", flush=True)

    if n_devices >= 4:
        stage("stage 2/3: dp×tp (2×2) train step — compiling")
        _dryrun_dp_tp(trainer, make_tiny_batch(n_devices * 2), metrics)

    stage("stage 3/3: dp-sharded batch inference (retrieval ON) — compiling")
    _dryrun_inference(n_devices)
    cache_n1, cache_bytes = _cache_stats()
    wall = time.perf_counter() - t_start
    # cold vs warm is visible from the delta: a warm run writes 0 new
    # entries (all compiles were persistent-cache hits); the repo commits
    # the warmed .jax_cache_cpu entries for exactly these HLOs
    print(f"[dryrun] total wall {wall:.0f}s; compile cache: "
          f"{cache_n1 - cache_n0} new entries this run "
          f"({cache_n1} total, {cache_bytes / 1e6:.1f} MB) — "
          f"{'WARM (all cache hits)' if cache_n1 - cache_n0 == 0 else 'cold/partial'}",
          flush=True)
    stage("all stages OK")


def _dryrun_inference(n_devices: int) -> None:
    """Batch-of-songs conversion sharded over a dp mesh: N songs' chunks in
    ONE fused dispatch (pipelines/convert.py convert_batch), the chunk grid
    NamedSharding-ed over 'dp'. Tiny HuBERT + tiny synthesizer so the
    virtual-CPU compile stays cheap; validates that the inference sharding
    (not just the train step) compiles and executes under GSPMD."""
    import dataclasses

    import jax

    from ..config import RVCConfig, DataConfig, ModelConfig
    from ..models.hubert import HubertConfig
    from ..pipelines.convert import ConvertSettings, make_random_converter
    from .mesh import make_mesh

    cfg = RVCConfig(
        data=DataConfig(sampling_rate=6400, filter_length=64, hop_length=64,
                        win_length=64, n_mel_channels=16),
        model=ModelConfig(
            inter_channels=8, hidden_channels=8, filter_channels=16,
            n_heads=2, n_layers=1, kernel_size=3, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),), upsample_rates=(8, 4, 2),
            upsample_initial_channel=16, upsample_kernel_sizes=(16, 8, 4),
            gin_channels=8, spk_embed_dim=2, version="v2", use_f0=True,
        ),
    )
    # chunking in seconds: x_max=5 so the 8 s song splits into chunks
    cfg = dataclasses.replace(cfg, x_pad=1, x_query=2, x_center=3, x_max=5)
    hub = HubertConfig(hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=2, intermediate_size=64,
                       conv_dim=(32,) * 7, num_conv_pos_embeddings=16,
                       num_conv_pos_embedding_groups=4)
    # retrieval ON (the shipping configuration, reference default
    # index_rate=0.75, vc_infer_pipeline.py:60-75): a small int8 bank rides
    # the fused dispatch so the retrieval blend is validated under GSPMD
    # alongside the models — round 3 ran index_rate=0.0 here, leaving the
    # flagship multi-chip claim validating a retrieval-less mode.
    vc = make_random_converter(seed=0, hubert_cfg=hub, with_rmvpe=False,
                               config=cfg, feature_dim=32, index_rows=512)
    vc.mesh = make_mesh(n_devices, jax.devices())

    rng = np.random.default_rng(0)
    songs = [
        (0.3 * np.sin(2 * np.pi * 180 * np.arange(16000 * sec) / 16000)
         + 0.01 * rng.standard_normal(16000 * sec)).astype(np.float32)
        for sec in (8, 4)
    ]
    s = ConvertSettings(f0_method="pm", index_rate=0.75, rms_mix_rate=1.0)
    with vc.mesh:
        outs = vc.convert_batch(songs, settings=s)
    for (wav, sr), src in zip(outs, songs):
        expected = len(src) * sr // 16000
        assert wav.dtype == np.int16
        assert abs(len(wav) - expected) <= sr // 100 * 2, (len(wav), expected)
        assert int(np.abs(wav.astype(np.int32)).max()) > 0
    print(f"inference dryrun OK on {n_devices} devices; "
          f"{len(songs)} songs in one dp-sharded dispatch, "
          f"retrieval ON (index_rate={s.index_rate}, int8 bank), "
          f"outputs {[len(w) for w, _ in outs]} samples @ "
          f"{outs[0][1]} Hz", flush=True)


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
    state = trainer.init_state(jax.random.PRNGKey(0), batch, fast_params=True)
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
