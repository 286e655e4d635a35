"""Training pipeline driver (reference training_cli.py:88-755 equivalent).

Single-controller JAX: one process drives all chips via the dp mesh (the
reference spawns a process per GPU with gloo DDP). Per epoch: bucketed
static-shape batches → jitted GAN step → TensorBoard scalars → periodic
Orbax checkpoints → best-model tracking (losses.json) → final fp16 .pth
export in the reference inference format.
"""
from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RVCConfig
from ..parallel.mesh import make_mesh, replicate, shard_batch
from . import convert as _  # noqa: F401  (keeps import graph warm)
from ..train.checkpoints import (
    latest_checkpoint,
    load_pretrained_g,
    merge_pretrained,
    restore_train_state,
    save_train_state,
)
from ..train.data import BucketBatcher, RVCDataset
from ..train.step import Trainer
from ..train.summaries import plot_spectrogram_to_numpy, summarize


@dataclass
class TrainRunConfig:
    model_dir: str
    filelist: str
    total_epochs: int = 100
    save_every_epoch: int = 10
    log_interval: int = 200
    n_devices: int | None = None
    pretrained_g: str | None = None
    pretrained_d: str | None = None
    export_name: str = "model"
    balancer_active: bool = True
    use_multiscale: bool = False
    log_media: bool = True  # TB spectrogram images + audio on log steps
    eval_every_n: int = 0  # hold out every n-th utterance (0 → no eval)


def train_model(config: RVCConfig, run: TrainRunConfig) -> str:
    """Runs the full training loop; returns the exported .pth path."""
    os.makedirs(run.model_dir, exist_ok=True)
    writer = None
    try:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(os.path.join(run.model_dir, "logs"))
    except Exception:
        pass

    train_list: str | list[str] = run.filelist
    eval_batcher = None
    if run.eval_every_n > 1:
        with open(run.filelist, encoding="utf-8") as f:
            lines = [ln for ln in f.read().splitlines() if ln.strip()]
        eval_lines = lines[:: run.eval_every_n]
        train_lines = [ln for i, ln in enumerate(lines)
                       if i % run.eval_every_n != 0]
        if train_lines and eval_lines:
            train_list = train_lines
            eval_ds = RVCDataset(eval_lines, config.data,
                                 use_f0=config.model.use_f0)
            eval_batcher = BucketBatcher(eval_ds, config.train.batch_size,
                                         seed=config.train.seed)

    dataset = RVCDataset(train_list, config.data, use_f0=config.model.use_f0)
    batcher = BucketBatcher(dataset, config.train.batch_size, seed=config.train.seed)
    steps_per_epoch = max(1, sum(len(v) // config.train.batch_size
                                 for v in batcher.buckets.values()))

    import math as _math

    n_dev = run.n_devices or len(jax.devices())
    n_dev = _math.gcd(n_dev, config.train.batch_size)  # batch must shard evenly
    mesh = make_mesh(n_dev)
    trainer = Trainer(config, dtype=jnp.float32, balancer_active=run.balancer_active)
    if run.use_multiscale:
        trainer.use_multiscale()

    first_batch = next(iter(batcher.epoch(0)))
    state = trainer.init_state(jax.random.PRNGKey(config.train.seed), first_batch,
                               steps_per_epoch)

    # warm start / resume
    ckpt = latest_checkpoint(run.model_dir)
    start_epoch = 0
    if ckpt is not None:
        state = restore_train_state(ckpt, state)
        start_epoch = int(state.step) // steps_per_epoch
        print(f"resumed {ckpt} at epoch {start_epoch}")
    else:
        if run.pretrained_g:
            state = state._replace(params_g={"params": merge_pretrained(
                state.params_g["params"], load_pretrained_g(run.pretrained_g))})
        if run.pretrained_d:
            state = state._replace(params_d={"params": merge_pretrained(
                state.params_d["params"], load_pretrained_g(run.pretrained_d))})

    state = replicate(mesh, state)
    step_fn = trainer.step_fn()

    best = {"loss": float("inf"), "epoch": -1}
    losses_path = os.path.join(run.model_dir, "losses.json")
    if os.path.exists(losses_path):
        best.update(json.load(open(losses_path)))

    global_step = int(jax.device_get(state.step))
    for epoch in range(start_epoch, run.total_epochs):
        t0 = time.time()
        epoch_mel = []
        for batch in batcher.epoch(epoch):
            batch = shard_batch(mesh, batch)
            with mesh:
                state, metrics = step_fn(state, batch, jax.random.PRNGKey(global_step))
            global_step += 1
            if writer and run.log_interval > 0 and global_step % run.log_interval == 0:
                viz = metrics.get("viz", {})
                m = {k: float(v) for k, v in metrics.items() if k != "viz"}
                scalars = {f"loss/{k}": v for k, v in m.items()}
                scalars["learning_rate"] = trainer.sched_g(global_step)
                images = audios = None
                if run.log_media and viz:
                    # reference training_cli.py:639-655: mel org/gen images,
                    # squared-diff heatmap, original + generated audio
                    y_mel = np.asarray(viz["y_mel"], np.float32)
                    y_hat_mel = np.asarray(viz["y_hat_mel"], np.float32)
                    images = {
                        "slice/mel_org": plot_spectrogram_to_numpy(y_mel),
                        "slice/mel_gen": plot_spectrogram_to_numpy(y_hat_mel),
                        "slice/diff^2": plot_spectrogram_to_numpy(
                            (y_mel - y_hat_mel) ** 2, cmap="hot"),
                    }
                    audios = {
                        "slice/wave_org": np.asarray(viz["wave_org"]),
                        "slice/wave_gen": np.asarray(viz["wave_gen"]),
                    }
                summarize(writer, global_step, scalars=scalars, images=images,
                          audios=audios,
                          audio_sampling_rate=config.data.sampling_rate)
            epoch_mel.append(float(metrics["loss_mel"]))
        mean_mel = float(np.mean(epoch_mel)) if epoch_mel else float("inf")
        if eval_batcher is not None:
            ev = trainer.eval_fn()
            ev_losses = []
            for batch in eval_batcher.epoch(0):  # fixed order: comparable
                batch = shard_batch(mesh, batch)
                with mesh:
                    ev_losses.append(float(ev(state.params_g, batch,
                                              jax.random.PRNGKey(0))))
            if ev_losses:
                eval_mel = float(np.mean(ev_losses))
                mean_mel = eval_mel  # best-model tracking on held-out data
                if writer:
                    writer.add_scalar("eval/loss_mel", eval_mel, global_step)
        print(f"epoch {epoch}: {time.time() - t0:.1f}s, mel={mean_mel:.3f}")

        if (epoch + 1) % run.save_every_epoch == 0 or epoch + 1 == run.total_epochs:
            save_train_state(run.model_dir, jax.device_get(state), global_step)
        if mean_mel < best["loss"]:
            best = {"loss": mean_mel, "epoch": epoch}
            json.dump(best, open(losses_path, "w"))
            _export(config, state, run, suffix="_best")

    return _export(config, state, run, suffix="")


def _export(config: RVCConfig, state, run: TrainRunConfig, suffix: str = "") -> str:
    from ..compat.torch_export import save_rvc_checkpoint

    d, m, t = config.data, config.model, config.train
    cfg_list = [
        d.spec_channels, t.segment_size // d.hop_length, m.inter_channels,
        m.hidden_channels, m.filter_channels, m.n_heads, m.n_layers, m.kernel_size,
        m.p_dropout, m.resblock, list(m.resblock_kernel_sizes),
        [list(x) for x in m.resblock_dilation_sizes], list(m.upsample_rates),
        m.upsample_initial_channel, list(m.upsample_kernel_sizes), m.spk_embed_dim,
        m.gin_channels, d.sampling_rate,
    ]
    path = os.path.join(run.model_dir, f"{run.export_name}{suffix}.pth")
    params = jax.device_get(state.params_g)
    save_rvc_checkpoint(
        path, params, cfg_list, sr=d.sampling_rate, f0=int(m.use_f0),
        version=m.version,
    )
    return path
