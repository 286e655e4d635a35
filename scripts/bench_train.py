"""Training-step benchmark on the real TPU: full-size 48k_v2 GAN step
(generator vjp + discriminator update + adaptive balancer), bf16.

Prints one JSON line (secondary metric). State is materialized via
eval_shape + host RNG — values don't affect step FLOPs/timing, and the
full flax init would cost minutes of compile. Sync per timed step is a
scalar metric readback (block_until_ready is a no-op over the tunnel).
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def bench_train_step(batch_size: int = 4, frames: int = 400, repeats: int = 5):
    from rvc_tpu.config import PRESETS
    from rvc_tpu.train.step import Trainer
    from rvc_tpu.utils.fastinit import fast_init

    cfg = PRESETS["48k_v2"]
    trainer = Trainer(cfg, dtype=jnp.bfloat16)
    hop = cfg.data.hop_length
    rng = np.random.default_rng(0)
    B, T = batch_size, frames
    batch = {
        "phone": jnp.asarray(rng.standard_normal((B, T, 768)), jnp.float32),
        "phone_lengths": jnp.full((B,), T, jnp.int32),
        "pitch": jnp.asarray(rng.integers(1, 255, (B, T)), jnp.int32),
        "pitchf": jnp.asarray(rng.uniform(100, 300, (B, T)), jnp.float32),
        "spec": jnp.asarray(
            rng.standard_normal((B, T, cfg.data.filter_length // 2 + 1)),
            jnp.float32),
        "spec_lengths": jnp.full((B,), T, jnp.int32),
        "wave": jnp.asarray(0.1 * rng.standard_normal((B, T * hop)), jnp.float32),
        "sid": jnp.zeros((B,), jnp.int32),
    }
    state = fast_init(functools.partial(trainer.init_state, jax.random.PRNGKey(0)),
                      batch)
    step = trainer.step_fn()
    t0 = time.time()
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    first = float(np.asarray(list(metrics.values())[0]))
    compile_s = time.time() - t0
    assert np.isfinite(first)
    times = []
    for i in range(repeats):
        t0 = time.time()
        state, metrics = step(state, batch, jax.random.PRNGKey(2 + i))
        float(np.asarray(list(metrics.values())[0]))
        times.append(time.time() - t0)
    best = min(times)
    audio_s = B * T * hop / cfg.data.sampling_rate
    print(json.dumps({
        "metric": "train_step_48k_v2",
        "value": round(best, 4), "unit": "s_per_step",
        "steps_per_s": round(1 / best, 2),
        "audio_x_realtime": round(audio_s / best, 1),
        "batch": B, "frames": T, "dtype": "bfloat16",
        "compile_s": round(compile_s, 1),
    }))
    return best


if __name__ == "__main__":
    bench_train_step()
