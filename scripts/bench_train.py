"""Training-step throughput benchmark on one chip (full-size 48k_v2 GAN).

Counterpart of the reference's epoch timing (training_cli.py logs
seconds/epoch): measures the jitted generator+discriminator step with the
48k v2 synthesizer/MPD at the reference's default batch/segment sizes and
prints ONE JSON line with steps/s and trained audio seconds per second.

Usage: python scripts/bench_train.py [batch_size] (default 4).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses

    import jax.numpy as jnp

    from rvc_tpu.config import preset
    from rvc_tpu.train.step import Trainer

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cfg = preset("48k_v2")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=batch_size))
    d, t = cfg.data, cfg.train

    rng = np.random.default_rng(0)
    T = 400  # ~3.3 s of 48 kHz audio per utterance (hop 480)
    spec_ch = d.filter_length // 2 + 1
    feat = 768  # v2 content-vec width
    wave_len = T * d.hop_length
    batch = {
        "phone": jnp.asarray(rng.standard_normal((batch_size, T, feat)),
                             jnp.float32),
        "phone_lengths": jnp.full((batch_size,), T, jnp.int32),
        "pitch": jnp.asarray(rng.integers(1, 255, (batch_size, T)), jnp.int32),
        "pitchf": jnp.asarray(rng.uniform(100, 300, (batch_size, T)),
                              jnp.float32),
        "spec": jnp.asarray(rng.standard_normal((batch_size, T, spec_ch)),
                            jnp.float32),
        "spec_lengths": jnp.full((batch_size,), T, jnp.int32),
        "wave": jnp.asarray(0.1 * rng.standard_normal((batch_size, wave_len)),
                            jnp.float32),
        "sid": jnp.zeros((batch_size,), jnp.int32),
    }

    dtype = (jnp.bfloat16 if any(dev.platform != "cpu"
                                 for dev in jax.devices()) else jnp.float32)
    trainer = Trainer(cfg, dtype=dtype)
    # the real state constructor (fast_params: eval_shape + numpy random —
    # init compiles dominate wall on 1-core hosts and the bench only needs
    # finite params)
    state = trainer.init_state(jax.random.PRNGKey(0), batch, fast_params=True)

    step = trainer.step_fn()
    state, metrics = step(state, batch, jax.random.PRNGKey(0))  # compile
    jax.block_until_ready(metrics["loss_mel"])

    n, t0 = 10, time.perf_counter()
    for i in range(n):
        state, metrics = step(state, batch, jax.random.PRNGKey(i + 1))
    jax.block_until_ready(metrics["loss_mel"])
    dt = (time.perf_counter() - t0) / n

    audio_s = batch_size * wave_len / d.sampling_rate
    print(json.dumps({
        "metric": "train_step_48k_v2_per_chip",
        "value": round(1.0 / dt, 3),
        "unit": "steps_per_s",
        "detail": {
            "batch_size": batch_size,
            "utt_seconds": round(wave_len / d.sampling_rate, 2),
            "audio_seconds_per_s": round(audio_s / dt, 2),
            "loss_mel": round(float(metrics["loss_mel"]), 3),
        },
    }))


if __name__ == "__main__":
    main()
