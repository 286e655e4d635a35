"""Per-component timing of the full-size training step on one chip.

Splits the 48k_v2 GAN step into separately-jitted pieces and times each
with block_until_ready (tunnel latency cancels across the loop), so the
next optimization target is measured, not guessed:

  g_fwd        generator forward (enc_p + enc_q + flow + slice + NSF decode)
  g_fwd_vjp    forward + pullback with unit cotangent (the G gradient path)
  disc_fwd     discriminator ensemble on (real, fake)
  d_step       full D loss + grad
  mel_fronts   spec_to_mel + mel_spectrogram of y_hat
  full_step    the shipped Trainer.step_fn

Usage: python scripts/profile_train_step.py [batch_size]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, n=6):
    import jax

    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    dts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(lambda a: a.block_until_ready(), out)
        dts.append(time.perf_counter() - t0)
    dts.sort()
    return dts[0], dts[len(dts) // 2]


def main():
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rvc_tpu.config import preset
    from rvc_tpu.ops.mel import mel_spectrogram, spec_to_mel
    from rvc_tpu.train import losses as L
    from rvc_tpu.train.step import Trainer
    from rvc_tpu.utils.fastinit import fast_init

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cfg = preset("48k_v2")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=batch_size))
    d, t = cfg.data, cfg.train

    rng = np.random.default_rng(0)
    T = 400
    spec_ch = d.filter_length // 2 + 1
    wave_len = T * d.hop_length
    batch = {
        "phone": jnp.asarray(rng.standard_normal((batch_size, T, 768)), jnp.float32),
        "phone_lengths": jnp.full((batch_size,), T, jnp.int32),
        "pitch": jnp.asarray(rng.integers(1, 255, (batch_size, T)), jnp.int32),
        "pitchf": jnp.asarray(rng.uniform(100, 300, (batch_size, T)), jnp.float32),
        "spec": jnp.asarray(rng.standard_normal((batch_size, T, spec_ch)), jnp.float32),
        "spec_lengths": jnp.full((batch_size,), T, jnp.int32),
        "wave": jnp.asarray(0.1 * rng.standard_normal((batch_size, wave_len)), jnp.float32),
        "sid": jnp.zeros((batch_size,), jnp.int32),
    }
    dtype = (jnp.bfloat16 if any(dev.platform != "cpu" for dev in jax.devices())
             else jnp.float32)
    trainer = Trainer(cfg, dtype=dtype)
    params_g = fast_init(functools.partial(
        trainer.synth.init,
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}),
        batch["phone"], batch["phone_lengths"], batch["pitch"],
        batch["pitchf"], batch["spec"], batch["spec_lengths"], batch["sid"])
    seg = jnp.zeros((batch_size, t.segment_size, 1), dtype)
    params_d = fast_init(functools.partial(
        trainer.disc.init, jax.random.PRNGKey(2)), seg, seg)

    key = jax.random.PRNGKey(7)

    def g_fwd(pg, b):
        return trainer.synth.apply(
            pg, b["phone"], b["phone_lengths"], b["pitch"], b["pitchf"],
            b["spec"], b["spec_lengths"], b["sid"], rngs={"noise": key})

    jg = jax.jit(g_fwd)
    b_, m_ = timed(jg, params_g, batch)
    print(f"g_fwd           best {b_*1e3:7.1f} ms  median {m_*1e3:7.1f} ms", flush=True)
    y_hat = jg(params_g, batch)[0]

    def g_fwd_vjp(pg, b):
        out, vjp = jax.vjp(lambda p: g_fwd(p, b)[0], pg)
        return vjp(jnp.ones_like(out))[0]

    jgv = jax.jit(g_fwd_vjp)
    b_, m_ = timed(jgv, params_g, batch)
    print(f"g_fwd+vjp       best {b_*1e3:7.1f} ms  median {m_*1e3:7.1f} ms", flush=True)

    wave_seg = jnp.zeros((batch_size, t.segment_size, 1), dtype)

    def disc_fwd(pd, fake):
        return trainer.disc.apply(pd, wave_seg, fake)

    jd = jax.jit(disc_fwd)
    b_, m_ = timed(jd, params_d, y_hat)
    print(f"disc_fwd        best {b_*1e3:7.1f} ms  median {m_*1e3:7.1f} ms", flush=True)

    def d_step(pd, fake):
        def loss(p):
            r, g_, _, _ = trainer.disc.apply(p, wave_seg, fake)
            ld, _ = L.discriminator_loss(r, g_)
            return ld
        return jax.value_and_grad(loss)(pd)

    jds = jax.jit(d_step)
    b_, m_ = timed(jds, params_d, y_hat)
    print(f"d_loss+grad     best {b_*1e3:7.1f} ms  median {m_*1e3:7.1f} ms", flush=True)

    def mels(b, yh):
        mel = spec_to_mel(b["spec"], d.filter_length, d.n_mel_channels,
                          d.sampling_rate, d.mel_fmin, d.mel_fmax)
        yhm = mel_spectrogram(yh[..., 0].astype(jnp.float32), d.filter_length,
                              d.n_mel_channels, d.sampling_rate, d.hop_length,
                              d.win_length, d.mel_fmin, d.mel_fmax)
        return mel, yhm

    jm = jax.jit(mels)
    b_, m_ = timed(jm, batch, y_hat)
    print(f"mel fronts      best {b_*1e3:7.1f} ms  median {m_*1e3:7.1f} ms", flush=True)

    from rvc_tpu.train import balancer as bal
    from rvc_tpu.train.step import TrainState, G_LOSS_KEYS, D_LOSS_KEYS

    trainer.sched_g = trainer.sched_d = lambda step: t.learning_rate
    from rvc_tpu.train.step import make_optimizer

    trainer.tx_g = make_optimizer(trainer.sched_g, t.betas, t.eps)
    trainer.tx_d = make_optimizer(trainer.sched_d, t.betas, t.eps)
    state = TrainState(
        params_g=params_g, params_d=params_d,
        opt_g=trainer.tx_g.init(params_g["params"]),
        opt_d=trainer.tx_d.init(params_d["params"]),
        step=jnp.zeros((), jnp.int32),
        balancer_g=bal.init_state(len(G_LOSS_KEYS)),
        balancer_d=bal.init_state(len(D_LOSS_KEYS)),
    )
    step = trainer.step_fn()
    state, _ = step(state, batch, key)  # compile + donate warmup
    dts = []
    for _ in range(6):
        t0 = time.perf_counter()
        state, metrics = step(state, batch, key)
        jax.tree.map(lambda a: a.block_until_ready(), metrics)
        dts.append(time.perf_counter() - t0)
    dts.sort()
    print(f"full_step       best {dts[0]*1e3:7.1f} ms  median "
          f"{dts[len(dts)//2]*1e3:7.1f} ms  ({1.0/dts[0]:.1f} steps/s best)",
          flush=True)


if __name__ == "__main__":
    main()
