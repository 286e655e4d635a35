"""Kernel-count census of the compiled training step.

The 48k_v2 GAN step is launch-bound on TPU (measured r4: ~12 us/launch).
This script AOT-compiles Trainer.step_fn and tallies the optimized HLO's
top-level computation: every non-trivial instruction in the entry module
is roughly one dispatch. Prints a JSON summary plus the top opcode and
source-module contributors so the next fusion target is measured, not
guessed.

Usage: python scripts/profile_step_kernels.py [batch_size]
"""
import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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
        "phone": jnp.asarray(rng.standard_normal((batch_size, T, 768)),
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
    params_g = fast_init(functools.partial(
        trainer.synth.init,
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}),
        batch["phone"], batch["phone_lengths"], batch["pitch"],
        batch["pitchf"], batch["spec"], batch["spec_lengths"], batch["sid"])
    seg = jnp.zeros((batch_size, t.segment_size, 1), dtype)
    params_d = fast_init(functools.partial(
        trainer.disc.init, jax.random.PRNGKey(2)), seg, seg)

    from rvc_tpu.train import balancer as bal
    from rvc_tpu.train.step import (D_LOSS_KEYS, G_LOSS_KEYS, TrainState,
                                    lr_schedule, make_optimizer)

    trainer.sched_g = lr_schedule(t.learning_rate, t.lr_decay, 100)
    trainer.sched_d = lr_schedule(t.learning_rate, t.lr_decay, 100)
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
    compiled = step.lower(state, batch, jax.random.PRNGKey(0)).compile()
    txt = compiled.as_text()

    # entry computation: between 'ENTRY' and its closing brace
    m = re.search(r"^ENTRY [^{]+\{(.*?)^\}", txt, re.S | re.M)
    body = m.group(1) if m else txt
    skip = {"parameter", "constant", "get-tuple-element", "tuple", "bitcast",
            "after-all", "partition-id", "replica-id"}
    op_counts = collections.Counter()
    mod_counts = collections.Counter()
    n = 0
    for line in body.splitlines():
        line = line.strip()
        mo = re.match(r"[%\w.\-]+ = \S+ ([\w\-]+)\(", line)
        if not mo:
            continue
        op = mo.group(1)
        if op in skip:
            continue
        n += 1
        op_counts[op] += 1
        # attribute to the jax source module via op_name metadata
        mn = re.search(r'op_name="([^"]+)"', line)
        if mn:
            parts = mn.group(1).split("/")
            # take the two most specific meaningful scopes
            key = "/".join(parts[1:3]) if len(parts) > 2 else mn.group(1)
            mod_counts[key] += 1
        else:
            mod_counts["<no-metadata>"] += 1

    print(json.dumps({
        "total_entry_instructions": n,
        "top_ops": op_counts.most_common(15),
        "top_modules": mod_counts.most_common(30),
    }, indent=1))


if __name__ == "__main__":
    main()
