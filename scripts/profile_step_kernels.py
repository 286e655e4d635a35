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

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rvc_tpu.config import preset
    from rvc_tpu.train.step import Trainer

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
    # use the real state constructor so this census can't drift from the
    # step the bench actually runs (advisor r4)
    state = trainer.init_state(jax.random.PRNGKey(0), batch, fast_params=True)

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
    unparsed = 0
    for line in body.splitlines():
        line = line.strip()
        # match the opcode as the last identifier before '(' regardless of
        # the result shape — tuple shapes like `(f32[..], f32[..])` contain
        # spaces, which the old `\S+` shape matcher silently dropped
        mo = re.match(r"[%\w.\-]+ = (?:\([^)]*\)|\S+)\s+([\w\-]+)\(", line)
        if not mo:
            if "=" in line and "(" in line:
                unparsed += 1
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
        "unparsed_candidate_lines": unparsed,
        "top_ops": op_counts.most_common(15),
        "top_modules": mod_counts.most_common(30),
    }, indent=1))


if __name__ == "__main__":
    main()
