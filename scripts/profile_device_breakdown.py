"""Device-compute breakdown of the 60 s conversion: time HuBERT, RMVPE,
and the synthesizer decode separately (block_until_ready) on the shapes
the fused core actually sees, to target the next kernel work.

Usage: python scripts/profile_device_breakdown.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, n=6):
    out = fn(*args)
    jax_block(out)
    dts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax_block(out)
        dts.append(time.perf_counter() - t0)
    dts.sort()
    return dts[0], dts[len(dts) // 2]


def jax_block(x):
    import jax

    jax.tree.map(lambda a: a.block_until_ready(), x)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rvc_tpu.pipelines.convert import make_random_converter

    vc = make_random_converter("48k_v2", dtype=jnp.bfloat16, chunking=(1, 5, 16, 20))

    # the 60 s clip splits into ~4 chunks of ~18 s (16 s center + 2x1 s pad)
    N, L = 4, 16000 * 18
    F = L // 160
    rng = np.random.default_rng(0)
    chunks = jnp.asarray(rng.standard_normal((N, L)).astype(np.float32) * 0.1)
    lengths = jnp.full((N,), L, jnp.int32)

    hub = jax.jit(lambda p, c: vc.hubert.apply(
        p, c, version=vc.version, lengths=lengths,
        method=vc.hubert.extract_features))
    b, m = timed(hub, vc.hubert_params, chunks)
    print(f"hubert   (4x18s): best {b*1e3:7.1f} ms  median {m*1e3:7.1f} ms")
    feats = hub(vc.hubert_params, chunks)

    feats2 = jnp.repeat(feats, 2, axis=1)
    T = feats2.shape[1]
    p_len = jnp.full((N,), T, jnp.int32)
    pitch = jnp.ones((N, T), jnp.int32) * 100
    pitchf = jnp.full((N, T), 150.0, jnp.float32)
    sid = jnp.zeros((N,), jnp.int32)

    synth_fn = jax.jit(lambda p, f: vc.synth.apply(
        p, f, p_len, pitch, pitchf, sid, method=vc.synth.infer,
        rngs={"noise": jax.random.PRNGKey(0)})[0])
    b, m = timed(synth_fn, vc.synth_params, feats2)
    print(f"synth    (4x18s): best {b*1e3:7.1f} ms  median {m*1e3:7.1f} ms")

    # decode alone (flow+encoder excluded): call the generator via infer of
    # the synthesizer with tiny enc? approximate by timing full synth and
    # reporting; the generator dominates (upsampling stack).

    try:
        rp = vc.pitch._method_params("rmvpe")
    except Exception:
        rp = None
    if rp is not None:
        audio66 = jnp.asarray(rng.standard_normal(16000 * 66).astype(np.float32) * 0.1)
        f0fn = jax.jit(lambda p, a: vc.pitch._build_method_fn(
            "rmvpe", 50.0, 1100.0, 3, 160)(p, a[None]))
        b, m = timed(f0fn, rp, audio66)
        print(f"rmvpe    (66s)  : best {b*1e3:7.1f} ms  median {m*1e3:7.1f} ms")


def synth_parts():
    """Split the synthesizer: enc_p+flow vs the NSF generator decode."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rvc_tpu.pipelines.convert import make_random_converter

    vc = make_random_converter("48k_v2", dtype=jnp.bfloat16, chunking=(1, 5, 16, 20))
    N, L = 4, 16000 * 18
    T = (L // 160)  # 100 Hz frames
    rng = np.random.default_rng(0)
    feats2 = jnp.asarray(rng.standard_normal((N, T, 768)).astype(np.float32))
    p_len = jnp.full((N,), T, jnp.int32)
    pitch = jnp.ones((N, T), jnp.int32) * 100
    pitchf = jnp.full((N, T), 150.0, jnp.float32)
    sid = jnp.zeros((N,), jnp.int32)
    synth = vc.synth

    def upto_z(p, f):
        def run(m):
            g = m.emb_g(sid)[:, None, :]
            m_p, logs_p, x_mask = m.enc_p(f, pitch, p_len)
            eps = jax.random.normal(jax.random.PRNGKey(0), m_p.shape, m_p.dtype)
            z_p = (m_p + jnp.exp(logs_p) * eps * 0.66666) * x_mask
            z = m.flow(z_p, x_mask, g=g, reverse=True)
            return z * x_mask, g
        return synth.apply(p, method=run)

    f_enc = jax.jit(upto_z)
    b, m = timed(f_enc, vc.synth_params, feats2)
    print(f"enc+flow (4x18s): best {b*1e3:7.1f} ms  median {m*1e3:7.1f} ms")
    z, g = f_enc(vc.synth_params, feats2)

    def dec_only(p, zz, gg):
        return synth.apply(p, method=lambda m: m.dec(zz, pitchf, g=gg),
                           rngs={"noise": jax.random.PRNGKey(0)})

    f_dec = jax.jit(dec_only)
    b, m = timed(f_dec, vc.synth_params, z, g)
    print(f"dec NSF  (4x18s): best {b*1e3:7.1f} ms  median {m*1e3:7.1f} ms")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "parts":
        synth_parts()
    else:
        main()
