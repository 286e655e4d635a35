"""Device-time attribution of the conversion dispatch, component by
component, with the tunnel-proof timing methodology
(profile_decoder_stages): iterate INSIDE one jitted program with an
iteration-dependent input, FETCH a scalar (block_until_ready acks before
execution on the axon tunnel; only a value fetch forces completion), and
difference two iteration counts to cancel the fixed dispatch latency.

Components at the throughput bench's real shapes (B=4 chunks x 18 s):
  hubert.frontend  conv feature extractor on raw 16 kHz audio
  hubert.encoder   12 transformer layers on (B, 900, 768)
  rmvpe            mel frontend + DeepUnet + BiGRU + cents decode
  synth.enc_p      6 rel-attention layers on (B, 900, 192)
  synth.flow       4 coupling layers (reverse)
  synth.dec        NSF-HiFiGAN decode (fused resblocks)

Prints one line per component plus an MFU estimate from compiled FLOPs.
Usage: python scripts/profile_inference_components.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import functools

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rvc_tpu.models.hubert import (FeatureExtractor, HubertConfig,
                                       HubertEncoder)
    from rvc_tpu.utils.fastinit import fast_init

    def timed(apply_fn, params, *xs, n1=4, n2=12):
        @functools.partial(jax.jit, static_argnums=(2,))
        def looped(p, xx, iters):
            def body(i, acc):
                scaled = jax.tree.map(
                    lambda a: a * (1.0 + 1e-6 * i.astype(a.dtype))
                    if jnp.issubdtype(a.dtype, jnp.floating) else a, xx)
                y = apply_fn(p, *scaled)
                return acc + jnp.sum(
                    (y[0] if isinstance(y, tuple) else y).astype(jnp.float32))
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        def wall(iters):
            float(looped(params, xs, iters))  # compile + warm
            t0 = time.perf_counter()
            float(looped(params, xs, iters))
            return time.perf_counter() - t0

        t1, t2 = wall(n1), wall(n2)
        per = (t2 - t1) / (n2 - n1)
        return per

    def flops_of(apply_fn, params, *xs):
        try:
            c = jax.jit(apply_fn).lower(params, *xs).compile().cost_analysis()
            if isinstance(c, (list, tuple)):
                c = c[0]
            return float(c.get("flops", 0.0))
        except Exception:
            return 0.0

    # override to match other workloads (e.g. B=8 SEC=12 = the throughput
    # bench's true chunk shapes: 10 s songs + 2x1 s reflect pad)
    B = int(os.environ.get("RVC_PROF_B", "4"))
    SEC = float(os.environ.get("RVC_PROF_SEC", "18.0"))
    T16 = int(SEC * 16000)
    rng = np.random.default_rng(0)
    results = {}

    # ---- hubert ------------------------------------------------------------
    cfg = HubertConfig()
    hub = HubertEncoder(cfg, dtype=jnp.bfloat16)
    wav = jnp.asarray(rng.standard_normal((B, T16)), jnp.float32)
    hp = fast_init(functools.partial(hub.init, jax.random.PRNGKey(0)), wav)
    fe = FeatureExtractor(cfg, dtype=jnp.bfloat16)
    fep = {"params": hp["params"]["feature_extractor"]}
    results["hubert.full"] = (
        timed(lambda p, w: hub.apply(p, w, output_layer=12), hp, wav),
        flops_of(lambda p, w: hub.apply(p, w, output_layer=12), hp, wav))
    results["hubert.frontend"] = (
        timed(lambda p, w: fe.apply(p, w), fep, wav),
        flops_of(lambda p, w: fe.apply(p, w), fep, wav))

    # ---- rmvpe -------------------------------------------------------------
    from rvc_tpu.models.rmvpe import RMVPE

    rm = RMVPE(dtype=jnp.bfloat16)
    rp = fast_init(functools.partial(rm.init, jax.random.PRNGKey(1)), wav)
    results["rmvpe.full"] = (
        timed(lambda p, w: rm.apply(p, w), rp, wav),
        flops_of(lambda p, w: rm.apply(p, w), rp, wav))

    # ---- synthesizer components at decode shapes --------------------------
    from rvc_tpu.config import preset
    from rvc_tpu.models.synthesizer import Synthesizer

    pc = preset("48k_v2")
    synth = Synthesizer.from_config(pc.model, pc.data, pc.train.segment_size,
                                    dtype=jnp.bfloat16, fuse_resblocks=True,
                                    fuse_attention=True, fuse_group=True)
    Tf = int(SEC * 100)  # 100 Hz frames
    feat = jnp.asarray(rng.standard_normal((B, Tf, 768)), jnp.float32)
    lens = jnp.full((B,), Tf, jnp.int32)
    pitch = jnp.asarray(rng.integers(1, 255, (B, Tf)), jnp.int32)
    pitchf = jnp.asarray(rng.uniform(100, 300, (B, Tf)), jnp.float32)
    sid = jnp.zeros((B,), jnp.int32)
    sp = fast_init(functools.partial(
        synth.init, {"params": jax.random.PRNGKey(2),
                     "noise": jax.random.PRNGKey(3)},
        feat, lens, pitch, pitchf, sid, method=synth.infer), seed=2)

    def infer(p, f):
        out, *_ = synth.apply(p, f, lens, pitch, pitchf, sid,
                              method=synth.infer,
                              rngs={"noise": jax.random.PRNGKey(9)})
        return out

    results["synth.infer"] = (timed(infer, sp, feat),
                              flops_of(infer, sp, feat))

    total = 0.0
    for name, (dt, fl) in results.items():
        if name in ("hubert.full", "rmvpe.full", "synth.infer"):
            total += dt
        mfu = 100.0 * fl / (dt * 197e12) if dt > 0 else 0.0
        print(f"{name:18s} {dt*1e3:8.1f} ms   {fl/1e9:8.1f} GFLOP   "
              f"MFU {mfu:5.1f}%")
    audio_s = B * SEC
    print(f"sum(full components) {total*1e3:.1f} ms for {audio_s:.0f} s audio "
          f"-> {audio_s/total:.0f}x RT device-only")


if __name__ == "__main__":
    main()
