"""Attribute the full-dispatch device time that the per-component profiler
does not cover (the "gap"): retrieval, protect blend, and everything else
(chunk gather/dequant, f0 post-chain, frame upsample, int16 quantize).

Method: build ONE converter and time convert_batch (stats hook → device_s,
block_until_ready) under setting variants whose pairwise differences
isolate a component — the same full-core compile path the bench uses, so
the numbers subtract cleanly:

  full      rmvpe, index_rate=0.75, protect=0.33   (the bench's shipping row)
  no-index  index_rate=0                            Δ = retrieval kernel
  no-prot   protect=0.6                             Δ = protect blend
  both-off  index 0, protect 0.6                    cross-check

Each variant is re-dispatched n times; we report the min (tunnel jitter is
one-sided). Compare `full` against scripts/profile_inference_components.py
run at RVC_PROF_B=8 RVC_PROF_SEC=12 (the true chunk shapes: 10 s songs +
2x1 s reflect pad) to size the residual gap.

Usage: python scripts/profile_dispatch_gap.py [n_songs]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from scipy.io import wavfile

    from rvc_tpu.pipelines.convert import ConvertSettings, make_random_converter

    n_songs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    song_s = 10.0
    sr_, wav = wavfile.read(os.path.join(REPO, "assets", "speech_65s.wav"))
    songs = [wav[int(3.0 * i * sr_):][: int(song_s * sr_)].astype(np.float32)
             / 32768.0 for i in range(n_songs)]

    vc = make_random_converter("48k_v2", dtype=jnp.bfloat16,
                               chunking=(1, 5, 16, 20), index_rows=131072)

    variants = {
        "full":     ConvertSettings(f0_method="rmvpe", index_rate=0.75, protect=0.33),
        "no-index": ConvertSettings(f0_method="rmvpe", index_rate=0.0, protect=0.33),
        "no-prot":  ConvertSettings(f0_method="rmvpe", index_rate=0.75, protect=0.6),
        "both-off": ConvertSettings(f0_method="rmvpe", index_rate=0.0, protect=0.6),
    }

    out = {}
    for name, s in variants.items():
        best = None
        for rep in range(4):
            stats: dict = {}
            vc.convert_batch(songs, settings=s, stats=stats)
            d = stats["device_s"]
            best = d if best is None else min(best, d)
        out[name] = best
        print(f"{name:9s} device_s {best*1e3:7.1f} ms   "
              f"flops {stats.get('flops', 0)/1e12:6.2f} TF", flush=True)

    print(f"\nretrieval  Δ(full - no-index)  {1e3*(out['full']-out['no-index']):7.1f} ms")
    print(f"protect    Δ(full - no-prot)   {1e3*(out['full']-out['no-prot']):7.1f} ms")
    print(f"cross      Δ(full - both-off)  {1e3*(out['full']-out['both-off']):7.1f} ms")


if __name__ == "__main__":
    main()
