"""Breakdown of per-call host/device overhead in VoiceConverter.convert
for short clips (BASELINE config #1: one 10 s clip)."""
import sys, time
sys.path.insert(0, "/root/repo")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp

from rvc_tpu.pipelines.convert import ConvertSettings, make_random_converter

DUR = float(__import__("sys").argv[1]) if len(__import__("sys").argv) > 1 else 10.0


def main():
    conv = make_random_converter("48k_v2", dtype=jnp.bfloat16,
                                 chunking=(1, 5, 16, 20))
    rng = np.random.default_rng(0)
    sr = 16000
    audio = (rng.standard_normal(int(DUR * sr)) * 0.1).astype(np.float32)
    s = ConvertSettings()

    # warm up full path
    for _ in range(2):
        out, out_sr = conv.convert(audio, sr, s)

    # timed full calls
    for trial in range(4):
        t0 = time.perf_counter()
        out, out_sr = conv.convert(audio, sr, s)
        t1 = time.perf_counter()
        print(f"full convert: {t1 - t0:.4f}s  RTF={DUR / (t1 - t0):.1f}x")

    # stage breakdown (mirrors convert() internals)
    from rvc_tpu.ops.filters import butter_highpass_host
    from rvc_tpu.pipelines.convert import find_split_points, WINDOW

    t0 = time.perf_counter()
    a = butter_highpass_host(audio, 48.0, sr)
    t1 = time.perf_counter()
    print(f"highpass host: {t1 - t0:.4f}s")

    if len(a) + WINDOW > conv.t_max:
        t0 = time.perf_counter()
        find_split_points(a, conv.t_center, conv.t_query)
        t1 = time.perf_counter()
        print(f"split points:  {t1 - t0:.4f}s")

    audio_pad = np.pad(a, (conv.t_pad, conv.t_pad), mode="reflect")
    P = len(audio_pad)
    Pb = int(np.ceil((P + 1) / 16000) * 16000)
    audio_pad_b = np.pad(audio_pad, (0, Pb - P), mode="reflect")

    t0 = time.perf_counter()
    audio_dev = jnp.asarray(audio_pad_b)
    audio_dev.block_until_ready()
    t1 = time.perf_counter()
    print(f"upload {Pb} samples: {t1 - t0:.4f}s")

    for _ in range(3):
        t0 = time.perf_counter()
        coarse, f0 = conv.pitch.get_f0(audio_dev[None], f0_up_key=s.f0_up_key,
                                       method=s.f0_method,
                                       filter_radius=s.filter_radius)
        jax.block_until_ready((coarse, f0))
        t1 = time.perf_counter()
        print(f"f0 dispatch:   {t1 - t0:.4f}s")

    # key creation
    t0 = time.perf_counter()
    k = jax.random.PRNGKey(0)
    k.block_until_ready()
    t1 = time.perf_counter()
    print(f"PRNGKey:       {t1 - t0:.4f}s")

    # null dispatch latency
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros(8)
    f(x).block_until_ready()
    for _ in range(3):
        t0 = time.perf_counter()
        f(x).block_until_ready()
        t1 = time.perf_counter()
        print(f"null dispatch: {t1 - t0:.4f}s")


if __name__ == "__main__":
    main()
