"""Break down the 10 s-clip conversion wall time: host prep, each
host->device transfer, dispatch, and download — the fixed overheads that
set the short-clip RTF (BASELINE config #1).

Usage: python scripts/profile_convert_10s.py [seconds]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(seconds: float = 10.0):
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rvc_tpu.pipelines.convert import ConvertSettings, make_random_converter

    dtype = jnp.bfloat16 if any(d.platform != "cpu" for d in jax.devices()) else jnp.float32
    vc = make_random_converter("48k_v2", dtype=dtype, chunking=(1, 5, 16, 20))
    s = ConvertSettings(f0_method="rmvpe", index_rate=0.0, protect=0.33)

    sr = 16000
    t = np.arange(int(seconds * sr)) / sr
    f0 = 180 + 40 * np.sin(2 * np.pi * 0.4 * t)
    audio = (0.4 * np.sin(2 * np.pi * np.cumsum(f0) / sr)).astype(np.float32)

    # warm up (compile)
    vc.convert(audio, settings=s)

    # --- micro-measurements of the pieces, mirroring convert() internals
    from rvc_tpu.ops.filters import butter_highpass_host
    from rvc_tpu.native import peak_quantize_i16

    for trial in range(3):
        tm = {}
        t0 = time.perf_counter()
        a = butter_highpass_host(np.asarray(audio, np.float32), 48.0, sr)
        tm["host_highpass"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        pad = vc.t_pad
        audio_pad = np.pad(a, (pad, pad), mode="reflect")
        P = len(audio_pad)
        Pb = int(np.ceil((P + 1) / 16000) * 16000)
        audio_pad_b = np.pad(audio_pad, (0, Pb - P), mode="reflect")
        tm["host_pad"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        q16, peak = peak_quantize_i16(audio_pad_b)
        tm["host_quantize"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        audio_dev = jnp.asarray(q16)
        audio_dev.block_until_ready()
        tm["upload_audio_int16"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        ints = jnp.asarray(np.zeros((3, 1), np.int32))
        ints.block_until_ready()
        tm["upload_ints"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        scal = jnp.asarray(np.zeros((5,), np.float32))
        scal.block_until_ready()
        tm["upload_scalars"] = time.perf_counter() - t0

        # whole pipeline for reference
        t0 = time.perf_counter()
        out, _ = vc.convert(audio, settings=s)
        tm["convert_total"] = time.perf_counter() - t0

        print({k: round(v * 1000, 2) for k, v in tm.items()}, "ms")
    print("audio:", seconds, "s; rtf:", round(seconds / tm["convert_total"], 2))


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 10.0)
