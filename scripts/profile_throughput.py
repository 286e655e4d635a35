"""Throughput-mode anatomy on one chip: device compute vs tunnel download.

Runs the bench's 8x10s shipping-config batch through convert_batch and
reports device_s / download_s / dispatch_s, the FLOP count, MFU against
device time, and a pipelined steady-state rate (next dispatch issued
before the previous download is forced — what a serving deployment does).

Usage: python scripts/profile_throughput.py [n_songs]
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
    settings = ConvertSettings(f0_method="rmvpe", index_rate=0.75, protect=0.33)

    stats: dict = {}
    vc.convert_batch(songs, settings=settings, stats=stats)  # compile warmup
    best = None
    for _ in range(4):
        st: dict = {"flops": stats.get("flops", 0.0)}
        vc.convert_batch(songs, settings=settings, stats=st)
        if best is None or st["dispatch_s"] < best["dispatch_s"]:
            best = st
    flops = best.get("flops", 0.0)
    print(f"n_songs={n_songs}  audio={n_songs * song_s:.0f}s")
    print(f"device_s   {best['device_s']*1e3:8.1f} ms")
    print(f"download_s {best['download_s']*1e3:8.1f} ms "
          f"({best['download_bytes']/1e6:.1f} MB)")
    print(f"dispatch_s {best['dispatch_s']*1e3:8.1f} ms")
    if flops:
        print(f"flops      {flops/1e12:8.2f} TF")
        print(f"MFU (device_s)   {100*flops/(best['device_s']*197e12):6.2f} %")
        print(f"MFU (dispatch_s) {100*flops/(best['dispatch_s']*197e12):6.2f} %")

    # pipelined steady state: issue dispatch k+1 before forcing download k
    dispatch, finalize = vc.convert_batch(songs, settings=settings,
                                          return_async=True)
    reps = 8
    prev = dispatch()
    t0 = time.perf_counter()
    for _ in range(reps):
        cur = dispatch()
        finalize(prev)  # download overlaps cur's compute
        prev = cur
    pipe_wall = (time.perf_counter() - t0) / reps
    finalize(prev)
    print(f"pipelined/batch  {pipe_wall*1e3:8.1f} ms "
          f"-> {n_songs*song_s/pipe_wall:6.1f}x aggregate")

    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        vc.convert_batch(songs, settings=settings)
    sync_wall = (time.perf_counter() - t0) / reps
    print(f"sync per-batch   {sync_wall*1e3:8.1f} ms "
          f"-> {n_songs*song_s/sync_wall:6.1f}x aggregate")


if __name__ == "__main__":
    main()
