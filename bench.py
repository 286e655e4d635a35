"""Benchmark: RVC v2 48k voice conversion real-time factor on one chip.

Measures the SHIPPING configuration end to end: real-speech input
(assets/speech_65s.wav — committed formant-synthesized speech with voiced
harmonics, silence gaps, and wide dynamics), retrieval ON at the reference
default index_rate=0.75 against a 128k x 768 int8 bank
(ops/pallas_retrieval), full-size models (hubert-base, RMVPE, 48k_v2
synthesizer; random weights — identical FLOPs/shapes to pretrained).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is RTF / 50 (the BASELINE.json north star of ≥50× real time
per TPU v5e chip). `detail` adds: per-length best/median, the
retrieval-on vs -off delta, and a throughput mode — 8 songs' chunks in
ONE dp dispatch on this chip (aggregate RTF, fused-dispatch wall, MFU
lower bound).
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BANK_ROWS = 131072  # ≥100k rows: production-scale retrieval bank


def load_speech(seconds: float, offset_s: float = 0.0) -> np.ndarray:
    from scipy.io import wavfile

    sr, wav = wavfile.read(os.path.join(REPO, "assets", "speech_65s.wav"))
    assert sr == 16000, sr
    lo = int(offset_s * sr)
    clip = wav[lo : lo + int(seconds * sr)].astype(np.float32) / 32768.0
    assert len(clip) == int(seconds * sr), "fixture too short for this slice"
    return clip


def main():
    import jax

    cache_dir = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from rvc_tpu.pipelines.convert import ConvertSettings, make_random_converter

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    # TPU-tuned chunking: ~16 s chunks batched together (attention memory
    # scales with T² per chunk; batching chunks recovers the throughput).
    # x_pad=1 is the reference's fp32 configuration (config.py:130-135) —
    # on short clips 3 s of reflect pad per side would be 60% overhead.
    vc = make_random_converter("48k_v2", dtype=dtype, chunking=(1, 5, 16, 20),
                               index_rows=BANK_ROWS)

    sr = 16000
    # retrieval ON at the reference default (ConvertSettings.index_rate=0.75,
    # reference vc_infer_pipeline.py:60-75 — the blend is on the hot path)
    settings = ConvertSettings(f0_method="rmvpe", index_rate=0.75, protect=0.33)
    settings_noidx = ConvertSettings(f0_method="rmvpe", index_rate=0.0, protect=0.33)

    def timed_rtf(audio, s, seconds, reps=8):
        out, out_sr = vc.convert(audio, settings=s)  # warmup/compile
        assert out_sr == 48000, out_sr
        dts = []
        for _ in range(reps):  # tunnel contention is bursty; more samples
            # stabilize the best-of statistic without hiding the median
            t0 = time.perf_counter()
            vc.convert(audio, settings=s)
            dts.append(time.perf_counter() - t0)
        dts.sort()
        return seconds / dts[0], seconds / dts[len(dts) // 2]

    # BASELINE.json config #1 (one 10 s clip) AND the long-form case; the
    # reported value is the WORSE of the two (no cherry-picking the easy
    # length). best-of-N because the tunnel to the chip has bursty
    # contention; the median is reported alongside.
    detail = {"index_rate": settings.index_rate, "bank": f"{BANK_ROWS}x768 int8",
              "input": "assets/speech_65s.wav"}
    worst_best = float("inf")
    for seconds in (10.0, 60.0):
        audio = load_speech(seconds)
        best, median = timed_rtf(audio, settings, seconds)
        detail[f"rtf_{int(seconds)}s_best"] = round(best, 2)
        detail[f"rtf_{int(seconds)}s_median"] = round(median, 2)
        worst_best = min(worst_best, best)

    # retrieval-off delta (the round-2 headline mode, kept for comparison)
    best_off, _ = timed_rtf(load_speech(10.0), settings_noidx, 10.0, reps=4)
    detail["rtf_10s_best_no_index"] = round(best_off, 2)

    # --- link health: the chip is remote (tunnel); per-instance transfer
    # bandwidth and RPC latency swing measured RTF by 2x+ between VMs (the
    # morning/evening 54.9x vs 30.9x same-code spread). Record them so the
    # RTF is interpretable. Measured AFTER the warmups so the transfer
    # executables are compiled (first-fetch compile on a cold instance can
    # take minutes and is not link speed).
    probe = np.zeros(500_000, np.int16)  # 1 MB
    ups, downs = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        dev = jax.device_put(probe)
        dev.block_until_ready()
        ups.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(dev)
        downs.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(jax.device_put(np.zeros(8, np.int16)))
    detail["link_rtt_ms"] = round((time.perf_counter() - t0) / 5 * 1000, 1)
    detail["link_up_MBps"] = round(1.0 / min(ups), 1)
    detail["link_down_MBps"] = round(1.0 / min(downs), 1)

    # --- throughput mode: 8 songs' chunks in ONE dp dispatch on this chip.
    # Latency (above) leaves the chip ~99% idle behind host prep + tunnel
    # dispatch; batching songs amortizes both — this is what a TPU
    # deployment actually buys per chip.
    n_songs, song_s = 8, 10.0
    songs = [load_speech(song_s, offset_s=3.0 * i) for i in range(n_songs)]
    stats: dict = {}
    # warmup WITH stats: the FLOP count (core.lower().compile()) is a
    # second full XLA compile — pay it here, not inside a timed repeat
    vc.convert_batch(songs, settings=settings, stats=stats)
    walls = []
    for _ in range(4):
        t0 = time.perf_counter()
        vc.convert_batch(songs, settings=settings, stats=stats)
        walls.append(time.perf_counter() - t0)
    walls.sort()
    agg_rtf = n_songs * song_s / walls[0]
    detail["throughput_songs"] = n_songs
    detail["throughput_agg_rtf_best"] = round(agg_rtf, 1)
    detail["throughput_agg_rtf_median"] = round(
        n_songs * song_s / walls[len(walls) // 2], 1)
    if "dispatch_s" in stats:
        detail["throughput_dispatch_s"] = round(stats["dispatch_s"], 3)
        detail["device_share_pct"] = round(
            100.0 * stats["dispatch_s"] / walls[0], 1)
        detail["throughput_device_s"] = round(stats.get("device_s", 0.0), 3)
        detail["throughput_download_s"] = round(
            stats.get("download_s", 0.0), 3)
    if "flops" in stats and on_tpu:
        # v5e peak 197 TFLOP/s bf16. dispatch wall includes the tunnel
        # download (~0.26 s for the 9 MB int16 grid on this link) → that
        # MFU is a lower bound; device_s (block_until_ready, no download)
        # is the honest chip-efficiency number — and the download pipelines
        # away in steady-state serving (see throughput_pipelined below)
        detail["mfu_pct_lower_bound"] = round(
            100.0 * stats["flops"] / (stats["dispatch_s"] * 197e12), 2)
        if stats.get("device_s"):
            detail["mfu_pct_device"] = round(
                100.0 * stats["flops"] / (stats["device_s"] * 197e12), 2)

    # sections that errored non-fatally; surfaced LOUDLY at the top level
    # of the output JSON so a partially-failed bench can't read as green
    degraded: list = []

    # pipelined steady state: issue batch k+1's dispatch before forcing
    # batch k's download — the serving deployment pattern; the download
    # overlaps the next batch's compute (measured: 0.70 s sync -> 0.39 s
    # steady-state per batch on this link). NON-FATAL: the remote-compile
    # relay occasionally drops a connection mid-compile; a detail section
    # must never zero the round's headline JSON.
    try:
        dispatch, finalize = vc.convert_batch(songs, settings=settings,
                                              return_async=True)
        prev = dispatch()
        t0 = time.perf_counter()
        reps = 6
        for _ in range(reps):
            cur = dispatch()
            finalize(prev)
            prev = cur
        pipe_wall = (time.perf_counter() - t0) / reps
        finalize(prev)
        detail["throughput_pipelined_agg_rtf"] = round(
            n_songs * song_s / pipe_wall, 1)
    except Exception as e:  # pragma: no cover - environment transients
        detail["pipelined_error"] = f"{type(e).__name__}"[:60]
        degraded.append("pipelined")

    # --- saturation sweep: where does per-chip aggregate RTF stop scaling
    # with batch size? N=8 above was chosen, not derived; this is the
    # per-chip capacity number a deployment plans around (HBM limit for
    # bank + activations). Disable with RVC_BENCH_SWEEP=0 for quick runs.
    # Per-N NON-FATAL for the same relay-transient reason.
    if os.environ.get("RVC_BENCH_SWEEP", "1") != "0":
        sweep = {}
        for n in (4, 8, 16, 32):
            if n == n_songs:  # already measured above with more reps
                sweep[str(n)] = {
                    "agg_rtf_best": detail["throughput_agg_rtf_best"],
                    "dispatch_s": detail.get("throughput_dispatch_s"),
                    "device_s": detail.get("throughput_device_s"),
                    "mfu_pct": detail.get("mfu_pct_lower_bound"),
                }
                continue
            try:
                songs_n = [load_speech(song_s, offset_s=1.5 * i)
                           for i in range(n)]
                st: dict = {}
                vc.convert_batch(songs_n, settings=settings, stats=st)  # warm
                best_wall, best_disp = float("inf"), float("inf")
                best_dev = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    vc.convert_batch(songs_n, settings=settings, stats=st)
                    best_wall = min(best_wall, time.perf_counter() - t0)
                    best_disp = min(best_disp,
                                    st.get("dispatch_s", float("inf")))
                    best_dev = min(best_dev,
                                   st.get("device_s", float("inf")))
                entry = {"agg_rtf_best": round(n * song_s / best_wall, 1),
                         "dispatch_s": round(best_disp, 3)}
                if best_dev < float("inf"):
                    entry["device_s"] = round(best_dev, 3)
                if "flops" in st and on_tpu and best_disp > 0:
                    entry["mfu_pct"] = round(
                        100.0 * st["flops"] / (best_disp * 197e12), 2)
                sweep[str(n)] = entry
            except Exception as e:  # pragma: no cover
                sweep[str(n)] = {"error": f"{type(e).__name__}"[:60],
                                 "agg_rtf_best": 0}
                degraded.append(f"sweep_{n}")
        detail["throughput_sweep"] = sweep
        knee = max(sweep, key=lambda k: sweep[k].get("agg_rtf_best") or 0)
        detail["throughput_knee_songs"] = int(knee)

        # Fixed-vs-marginal device time: device_s wraps dispatch +
        # block_until_ready over the tunnel, so it carries a fixed
        # per-dispatch constant (RPC round trip + program launch) that no
        # local deployment pays and that in-jit iteration-differencing
        # profilers (scripts/profile_inference_components.py) confirm is
        # not compute: at N=8 the per-component sum is ~206 ms vs ~311 ms
        # dispatch-inclusive. A least-squares fit of device_s vs N
        # separates the two; mfu_pct_device_marginal charges the chip only
        # for time that scales with work. Both numbers are reported —
        # mfu_pct_device stays the dispatch-inclusive (pessimistic) bound.
        pts = [(int(k), v["device_s"]) for k, v in sweep.items()
               if isinstance(v.get("device_s"), (int, float))]
        if len(pts) >= 3:
            import numpy as _np
            ns = _np.array([p[0] for p in pts], _np.float64)
            ds = _np.array([p[1] for p in pts], _np.float64)
            A = _np.stack([ns, _np.ones_like(ns)], axis=1)
            (slope, intercept), *_ = _np.linalg.lstsq(A, ds, rcond=None)
            detail["device_s_per_song_marginal"] = round(float(slope), 4)
            detail["device_fixed_overhead_s"] = round(
                max(float(intercept), 0.0), 3)
            marg = stats.get("device_s", 0.0) - max(float(intercept), 0.0)
            if "flops" in stats and on_tpu and marg > 0:
                detail["mfu_pct_device_marginal"] = round(
                    100.0 * stats["flops"] / (marg * 197e12), 2)

    if degraded:  # loud, and top-level — not buried in detail
        print(f"WARNING: bench sections degraded: {degraded}", file=sys.stderr)
    print(json.dumps({
        "metric": "rtf_48k_rvc_v2_convert_per_chip",
        "value": round(worst_best, 2),
        "unit": "x_realtime",
        "vs_baseline": round(worst_best / 50.0, 3),
        "degraded": degraded,
        "detail": detail,
    }))


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    main()
