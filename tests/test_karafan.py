"""Karafan ensemble pipeline + utils tests (synthetic extractors)."""
import numpy as np
import pytest

from rvc_tpu.ops import karafan_utils as KU
from rvc_tpu.pipelines.karafan import KarafanConfig, KarafanPipeline, bigshifts_demix


def test_normalize():
    x = np.array([[0.5, -2.0]], np.float32)
    y = KU.normalize(x, -1.0)
    assert abs(np.abs(y).max() - 10 ** (-1 / 20)) < 1e-6


def test_make_ensemble_max_and_avg():
    """Spectral-domain Max (reference Make_Ensemble:305-354 — per-TF-bin
    magnitude select at n_fft=6144/hop=1024) and pad-to-longest Average."""
    sr = 44100
    t = np.arange(sr * 2) / sr
    a = np.stack([np.sin(2 * np.pi * 440 * t)] * 2).astype(np.float32)
    b = np.stack([0.3 * np.sin(2 * np.pi * 440 * t)] * 2).astype(np.float32)
    hi = np.stack([0.8 * np.sin(2 * np.pi * 5000 * t)] * 2).astype(np.float32)

    def tone_amp(x, f):
        spec = np.abs(np.fft.rfft(x[0]))
        freqs = np.fft.rfftfreq(x.shape[-1], 1 / sr)
        return spec[np.abs(freqs - f) < 30].max() / (x.shape[-1] / 2)

    # same tone, different levels: Max keeps the louder one
    mx = KU.make_ensemble("Max", [b, a])
    assert abs(tone_amp(mx, 440) - 1.0) < 0.05
    # disjoint bands: Max keeps both (per-bin union)
    mx2 = KU.make_ensemble("Max", [a, hi])
    assert abs(tone_amp(mx2, 440) - 1.0) < 0.05
    assert abs(tone_amp(mx2, 5000) - 0.8) < 0.05

    # Average: zero-pads to the longest input then means (reference :311-331)
    avg = KU.make_ensemble("Average", [a, a[..., : sr // 2]])
    assert avg.shape[-1] == a.shape[-1]
    np.testing.assert_allclose(avg[..., : sr // 2], a[..., : sr // 2], atol=1e-6)
    np.testing.assert_allclose(avg[..., sr // 2 :], 0.5 * a[..., sr // 2 :], atol=1e-6)


def test_stft_istft_roundtrip():
    """stft_l/istft_l (librosa semantics): iSTFT(STFT(x)) reconstructs the
    first hop*(frames-1) samples."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 44100)).astype(np.float32)
    y = KU.istft_l(KU.stft_l(x))
    n = y.shape[-1]
    assert n == 1024 * (x.shape[-1] // 1024)
    np.testing.assert_allclose(y, x[..., :n], atol=1e-4)


def test_pass_filter():
    sr = 44100
    t = np.arange(sr) / sr
    x = (np.sin(2 * np.pi * 50 * t) + np.sin(2 * np.pi * 5000 * t)).astype(np.float32)
    hp = KU.pass_filter("highpass", 500, x, sr, order=8)
    # 50 Hz should be strongly attenuated
    lo = np.abs(np.fft.rfft(hp)[50])
    hi = np.abs(np.fft.rfft(hp)[5000])
    assert hi / max(lo, 1e-9) > 100


def test_silent_gates_quiet_region():
    """Reference-geometry Silent (audio_utils.Silent:109-167): the gated
    region anchors at the LAST LOUD 0.5 s window before the silence, so for
    loud [0,1s) / quiet [1,2s) / loud [2,3s): fade-out [0.5,0.8]s, zeros
    [0.8,1.7]s, fade-in [1.7,2.0]s."""
    sr = 44100
    x = 0.5 * np.ones((1, sr * 3), np.float32)
    x[:, sr : 2 * sr] = 1e-5
    y = KU.silent(x, sr, threshold_db=-50)
    zeroed = y[:, int(0.85 * sr) : int(1.65 * sr)]
    assert np.abs(zeroed).max() == 0.0
    assert np.abs(y[:, : sr // 2]).max() > 0.4  # loud head untouched
    # fade-out ramps the end of the loud region down into the gate
    assert 0.0 < y[0, int(0.65 * sr)] < 0.5


def test_sdr():
    ref = np.random.default_rng(0).standard_normal((2, 1000)).astype(np.float32)
    assert KU.sdr(ref, ref).min() > 60
    assert KU.sdr(ref, np.zeros_like(ref)).max() < 1


def test_bigshifts_identity_extractor():
    mix = np.random.default_rng(0).standard_normal((2, 44100 * 4)).astype(np.float32)
    out = bigshifts_demix(mix, lambda m: m * 0.5, bigshifts=3)
    np.testing.assert_allclose(out, 0.5 * mix[..., : out.shape[-1]], atol=1e-6)


def test_karafan_recipe_synthetic():
    """With ideal extractors, the recipe reconstructs vocals/instrumentals."""
    sr = 44100
    t = np.arange(sr * 2) / sr
    vocals = 0.4 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    music = 0.4 * np.sin(2 * np.pi * 110 * t).astype(np.float32)
    mix = np.stack([vocals + music] * 2)
    # "perfect" extractors: music model isolates music; the vocal model then
    # sees a vocals-only residual, which it passes through
    vocal_ex = lambda m: m  # noqa: E731
    music_ex = lambda m: np.stack([music] * 2)[..., : m.shape[-1]]  # noqa: E731
    # denoise=False: these ideal extractors ignore the input's sign, so the
    # ±phase denoise pair (which assumes sign-equivariant models) cancels them
    pipe = KarafanPipeline(
        music=[music_ex], vocal=[vocal_ex],
        config=KarafanConfig(high_pass=0, low_pass=22050, normalize_db=0,
                             denoise=False),
    )
    out = pipe.separate(mix, sr)
    assert out["sr"] == 44100
    v = out["vocals"][0].astype(np.float32) / 32768  # mono (downmixed)
    spec = np.abs(np.fft.rfft(v))
    freqs = np.fft.rfftfreq(v.shape[-1], 1 / 44100)
    peak = freqs[np.argmax(spec)]
    assert abs(peak - 440) < 5


def test_srs_shift_roundtrip():
    """DOWN then UP restores the signal (reference Change_sample_rate)."""
    sr = 44100
    t = np.arange(sr) / sr
    x = np.stack([np.sin(2 * np.pi * 440 * t)] * 2).astype(np.float32)
    down = KU.srs_shift(x, "DOWN", 22050, 14700 + 1220)
    assert down.shape[-1] > x.shape[-1]  # content shifted down = longer
    up = KU.srs_shift(down, "UP", 22050, 14700 + 1220)
    n = min(up.shape[-1], x.shape[-1])
    assert np.abs(up[..., 100 : n - 100] - x[..., 100 : n - 100]).max() < 5e-3


def test_linkwitz_riley_crossover_sums_flat():
    """LR lowpass + highpass legs at the same cutoff reconstruct the input
    (the property the recipe's 16 kHz band blend relies on)."""
    sr = 44100
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, sr)).astype(np.float32)
    lo = KU.linkwitz_riley("lowpass", 16000, x, sr, order=12)
    hi = KU.linkwitz_riley("highpass", 16000, x, sr, order=12)
    err = np.abs((lo + hi) - x)[:, 1000:-1000]
    assert err.max() < 2e-2


def test_extract_with_model_srs_recovers_high_band():
    """A band-limited 'model' (14.7 kHz cutoff) + SRS: the high-SRS pass
    must recover content above the model's cutoff for a music stem
    (reference Extract_with_Model :597-651)."""
    from rvc_tpu.pipelines.karafan import KarafanModel, extract_with_model

    sr = 44100
    t = np.arange(sr * 2) / sr
    # mix: 1 kHz (in band) + 18 kHz (above the model's band)
    x = (0.5 * np.sin(2 * np.pi * 1000 * t)
         + 0.5 * np.sin(2 * np.pi * 18000 * t)).astype(np.float32)
    mix = np.stack([x, x])

    def band_limited(m):  # the "model": passes only content below 14.7 kHz
        return KU.pass_filter("lowpass", 14700, m, sr, order=100)

    model = KarafanModel(band_limited, name="kim", cut_off=14700)
    plain = extract_with_model("music", mix, model, denoise=False)
    srs = extract_with_model("music", mix, model, bigshifts_srs=1,
                             denoise=False)

    def band_energy(a, f):
        spec = np.abs(np.fft.rfft(a[0]))
        freqs = np.fft.rfftfreq(a.shape[-1], 1 / sr)
        return spec[np.abs(freqs - f) < 50].max()

    n = min(plain.shape[-1], srs.shape[-1])
    assert band_energy(srs[..., :n], 18000) > 20 * band_energy(plain[..., :n], 18000)
    # in-band content survives the crossover blend
    assert band_energy(srs, 1000) > 0.5 * band_energy(mix, 1000)


def test_extract_with_model_denoise_cancels_odd_noise():
    """The ±phase 2-pass: noise that flips sign with the input's sign
    pattern is removed (reference :583-588 'the MDX noise is out of
    phase and gets removed')."""
    from rvc_tpu.pipelines.karafan import KarafanModel, extract_with_model

    sr = 44100
    rng = np.random.default_rng(3)
    mix = np.stack([rng.standard_normal(sr).astype(np.float32)] * 2)
    noise = 0.1 * np.sin(2 * np.pi * 3000 * np.arange(sr) / sr).astype(np.float32)

    def noisy(m):  # additive noise independent of input sign
        return 0.5 * m + noise

    model = KarafanModel(noisy, name="n")
    den = extract_with_model("music", mix, model, denoise=True)
    raw = noisy(mix)
    spec_raw = np.abs(np.fft.rfft(raw[0]))[3000]
    spec_den = np.abs(np.fft.rfft(den[0][:sr]))[3000]
    assert spec_den < 0.05 * spec_raw


def test_stem_cache_hits(tmp_path):
    """GOD-MODE disk cache: second run with identical settings must not
    call the extractor again; changed settings must re-extract."""
    from rvc_tpu.pipelines.karafan import KarafanConfig, KarafanModel, KarafanPipeline

    sr = 44100
    rng = np.random.default_rng(1)
    mix = np.stack([rng.standard_normal(sr).astype(np.float32)] * 2)
    calls = {"n": 0}

    def ex(m):
        calls["n"] += 1
        return 0.5 * m

    cfg = KarafanConfig(high_pass=0, low_pass=22050, normalize_db=0,
                        denoise=False, cache_dir=str(tmp_path))
    pipe = KarafanPipeline(vocal=[KarafanModel(ex, name="v")], config=cfg)
    out1 = pipe.separate(mix, sr)
    n_first = calls["n"]
    assert n_first >= 1
    out2 = pipe.separate(mix, sr)
    assert calls["n"] == n_first  # served from cache
    np.testing.assert_array_equal(out1["vocals"][0], out2["vocals"][0])
    # changing extraction settings invalidates the key
    pipe.config.denoise = True
    pipe.separate(mix, sr)
    assert calls["n"] > n_first
