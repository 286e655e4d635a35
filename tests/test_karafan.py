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
    a = np.array([[1.0, -3.0, 0.5]])
    b = np.array([[-2.0, 1.0, 0.6]])
    mx = KU.make_ensemble("Max", [a, b])
    np.testing.assert_allclose(mx, [[-2.0, -3.0, 0.6]])
    avg = KU.make_ensemble("Average", [a, b])
    np.testing.assert_allclose(avg, [[-0.5, -1.0, 0.55]])


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
    sr = 44100
    x = 0.5 * np.ones((1, sr * 3), np.float32)
    x[:, sr : 2 * sr] = 1e-5
    y = KU.silent(x, sr, threshold_db=-50)
    mid = y[:, sr + sr // 4 : 2 * sr - sr // 4]
    assert np.abs(mid).max() < 1e-6
    assert np.abs(y[:, : sr // 2]).max() > 0.4


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
    pipe = KarafanPipeline(
        music=[music_ex], vocal=[vocal_ex],
        config=KarafanConfig(high_pass=0, low_pass=22050, normalize_db=0),
    )
    out = pipe.separate(mix, sr)
    assert out["sr"] == 44100
    v = out["vocals"][0].astype(np.float32) / 32768  # mono (downmixed)
    spec = np.abs(np.fft.rfft(v))
    freqs = np.fft.rfftfreq(v.shape[-1], 1 / 44100)
    peak = freqs[np.argmax(spec)]
    assert abs(peak - 440) < 5
