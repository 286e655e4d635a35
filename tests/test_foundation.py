"""Tests for io/audio, slicer, utils, config."""
import numpy as np

from rvc_tpu import config as cfg
from rvc_tpu.io import audio as aud
from rvc_tpu.ops.slicer import Slicer, frame_rms
from rvc_tpu.utils import get_hash, get_merge_func, ObjectNamespace


def test_config_presets():
    c = cfg.preset("40k_v2")
    assert c.data.sampling_rate == 40000
    assert c.model.upsample_rates == (10, 10, 2, 2)
    assert c.model.feature_dim == 768
    c2 = cfg.RVCConfig.from_json(c.to_json())
    assert c2.data.sampling_rate == 40000
    assert tuple(c2.model.upsample_rates) == (10, 10, 2, 2)
    assert cfg.preset("48k_v2").train.segment_size == 17280
    assert cfg.preset("32k").model.upsample_rates == (10, 4, 2, 2, 2)


def test_wav_roundtrip(tmp_path, rng):
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(8000) / 16000)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    aud.save_input_audio(p, (x, 16000))
    y, sr = aud.load_input_audio(p)
    assert sr == 16000
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_remix_resample_downmix(rng):
    stereo = rng.standard_normal((2, 44100)).astype(np.float32)
    mono, sr = aud.remix_audio((stereo, 44100), target_sr=16000)
    assert sr == 16000
    assert mono.ndim == 1
    assert abs(len(mono) - 16000) <= 2


def test_remix_int16(rng):
    x = rng.standard_normal(1000).astype(np.float32) * 2.0
    y, _ = aud.remix_audio((x, 16000), to_int16=True)
    assert y.dtype == np.int16
    assert np.abs(y).max() < aud.MAX_INT16


def test_bytes_codecs(rng):
    x = (0.3 * rng.standard_normal(4000)).astype(np.float32)
    data = aud.audio_to_bytes(x, 16000)
    y, sr = aud.bytes_to_audio(data)
    assert sr == 16000
    np.testing.assert_allclose(y, x, atol=1e-4)
    s = aud.audio2str(x, 22050)
    z, sr2 = aud.str2audio(s)
    assert sr2 == 22050
    np.testing.assert_array_equal(z, x)


def test_autotune_f0():
    f0 = np.array([0.0, 66.0, 440.5, 1000.0], dtype=np.float32)
    out = aud.autotune_f0(f0)
    assert abs(out[1] - 65.40639) < 0.01
    assert abs(out[2] - 440.0) < 0.01
    # 1000 Hz → nearest of B5 (987.77) / C6 (1046.5)
    assert abs(out[3] - 987.77) < 0.5


def test_pad_and_merge(rng):
    a = rng.standard_normal(100).astype(np.float32)
    b = rng.standard_normal(80).astype(np.float32)
    st = aud.pad_audio(a, b)
    assert st.shape == (2, 100)
    np.testing.assert_array_equal(st[1, 80:], 0)
    mixed, sr = aud.merge_audio((a, 16000), (b, 16000), sr=16000)
    assert sr == 16000


def test_hz_to_mel():
    assert abs(aud.hz_to_mel(700.0) - 2595.0 * np.log10(2.0)) < 1e-6


def test_slicer_cuts_silence(rng):
    sr = 16000
    voiced1 = 0.5 * rng.standard_normal(sr * 6)
    silence = np.zeros(sr * 2)
    voiced2 = 0.5 * rng.standard_normal(sr * 6)
    x = np.concatenate([voiced1, silence, voiced2]).astype(np.float32)
    chunks = Slicer(
        sr=sr, threshold=-40.0, min_length=3000, min_interval=300, max_sil_kept=300
    ).slice(x)
    assert len(chunks) == 2
    total = sum(c.shape[-1] for c in chunks)
    assert total < len(x)  # middle silence trimmed (only max_sil_kept retained)
    assert total > len(x) - sr * 2.5


def test_slicer_short_passthrough(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    chunks = Slicer(sr=16000).slice(x)
    assert len(chunks) == 1


def test_frame_rms_matches_librosa_semantics(rng):
    y = rng.standard_normal(5000).astype(np.float64)
    r = frame_rms(y, 320, 80)
    pad = 160
    yp = np.pad(y, pad)
    ref = np.sqrt(np.mean(yp[:320] ** 2))
    assert abs(r[0] - ref) < 1e-9


def test_utils():
    assert get_hash(1, "a") == get_hash(1, "a")
    assert get_hash(1) != get_hash(2)
    assert get_merge_func("median") is np.nanmedian
    ns = ObjectNamespace(a=1)
    ns.b = 2
    assert ns.a == 1 and ns["b"] == 2
