"""Native host-runtime kernels (native/rvc_host.cpp via ctypes) must make
the same decisions as their Python fallbacks: same int16 quantization,
same frame RMS (within float rounding), same slicer silence tags.
"""
import numpy as np
import pytest

from rvc_tpu import native


requires_native = pytest.mark.skipif(
    native.lib() is None, reason="no g++ / native build unavailable")


@requires_native
def test_peak_quantize_matches_numpy(rng):
    x = (0.7 * rng.standard_normal(123457)).astype(np.float32)
    q, peak = native.peak_quantize_i16(x)
    ref_peak = float(np.abs(x).max())
    scale = 32766.0 / max(ref_peak, 1e-9)
    ref = np.rint(x * scale).astype(np.int16)
    assert peak == pytest.approx(ref_peak, rel=0, abs=0)
    np.testing.assert_array_equal(q, ref)


@requires_native
def test_peak_quantize_silence():
    q, peak = native.peak_quantize_i16(np.zeros(100, np.float32))
    assert peak == 0.0
    assert not q.any()


@requires_native
def test_frame_rms_matches_numpy(rng):
    y = (0.3 * rng.standard_normal(48000)).astype(np.float32)
    frame, hop = 1280, 320
    got = native.frame_rms(y, frame, hop)
    pad = frame // 2
    yp = np.pad(y, (pad, pad))
    n_frames = 1 + (len(yp) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    ref = np.sqrt(np.mean(yp[idx] * yp[idx], axis=-1))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-6, atol=2e-7)


@requires_native
def test_frame_rms_heavy_overlap(rng):
    """hop << frame exercises the sliding-sum branch."""
    y = (0.3 * rng.standard_normal(20000)).astype(np.float32)
    frame, hop = 2048, 64
    got = native.frame_rms(y, frame, hop)
    pad = frame // 2
    yp = np.pad(y, (pad, pad))
    n_frames = 1 + (len(yp) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    ref = np.sqrt(np.mean(yp[idx] * yp[idx], axis=-1))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=5e-6, atol=5e-7)


@requires_native
def test_slicer_tags_match_python(rng, monkeypatch):
    """The native state machine and the Python loop must emit identical
    tags on realistic alternating speech/silence RMS tracks."""
    from rvc_tpu.ops.slicer import Slicer

    sl = Slicer(sr=16000, threshold=-40.0, min_length=2000, min_interval=300,
                hop_size=20, max_sil_kept=500)
    for seed in range(5):
        r = np.random.default_rng(seed)
        # blocks of "speech" (high rms) and "silence" (low rms)
        rms = []
        for _ in range(30):
            n = int(r.integers(5, 120))
            level = float(r.choice([1e-4, 5e-3, 0.05, 0.2]))
            rms.append(level * (0.5 + r.random(n)))
        rms = np.concatenate(rms).astype(np.float32)

        native_tags = native.slicer_silence_tags(
            rms, sl.threshold, sl.min_interval, sl.min_length,
            sl.max_sil_kept)
        monkeypatch.setattr(native, "lib", lambda: None)
        py_tags = sl._silence_tags(rms)
        monkeypatch.undo()
        assert native_tags == py_tags, seed


@requires_native
def test_slicer_end_to_end_same_chunks(rng):
    """Full Slicer.slice through the native path equals the Python path."""
    from rvc_tpu.ops import slicer as slicer_mod

    r = np.random.default_rng(3)
    audio = np.concatenate([
        0.3 * r.standard_normal(16000 * 2),
        1e-5 * r.standard_normal(16000),
        0.2 * r.standard_normal(16000 * 3),
        1e-5 * r.standard_normal(8000),
        0.25 * r.standard_normal(16000 * 2),
    ]).astype(np.float32)
    sl = slicer_mod.Slicer(sr=16000)
    chunks_native = sl.slice(audio)

    import unittest.mock as mock
    with mock.patch.object(native, "lib", lambda: None):
        chunks_py = sl.slice(audio)
    assert len(chunks_native) == len(chunks_py)
    for a, b in zip(chunks_native, chunks_py):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
