"""Phase-vocoder time stretch / pitch shift (ops/stretch.py) — functional
checks on pure tones (reference behavior: uvr5_pack/pyrb.py via
rubberband; spec_utils.py:534-550)."""
import numpy as np

import jax.numpy as jnp

from rvc_tpu.ops.stretch import pitch_shift, time_stretch


def _dominant_hz(y: np.ndarray, sr: int) -> float:
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    return float(np.argmax(spec) * sr / len(y))


def test_time_stretch_length_and_pitch():
    sr = 16000
    t = np.arange(sr * 2) / sr
    y = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    out = np.asarray(time_stretch(jnp.asarray(y), sr, 2.0))
    assert abs(len(out) - sr) <= 2  # half duration
    assert abs(_dominant_hz(out[2048:-2048], sr) - 440.0) < 5  # pitch kept
    slow = np.asarray(time_stretch(jnp.asarray(y), sr, 0.5))
    assert abs(len(slow) - 4 * sr) <= 2
    assert abs(_dominant_hz(slow[4096:-4096], sr) - 440.0) < 5


def test_pitch_shift_octave():
    sr = 16000
    t = np.arange(sr * 2) / sr
    y = np.sin(2 * np.pi * 220.0 * t).astype(np.float32)
    up = np.asarray(pitch_shift(jnp.asarray(y), sr, 12.0))
    assert up.shape == y.shape  # duration preserved
    assert abs(_dominant_hz(up[2048:-2048], sr) - 440.0) < 6
    down = np.asarray(pitch_shift(jnp.asarray(y), sr, -12.0))
    assert abs(_dominant_hz(down[2048:-2048], sr) - 110.0) < 4
    same = np.asarray(pitch_shift(jnp.asarray(y), sr, 0.0))
    np.testing.assert_array_equal(same, y)


def test_stretch_batched():
    sr = 8000
    rng = np.random.default_rng(0)
    y = (0.3 * rng.standard_normal((2, sr))).astype(np.float32)
    out = np.asarray(time_stretch(jnp.asarray(y), sr, 1.25))
    assert out.shape == (2, int(round(sr / 1.25)))
