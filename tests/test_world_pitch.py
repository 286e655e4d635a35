"""WORLD-style dio/harvest candidate-grid structure tests.

Accuracy on speech-like signals is gated by tests/test_f0_golden.py (which
runs the full dio/harvest → stonemask pipelines); these tests pin the
candidate-grid MECHANICS of pitch/world.py: the band gate, the
deviation-scored selection, and the Viterbi continuity pass.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from rvc_tpu.pitch.world import (
    _band_candidates,
    _nuttall_bank,
    dio,
    harvest,
)

SR = 16000


def tone(f0_hz, seconds=0.6, harmonics=3):
    t = np.arange(int(SR * seconds)) / SR
    x = sum((0.4 / (h + 1)) * np.sin(2 * np.pi * f0_hz * (h + 1) * t)
            for h in range(harmonics))
    return x.astype(np.float32)


def test_nuttall_bank_shapes_and_gain():
    kernels, boundaries = _nuttall_bank(SR, 50.0, 1100.0, 2.0)
    assert kernels.shape[0] == len(boundaries)
    # log-spaced at 2 channels/octave over ~4.46 octaves
    assert 8 <= len(boundaries) <= 10
    np.testing.assert_allclose(kernels.sum(axis=1), 1.0, atol=1e-5)
    ratios = boundaries[1:] / boundaries[:-1]
    np.testing.assert_allclose(ratios, 2.0 ** 0.5, rtol=1e-6)


def test_band_gate_candidates_inside_boundary_window():
    """Every proposed candidate must sit in [boundary/2, boundary] — the
    WORLD channel gate (GetF0CandidateContour)."""
    audio = jnp.asarray(tone(220.0))[None]
    cand, score = _band_candidates(audio, SR, 160, 50.0, 1100.0, 2.0)
    _, boundaries = _nuttall_bank(SR, 50.0, 1100.0, 2.0)
    c = np.asarray(cand)[0]  # (n_bands, F)
    for j, b in enumerate(boundaries):
        proposed = c[j][c[j] > 0]
        if proposed.size:
            assert proposed.min() >= b / 2 - 1e-3
            assert proposed.max() <= b + 1e-3


def test_dio_selects_fundamental_band():
    """On a harmonic tone the winning candidates track the fundamental,
    not a harmonic (the band whose near-sinusoid output gives consistent
    event intervals)."""
    for f in (110.0, 220.0, 440.0):
        f0 = np.asarray(dio(jnp.asarray(tone(f))[None]))[0]
        voiced = f0[f0 > 0]
        assert voiced.size > 0.5 * len(f0)
        med = np.median(voiced)
        assert abs(np.log2(med / f)) < 0.05, (f, med)


def test_harvest_viterbi_continuity_on_glide():
    """A smooth glide must come out as one continuous voiced track (no
    octave flips) through the continuity-selected candidates."""
    t = np.arange(int(SR * 0.8)) / SR
    f_track = 150.0 * 2.0 ** (t / 0.8)  # one octave up over the clip
    phase = 2 * np.pi * np.cumsum(f_track) / SR
    audio = (0.4 * np.sin(phase) + 0.2 * np.sin(2 * phase)).astype(np.float32)
    f0 = np.asarray(harvest(jnp.asarray(audio)[None]))[0]
    n = len(f0)
    mid = f0[n // 4 : 3 * n // 4]
    voiced = mid[mid > 0]
    assert voiced.size > 0.8 * len(mid)
    # frame-to-frame jumps stay far below an octave
    v = voiced
    jumps = np.abs(np.diff(np.log2(v)))
    assert np.max(jumps) < 0.3, np.max(jumps)


def test_unvoiced_noise_mostly_rejected():
    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal(SR // 2)).astype(np.float32)
    for fn in (dio, harvest):
        f0 = np.asarray(fn(jnp.asarray(audio)[None]))[0]
        assert np.mean(f0 > 0) < 0.35, (fn.__name__, np.mean(f0 > 0))
