"""WORLD-style dio/harvest candidate-grid structure tests.

Accuracy on speech-like signals is gated by tests/test_f0_golden.py (which
runs the full dio/harvest → stonemask pipelines); these tests pin the
candidate-grid MECHANICS of pitch/world.py: the band gate, the
deviation-scored selection, and the Viterbi continuity pass.
"""
import os

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


# ---------------------------------------------------------------------------
# r5 WORLD-fidelity drift gates: each test below FAILS if one of the three
# r4 deviations (closed in r5) is reintroduced — the sanctioned substitute
# for pyworld-generated goldens while pyworld cannot be installed here
# (docs/ROUND5_NOTES.md carries the fixture-generation plan for when it can).


def test_interval_tracks_are_midpoint_interpolated():
    """Deviation #1 gate (ZeroCrossingEngine midpoint interp1): on a chirp
    whose period changes every cycle, the estimate at a frame center
    BETWEEN two interval midpoints must move toward the interpolated value
    — a piecewise-constant implementation returns exactly the enclosing
    interval's value and fails the strict-betweenness check."""
    from rvc_tpu.pitch.world import _event_f0_tracks

    # linear chirp 100 → 140 Hz over 0.5 s: every consecutive period pair
    # differs, so adjacent interval values always straddle the truth
    t = np.arange(int(SR * 0.5)) / SR
    f_track = 100.0 + 80.0 * t
    phase = 2 * np.pi * np.cumsum(f_track) / SR
    x = np.sin(phase).astype(np.float32)[None]
    centers = jnp.arange(10, 70) * 100  # dense queries, interior only
    est = np.asarray(_event_f0_tracks(jnp.asarray(x), centers, SR))
    truth = f_track[np.asarray(centers)]
    # all four event-type tracks must follow the chirp closely; the
    # piecewise-constant form has a systematic half-interval lag which at
    # this chirp rate exceeds these bounds on average
    for k in range(4):
        e = est[k, 0]
        ok = np.isfinite(e)
        assert ok.mean() > 0.9
        err = np.abs(e[ok] - truth[ok]) / truth[ok]
        assert np.median(err) < 0.01, (k, np.median(err))
        # strict betweenness on a monotone chirp: estimates themselves
        # must be monotone-ish (piecewise-constant gives staircase with
        # repeated values at >30% of adjacent query pairs at this density)
        repeats = np.mean(np.abs(np.diff(e[ok])) < 1e-9)
        assert repeats < 0.2, (k, repeats)


def test_harvest_uses_world_channel_density():
    """Deviation #2 gate: harvest's default channel grid is WORLD's
    channels_in_octave=24 (≥ 100 bands over [50, 1100] Hz)."""
    import inspect

    default = inspect.signature(harvest).parameters["channels_in_octave"].default
    assert default == 24.0, default
    kernels, boundaries = _nuttall_bank(SR, 50.0, 1100.0, default)
    assert len(boundaries) >= 100, len(boundaries)


def test_fix_contour_removes_short_voiced_segments():
    """Deviation #3 gate (FixStep2): an isolated voiced blip shorter than
    voice_range_minimum is removed even when its value is locally
    self-consistent."""
    from rvc_tpu.pitch.world import _fix_f0_contour

    F = 60
    f0 = np.zeros((1, F), np.float32)
    f0[0, 30:33] = 200.0  # 3-frame blip < dio's 5-frame minimum
    cand = np.zeros((1, 3, F), np.float32)  # no supporting candidates
    out = np.asarray(_fix_f0_contour(jnp.asarray(f0), jnp.asarray(cand),
                                     allowed_range=0.1,
                                     min_voiced_frames=5, max_extend=10))
    assert np.all(out == 0), out.nonzero()


def test_fix_contour_extends_segment_edges_from_candidates():
    """Deviation #3 gate (FixStep3/4): a short unvoiced gap inside a voiced
    contour is re-voiced from the candidate grid when a candidate within
    allowed_range of the segment edge exists — and NOT filled when the gap
    exceeds max_extend or no candidate matches."""
    from rvc_tpu.pitch.world import _fix_f0_contour

    F = 80
    f0 = np.zeros((1, F), np.float32)
    f0[0, 10:30] = 200.0
    f0[0, 36:56] = 205.0  # 6-frame gap between two segments
    cand = np.zeros((1, 2, F), np.float32)
    cand[0, 0, :] = 202.0  # matching candidate everywhere
    out = np.asarray(_fix_f0_contour(jnp.asarray(f0), jnp.asarray(cand),
                                     allowed_range=0.1,
                                     min_voiced_frames=2, max_extend=10))
    assert np.all(out[0, 30:36] > 0), out[0, 30:36]  # gap merged
    # far-from-any-segment frames stay unvoiced (distance > max_extend)
    assert np.all(out[0, 70:] == 0)
    # and with NO matching candidate the gap must stay unvoiced
    cand2 = np.zeros((1, 2, F), np.float32)
    cand2[0, 0, :] = 400.0  # octave off — outside allowed_range
    out2 = np.asarray(_fix_f0_contour(jnp.asarray(f0), jnp.asarray(cand2),
                                      allowed_range=0.1,
                                      min_voiced_frames=2, max_extend=10))
    assert np.all(out2[0, 30:36] == 0), out2[0, 30:36]


def test_vibrato_depth_recovered():
    """End-to-end fidelity: a 5.5 Hz ±3% vibrato's modulation depth must
    survive dio/harvest (the half-interval lag of a piecewise-constant
    track attenuates and phase-smears the recovered modulation)."""
    t = np.arange(int(SR * 1.2)) / SR
    depth, rate, base = 0.03, 5.5, 200.0
    track = base * (1.0 + depth * np.sin(2 * np.pi * rate * t))
    phase = 2 * np.pi * np.cumsum(track) / SR
    audio = (0.4 * np.sin(phase) + 0.2 * np.sin(2 * phase)).astype(np.float32)
    for fn in (dio, harvest):
        f0 = np.asarray(fn(jnp.asarray(audio)[None]))[0]
        sel = f0[5:-5]
        voiced = sel > 0
        assert voiced.mean() > 0.9, fn.__name__
        v = sel[voiced]
        est_depth = (v.max() - v.min()) / (2 * np.median(v))
        assert 0.7 * depth < est_depth < 1.4 * depth, (fn.__name__, est_depth)


def _golden_signals() -> dict:
    """Deterministic signals shared with scripts/make_pyworld_goldens.py —
    keep both sides in sync (the fixture files are keyed by these names)."""
    sigs = {}
    t = np.arange(int(SR * 3.0)) / SR
    glide = 180.0 * (1.0 + 0.3 * t / t[-1])
    track = glide * (1.0 + 0.03 * np.sin(2 * np.pi * 5.0 * t))
    phase = 2 * np.pi * np.cumsum(track) / SR
    rng = np.random.default_rng(7)
    x = sum(0.7 ** h * np.sin((h + 1) * phase + rng.uniform(0, 2 * np.pi))
            for h in range(6))
    sigs["vibrato_glide"] = (0.3 * x / np.max(np.abs(x))).astype(np.float32)
    # voiced/unvoiced alternation: tone — silence — tone
    seg = int(SR * 0.5)
    tone_t = np.arange(seg) / SR
    tone_x = (0.4 * np.sin(2 * np.pi * 220.0 * tone_t)
              + 0.2 * np.sin(2 * np.pi * 440.0 * tone_t))
    sigs["voicing_breaks"] = np.concatenate(
        [tone_x, np.zeros(seg), tone_x * 0.7]).astype(np.float32)
    return sigs


_PYWORLD_FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "fixtures", "pyworld")


@pytest.mark.skipif(
    not os.path.isdir(_PYWORLD_FIXTURES),
    reason="pyworld golden fixtures not committed yet "
           "(scripts/make_pyworld_goldens.py needs a machine with pyworld)")
@pytest.mark.parametrize("method", ["dio", "harvest"])
@pytest.mark.parametrize("name", ["vibrato_glide", "voicing_breaks"])
def test_pyworld_golden_crosscheck(method, name):
    """Auto-activating gate vs the ACTUAL pyworld output (VERDICT r4
    missing #2): once the .npy fixtures are committed, dio/harvest (with
    the pipeline's stonemask refinement, matching the reference call
    pitch_extraction.py:168-188) must agree with pyworld's refined track —
    median ≤ 30 cents on co-voiced frames, voicing F1 ≥ 0.85."""
    from rvc_tpu.pitch.extractor import stonemask_refine
    from rvc_tpu.pitch.world import dio as _dio, harvest as _harvest

    path = os.path.join(_PYWORLD_FIXTURES, f"{name}.{method}.npy")
    golden = np.load(path)
    audio = _golden_signals()[name]
    fn = _dio if method == "dio" else _harvest
    a = jnp.asarray(audio)[None]
    f0 = fn(a)
    f0 = np.asarray(stonemask_refine(a, f0))[0]
    n = min(len(f0), len(golden))
    ours, ref = f0[:n], golden[:n]
    both = (ours > 0) & (ref > 0)
    tp = both.sum()
    prec = tp / max((ours > 0).sum(), 1)
    rec = tp / max((ref > 0).sum(), 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    assert f1 >= 0.85, (prec, rec)
    cents = 1200 * np.abs(np.log2(ours[both] / ref[both]))
    assert np.median(cents) <= 30.0, np.median(cents)


def test_octave_jump_resistance():
    """Octave-error pressure: a tone whose 2nd harmonic is 3x stronger
    than the fundamental must still track f0, not 2·f0 (band gating +
    continuity selection + FixF0Contour)."""
    t = np.arange(int(SR * 0.8)) / SR
    f = 165.0
    audio = (0.15 * np.sin(2 * np.pi * f * t)
             + 0.45 * np.sin(2 * np.pi * 2 * f * t)
             + 0.1 * np.sin(2 * np.pi * 3 * f * t)).astype(np.float32)
    for fn in (dio, harvest):
        f0 = np.asarray(fn(jnp.asarray(audio)[None]))[0]
        v = f0[(f0 > 0)]
        assert v.size > 0.5 * len(f0), fn.__name__
        octave_err = np.abs(np.log2(v / f)) > 0.5
        assert octave_err.mean() < 0.1, (fn.__name__, octave_err.mean())
