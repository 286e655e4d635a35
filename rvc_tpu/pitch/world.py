"""WORLD-style DIO / Harvest pitch estimators, TPU-native.

The reference calls pyworld's C implementations (pitch_extraction.py:
get_dio/get_harvest, both followed by pw.stonemask) — a candidate-grid
algorithm, NOT autocorrelation:

  1. band decomposition: the signal is low-pass filtered by a bank of
     Nuttall-window FIR kernels whose cutoffs ("boundary f0", log-spaced at
     `channels_in_octave` per octave) sweep [f0_floor, f0_ceil]; a band
     whose boundary sits in [f0, 2 f0) reduces the waveform to a
     near-sinusoid at the fundamental,
  2. per band, FOUR event-interval period estimates (negative-going zero
     crossings, positive-going zero crossings, peaks, dips — WORLD's
     ZeroCrossingEngine), linear-interpolated event times,
  3. per frame: candidate f0 = mean of the four; reliability score =
     stddev of the four / candidate; a band only proposes candidates
     inside [boundary/2, boundary] (WORLD GetF0CandidateContour),
  4. DIO: per-frame argmin-score winner + neighbor-consistency fix steps;
     Harvest: a denser band grid and temporal-continuity selection,
  5. stonemask refinement (pitch/extractor.stonemask_refine) applied by
     the caller, matching the reference call sites.

TPU mapping: the filter bank is ONE grouped conv dispatch; event times are
sign-change masks + linear interpolation; the "previous/next event time"
tracks are cummax / reversed-cummin scans (O(T), XLA-friendly — WORLD's
event loops are inherently sequential C); frame sampling is a strided
slice.

WORLD fidelity (r5 — the three r4 deviations are closed):
  * interval tracks use WORLD's midpoint LINEAR interpolation
    (ZeroCrossingEngine: interval value sr/Δt located at the event pair's
    midpoint, interp1 at the frame centers, clamped at the track ends) —
    implemented with two extra gathers per frame center instead of
    full-length value-carrying scans,
  * Harvest runs at WORLD's ``channels_in_octave=24`` (the band axis is
    fully vectorized, so the denser grid is a shape change, not a
    trace-time change),
  * FixF0Contour is the multi-step surgery, not only the rapid-jump gate:
    Step1 rapid-change removal, Step2 short-voiced-segment removal,
    Step3/4 candidate-based segment-edge extension and merge
    (``_fix_f0_contour``); Harvest keeps the Viterbi continuity pass for
    per-frame candidate SELECTION (WORLD selects by raw score and leans
    entirely on FixF0Contour — the Viterbi is strictly more continuous)
    and then applies the same surgery.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

HUBERT_SR = 16000
HUBERT_WINDOW = 160


@functools.lru_cache(maxsize=None)
def _nuttall_bank(sr: int, f0_floor: float, f0_ceil: float,
                  channels_in_octave: float) -> tuple[np.ndarray, np.ndarray]:
    """Low-pass FIR bank: one Nuttall window per boundary f0 (WORLD
    GetFilteredSignal uses the Nuttall window itself as the LPF kernel,
    support ≈ 2 periods of the boundary). Returns (kernels (n_bands, K),
    boundaries (n_bands,)); kernels are unit-DC-gain, centered in a common
    K = 2·sr/f0_floor + 1 buffer."""
    n_bands = int(np.ceil(np.log2(f0_ceil / f0_floor) * channels_in_octave))
    boundaries = f0_floor * 2.0 ** ((np.arange(n_bands) + 1.0)
                                    / channels_in_octave)
    K = 2 * int(round(sr / f0_floor)) + 1
    kernels = np.zeros((n_bands, K), np.float32)
    for j, b in enumerate(boundaries):
        half = int(round(sr / b / 2.0)) * 2  # 2 periods total support
        n = np.arange(2 * half + 1)
        x = n / (2 * half)
        w = (0.355768 - 0.487396 * np.cos(2 * np.pi * x)
             + 0.144232 * np.cos(4 * np.pi * x)
             - 0.012604 * np.cos(6 * np.pi * x))
        w /= w.sum()
        c = K // 2
        kernels[j, c - half : c + half + 1] = w
    return kernels, boundaries.astype(np.float32)


def _event_f0_tracks(x: jax.Array, centers: jax.Array, sr: int) -> jax.Array:
    """Per-event-type f0 estimate at each frame center, for the four WORLD
    event types. x: (..., T) band-filtered signal; centers: (F,) int sample
    indices. Returns (4, ..., F) f0 in Hz (nan where a frame has no
    enclosing event pair).

    WORLD ZeroCrossingEngine semantics: for crossing times
    t_0 < t_1 < ..., interval i has value sr/(t_{i+1} − t_i) located at
    the midpoint (t_i + t_{i+1})/2; the track is interp1'd at the query
    centers with end clamping. Implemented without value-carrying scans:
    the prev/next event-time tracks (cummax / reversed-cummin) give the
    enclosing pair (t1, t2) at each center; two more gathers at
    floor(t1)/floor(t2) recover the neighbor events t0 and t3 (at most
    one crossing of a given type per sample slot), which defines the
    three candidate intervals A=(t0,t1), B=(t1,t2), C=(t2,t3) and their
    midpoints — the query interpolates between the two midpoints that
    bracket it."""
    T = x.shape[-1]
    axis = x.ndim - 1
    dx = x[..., 1:] - x[..., :-1]  # (..., T-1): derivative proxy
    tracks = []
    t_idx = jnp.arange(T - 1, dtype=jnp.float32)
    c = jnp.minimum(centers, T - 2)
    for sig in (x[..., :-1], -x[..., :-1], dx, -dx):
        nxt = jnp.concatenate([sig[..., 1:], sig[..., -1:]], axis=-1)
        mask = (sig > 0) & (nxt <= 0)  # negative-going crossing in [t, t+1)
        frac = jnp.where(mask, sig / jnp.maximum(sig - nxt, 1e-12), 0.0)
        times = t_idx + frac
        prev_t = jax.lax.cummax(
            jnp.where(mask, times, -jnp.inf), axis=axis)
        next_t = -jax.lax.cummax(
            jnp.where(mask, -times, -jnp.inf), axis=axis, reverse=True)
        # prev event strictly before slot s: prev_t shifted right one slot
        prev_excl = jnp.concatenate(
            [jnp.full_like(prev_t[..., :1], -jnp.inf), prev_t[..., :-1]],
            axis=axis)
        # next event strictly after slot s: next_t shifted left one slot
        next_excl = jnp.concatenate(
            [next_t[..., 1:], jnp.full_like(next_t[..., :1], jnp.inf)],
            axis=axis)
        t1 = jnp.take(prev_t, c, axis=axis)  # last event ≤ center
        t2 = jnp.take(next_t, c, axis=axis)  # next event ≥ center
        s1 = jnp.clip(jnp.nan_to_num(t1, neginf=0.0), 0, T - 2).astype(jnp.int32)
        s2 = jnp.clip(jnp.nan_to_num(t2, posinf=T - 2), 0, T - 2).astype(jnp.int32)
        t0 = jnp.take_along_axis(prev_excl, s1, axis=axis)
        t3 = jnp.take_along_axis(next_excl, s2, axis=axis)

        def iv(lo, hi):
            d = hi - lo
            v = jnp.where((d > 0) & jnp.isfinite(d), sr / jnp.maximum(d, 1e-6),
                          jnp.nan)
            m = 0.5 * (lo + hi)  # ±inf where either end is missing
            return m, v

        mA, vA = iv(t0, t1)
        mB, vB = iv(t1, t2)
        mC, vC = iv(t2, t3)
        cf = c.astype(jnp.float32)
        left = cf < mB  # query sits before interval B's midpoint
        m_lo = jnp.where(left, mA, mB)
        v_lo = jnp.where(left, vA, vB)
        m_hi = jnp.where(left, mB, mC)
        v_hi = jnp.where(left, vB, vC)
        denom = m_hi - m_lo
        w = jnp.clip(
            jnp.where(jnp.isfinite(denom) & (denom > 0),
                      (cf - m_lo) / jnp.where(denom > 0, denom, 1.0), 1.0),
            0.0, 1.0)
        est = v_lo + w * (v_hi - v_lo)
        # end clamping (interp1 outside the midpoint range): fall back to
        # the single valid side; nan when the center has no enclosing pair
        est = jnp.where(jnp.isfinite(m_lo) & jnp.isfinite(v_lo), est,
                        jnp.where(jnp.isfinite(v_hi), v_hi, jnp.nan))
        est = jnp.where(jnp.isfinite(m_hi) & jnp.isfinite(v_hi), est,
                        jnp.where(jnp.isfinite(v_lo), v_lo, jnp.nan))
        # frames with no enclosing event pair at all carry no estimate
        est = jnp.where(jnp.isfinite(t1) | jnp.isfinite(t2), est, jnp.nan)
        tracks.append(est)
    return jnp.stack(tracks, axis=0)  # (4, ..., F) Hz


def _band_candidates(
    audio: jax.Array,
    sr: int,
    hop: int,
    f0_floor: float,
    f0_ceil: float,
    channels_in_octave: float,
) -> tuple[jax.Array, jax.Array]:
    """All-band candidate grid. audio (B, T) →
    (cand (B, n_bands, F) Hz with 0 = invalid, score (B, n_bands, F) —
    lower is better, normalized deviation of the four event estimates)."""
    kernels_np, boundaries = _nuttall_bank(
        sr, float(f0_floor), float(f0_ceil), float(channels_in_octave))
    B, T = audio.shape
    K = kernels_np.shape[1]
    F = T // hop + 1
    # one conv dispatch for the whole bank: (B, 1, T) ⊛ (n_bands, 1, K)
    filt = jax.lax.conv_general_dilated(
        audio[:, None, :].astype(jnp.float32),
        jnp.asarray(kernels_np)[:, None, :],
        window_strides=(1,), padding=((K // 2, K // 2),),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (B, n_bands, T)
    filt = filt - filt.mean(axis=-1, keepdims=True)
    centers = jnp.arange(F) * hop
    est = _event_f0_tracks(filt, centers, sr)  # (4, B, n_bands, F) Hz
    est = jnp.where(jnp.isfinite(est) & (est > 0), est, jnp.nan)
    cand = jnp.nanmean(est, axis=0)
    dev = jnp.sqrt(jnp.nanmean(jnp.square(est - cand[None]), axis=0))
    bnd = jnp.asarray(boundaries)[None, :, None]
    # WORLD band gate: a channel only proposes f0 ∈ [boundary/2, boundary]
    ok = (jnp.isfinite(cand) & (cand >= bnd * 0.5) & (cand <= bnd)
          & (cand >= f0_floor) & (cand <= f0_ceil)
          & jnp.all(jnp.isfinite(est), axis=0))
    cand = jnp.where(ok, cand, 0.0)
    score = jnp.where(ok, dev / jnp.maximum(cand, 1e-6), jnp.inf)
    return cand, score


def _fix_step1(f0: jax.Array, allowed_range: float = 0.1) -> jax.Array:
    """WORLD FixStep1: a voiced frame whose relative jump from its
    predecessor exceeds ``allowed_range`` becomes unvoiced (later steps
    re-extend segments; stonemask recovers the fine value)."""
    prev = jnp.concatenate([f0[..., :1], f0[..., :-1]], axis=-1)
    nxt = jnp.concatenate([f0[..., 1:], f0[..., -1:]], axis=-1)
    ref = jnp.where(prev > 0, prev, nxt)
    jump = jnp.abs(f0 - ref) / jnp.maximum(ref, 1e-6)
    bad = (f0 > 0) & (ref > 0) & (jump > allowed_range)
    return jnp.where(bad, 0.0, f0)


def _run_lengths(voiced: jax.Array) -> jax.Array:
    """Length of the constant-value run each frame belongs to.
    voiced: (..., F) bool → (..., F) int32, vectorized (no scan): the run
    start index is a cummax over change points, the run end a reversed
    one."""
    F = voiced.shape[-1]
    t = jnp.arange(F, dtype=jnp.int32)
    changed = jnp.concatenate(
        [jnp.ones_like(voiced[..., :1]),
         voiced[..., 1:] != voiced[..., :-1]], axis=-1)
    ax = voiced.ndim - 1
    start = jax.lax.cummax(jnp.where(changed, t, -1), axis=ax)
    change_next = jnp.concatenate(
        [changed[..., 1:], jnp.ones_like(changed[..., :1])], axis=-1)
    end = -jax.lax.cummax(jnp.where(change_next, -t, -F), axis=ax,
                          reverse=True)
    return end - start + 1


def _fix_f0_contour(
    f0: jax.Array,
    cand: jax.Array,
    allowed_range: float,
    min_voiced_frames: int,
    max_extend: int,
) -> jax.Array:
    """WORLD FixF0Contour surgery (dio FixF0Contour / harvest
    FixF0ContourSub), vectorized:

    Step1  rapid-jump removal (``_fix_step1``),
    Step2  voiced segments shorter than ``min_voiced_frames`` become
           unvoiced (WORLD voice_range_minimum),
    Step3/4  segment-edge extension + merge: an unvoiced frame within
           ``max_extend`` frames of a voiced segment edge is re-voiced
           with the band candidate closest to the edge value, when that
           candidate deviates < ``allowed_range`` relative (WORLD
           SelectBestF0 against the extension reference; WORLD re-scores
           the reference every extended frame — the fixed-edge reference
           with a bounded reach is the vectorized form, and merging
           happens naturally when two extended edges meet).

    f0: (B, F); cand: (B, n_bands, F) candidate grid (0 = invalid)."""
    f0 = _fix_step1(f0, allowed_range)
    voiced = f0 > 0
    if min_voiced_frames > 1:
        f0 = jnp.where(voiced & (_run_lengths(voiced) < min_voiced_frames),
                       0.0, f0)
        voiced = f0 > 0
    if max_extend <= 0:
        return f0
    F = f0.shape[-1]
    t = jnp.arange(F, dtype=jnp.int32)
    big = jnp.int32(F + max_extend + 1)
    # forward fill: nearest voiced frame at/before t, and its value
    ax = f0.ndim - 1
    last_idx = jax.lax.cummax(jnp.where(voiced, t, -1), axis=ax)
    fwd_val = jnp.take_along_axis(f0, jnp.maximum(last_idx, 0), axis=-1)
    fwd_dist = jnp.where(last_idx >= 0, t - last_idx, big)
    # backward fill: nearest voiced frame at/after t
    next_idx = -jax.lax.cummax(jnp.where(voiced, -t, -big), axis=ax,
                               reverse=True)
    bwd_val = jnp.take_along_axis(f0, jnp.minimum(next_idx, F - 1), axis=-1)
    bwd_dist = jnp.where(next_idx < F, next_idx - t, big)
    use_fwd = fwd_dist <= bwd_dist
    edge_val = jnp.where(use_fwd, fwd_val, bwd_val)
    edge_dist = jnp.minimum(fwd_dist, bwd_dist)
    # best-matching candidate against the edge reference (WORLD SelectBestF0)
    dev = jnp.abs(cand - edge_val[:, None, :]) / jnp.maximum(
        edge_val[:, None, :], 1e-6)
    dev = jnp.where(cand > 0, dev, jnp.inf)
    best = jnp.argmin(dev, axis=1)  # (B, F)
    best_val = jnp.take_along_axis(cand, best[:, None, :], axis=1)[:, 0]
    best_dev = jnp.take_along_axis(dev, best[:, None, :], axis=1)[:, 0]
    extend = (~voiced) & (edge_dist <= max_extend) \
        & (best_dev < allowed_range)
    return jnp.where(extend, best_val, f0)


def dio(
    audio: jax.Array,
    sr: int = HUBERT_SR,
    hop: int = HUBERT_WINDOW,
    f0_floor: float = 50.0,
    f0_ceil: float = 1100.0,
    channels_in_octave: float = 2.0,
    score_threshold: float | None = None,
) -> jax.Array:
    """DIO candidate-grid estimate. audio (B, T) → (B, T//hop + 1) Hz,
    0 where unvoiced. channels_in_octave=2 is WORLD's dio default; the
    per-frame winner is the lowest-deviation band candidate (WORLD
    GetBestF0Contour), gated by ``score_threshold`` for voicing, then the
    FixF0Contour four-step surgery (min segment length: WORLD
    voice_range_minimum at this hop ≈ 50 ms).

    ``score_threshold=None`` scales the gate with channel density
    (0.24 / channels_in_octave): a narrower band turns even noise into a
    near-sinusoid, so the 4-estimator deviation shrinks roughly in
    proportion to the band width — measured on this implementation:
    voiced-speech best scores stay ≤ 4e-4 at CIO=24 while white-noise
    best scores sit at 0.03-0.16."""
    if score_threshold is None:
        score_threshold = 0.24 / channels_in_octave
    cand, score = _band_candidates(
        audio, sr, hop, f0_floor, f0_ceil, channels_in_octave)
    best = jnp.argmin(score, axis=1)  # (B, F)
    f0 = jnp.take_along_axis(cand, best[:, None, :], axis=1)[:, 0]
    s = jnp.take_along_axis(score, best[:, None, :], axis=1)[:, 0]
    f0 = jnp.where(s <= score_threshold, f0, 0.0)
    frame_ms = 1000.0 * hop / sr
    min_voiced = max(2, int(round(50.0 / frame_ms)))
    return _fix_f0_contour(f0, cand, allowed_range=0.1,
                           min_voiced_frames=min_voiced, max_extend=10)


def harvest(
    audio: jax.Array,
    sr: int = HUBERT_SR,
    hop: int = HUBERT_WINDOW,
    f0_floor: float = 50.0,
    f0_ceil: float = 1100.0,
    channels_in_octave: float = 24.0,
    score_threshold: float | None = None,
    transition_cost: float = 0.35,
) -> jax.Array:
    """Harvest: the same candidate grid at WORLD's dense channel spacing
    (harvest hardcodes channels_in_octave=24), with temporal-continuity
    candidate SELECTION — a Viterbi pass over the band axis (emission =
    deviation score, transition = |log2 jump| between consecutive frames'
    candidates; WORLD selects per-frame by raw score and leans on
    FixF0Contour alone, so the Viterbi is strictly more continuous) —
    followed by the same FixF0Contour surgery (harvest's
    voice_range_minimum is 9 ms at its internal 1 ms grid → ~2 frames at
    this hop). More voiced-greedy than dio, like the original.
    ``score_threshold=None`` → density-scaled gate (see ``dio``)."""
    if score_threshold is None:
        score_threshold = 0.24 / channels_in_octave
    cand, score = _band_candidates(
        audio, sr, hop, f0_floor, f0_ceil, channels_in_octave)
    B, nb, F = cand.shape
    log_f = jnp.log2(jnp.maximum(cand, 1e-6))
    emit = jnp.where(jnp.isfinite(score), score, 1e3)  # (B, nb, F)

    # xs laid out frame-major so the scan body is pure elementwise/matrix
    # work (no dynamic gathers into the closed-over grid)
    xs = {
        "emit_t": jnp.moveaxis(emit[:, :, 1:], -1, 0),        # (F-1, B, nb)
        "logf_t": jnp.moveaxis(log_f[:, :, 1:], -1, 0),
        "logf_p": jnp.moveaxis(log_f[:, :, :-1], -1, 0),
        "voiced_p": jnp.moveaxis(cand[:, :, :-1] > 0, -1, 0),
    }

    def viterbi_step(cost_prev, x):
        # transition: octave distance between the previous frame's candidate
        # and this frame's; an unvoiced previous candidate transitions free
        prev_lf = jnp.where(x["voiced_p"], x["logf_p"], 0.0)
        trans = jnp.where(
            x["voiced_p"][:, :, None],
            jnp.abs(x["logf_t"][:, None, :] - prev_lf[:, :, None]), 0.0)
        total = cost_prev[:, :, None] + transition_cost * trans  # (B, prev, cur)
        back = jnp.argmin(total, axis=1)  # (B, nb)
        cost = jnp.min(total, axis=1) + x["emit_t"]
        return cost, back

    final_cost, backs = jax.lax.scan(viterbi_step, emit[:, :, 0], xs)
    last = jnp.argmin(final_cost, axis=1)  # (B,)

    def backtrace(carry, back_t):
        idx = carry  # (B,)
        prev = jnp.take_along_axis(back_t, idx[:, None], axis=1)[:, 0]
        return prev, idx

    first, path_rest = jax.lax.scan(backtrace, last, backs, reverse=True)
    # reverse scan emits ys[i] = chosen band at frame i+1; the final carry
    # is the frame-0 band
    path = jnp.concatenate([first[None], path_rest], axis=0)  # (F, B)
    path = jnp.transpose(path)  # (B, F)
    f0 = jnp.take_along_axis(cand, path[:, None, :], axis=1)[:, 0]
    s = jnp.take_along_axis(emit, path[:, None, :], axis=1)[:, 0]
    f0 = jnp.where(s <= score_threshold, f0, 0.0)
    return _fix_f0_contour(f0, cand, allowed_range=0.18,
                           min_voiced_frames=2, max_extend=10)
