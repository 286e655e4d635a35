"""Golden tests for the DSP foundation vs numpy/scipy references."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import signal as ss

import rvc_tpu.ops.stft as stft_mod
import rvc_tpu.ops.mel as mel_mod
import rvc_tpu.ops.resample as rs_mod
import rvc_tpu.ops.filters as f_mod


def np_stft_ref(x, n_fft, hop, win_length, center, pad_mode="reflect"):
    """Ground-truth STFT identical to torch.stft semantics."""
    if center:
        x = np.pad(x, n_fft // 2, mode=pad_mode)
    w = 0.5 * (1 - np.cos(2 * np.pi * np.arange(win_length) / win_length))
    wfull = np.zeros(n_fft)
    off = (n_fft - win_length) // 2
    wfull[off : off + win_length] = w
    n_frames = 1 + (len(x) - n_fft) // hop
    out = np.empty((n_frames, n_fft // 2 + 1), dtype=np.complex128)
    for i in range(n_frames):
        out[i] = np.fft.rfft(x[i * hop : i * hop + n_fft] * wfull)
    return out


@pytest.mark.parametrize("n_fft,hop,win", [(2048, 400, 2048), (512, 128, 512), (1024, 256, 768)])
def test_stft_matches_rfft(rng, n_fft, hop, win):
    x = rng.standard_normal(n_fft * 6 + 37).astype(np.float32)
    real, imag = jax.jit(
        lambda y: stft_mod.stft(y, n_fft, hop, win, center=True)
    )(jnp.asarray(x))
    ref = np_stft_ref(x, n_fft, hop, win, center=True)
    np.testing.assert_allclose(np.asarray(real), ref.real, atol=2e-2, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(imag), ref.imag, atol=2e-2, rtol=1e-4)


def test_stft_batched(rng):
    x = rng.standard_normal((3, 4096)).astype(np.float32)
    real, imag = stft_mod.stft(jnp.asarray(x), 512, 160, 512, center=False)
    assert real.shape == (3, 1 + (4096 - 512) // 160, 257)
    for b in range(3):
        ref = np_stft_ref(x[b], 512, 160, 512, center=False)
        np.testing.assert_allclose(np.asarray(real[b]), ref.real, atol=1e-2)


def test_istft_roundtrip(rng):
    n_fft, hop = 1024, 256
    x = rng.standard_normal(8192).astype(np.float32)
    real, imag = stft_mod.stft(jnp.asarray(x), n_fft, hop, center=True)
    y = stft_mod.istft(real, imag, n_fft, hop, center=True, length=len(x))
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-3)


def test_istft_roundtrip_batched(rng):
    n_fft, hop = 512, 128
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    real, imag = stft_mod.stft(jnp.asarray(x), n_fft, hop, center=True)
    y = stft_mod.istft(real, imag, n_fft, hop, center=True, length=4096)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-3)


def test_spectrogram_reference_semantics(rng):
    """spectrogram() == |stft| of the reflect-padded signal, center=False."""
    n_fft, hop, win = 2048, 400, 2048
    T = 40000
    x = (0.5 * rng.standard_normal(T)).astype(np.float32)
    spec = np.asarray(stft_mod.spectrogram(jnp.asarray(x), n_fft, hop, win))
    pad = (n_fft - hop) // 2
    xp = np.pad(np.clip(x, -1.05, 1.05), pad, mode="reflect")
    ref = np.abs(np_stft_ref(xp, n_fft, hop, win, center=False))
    ref = np.sqrt(ref**2 + 1e-8)
    assert spec.shape == ref.shape
    np.testing.assert_allclose(spec, ref, atol=3e-2, rtol=1e-3)
    # frame count matches the reference's expectation: T // hop frames
    assert spec.shape[0] == T // hop


def test_mel_filterbank_properties():
    fb = np.asarray(mel_mod.mel_filterbank(40000, 2048, 125))  # (n_bins, n_mels)
    assert fb.shape == (1025, 125)
    assert (fb >= 0).all()
    # every mel channel has some support, and supports are ordered by peak
    peaks = fb.argmax(axis=0)
    assert (np.diff(peaks) >= 0).all()
    assert fb.sum() > 0
    # Slaney normalization: filter areas are roughly equal-energy
    areas = fb.sum(axis=0)
    assert areas.min() > 0


def test_mel_spectrogram_shapes(rng):
    x = (0.3 * rng.standard_normal((2, 40000))).astype(np.float32)
    m = mel_mod.mel_spectrogram(jnp.asarray(x), 2048, 125, 40000, 400, 2048, 0.0, None)
    assert m.shape == (2, 100, 125)
    assert np.isfinite(np.asarray(m)).all()
    # log compression: silence clips at log(1e-5)
    sil = mel_mod.mel_spectrogram(jnp.zeros((1, 40000)), 2048, 125, 40000, 400, 2048, 0.0, None)
    np.testing.assert_allclose(np.asarray(sil), np.log(1e-5), atol=1e-4)


@pytest.mark.parametrize("up,down", [(5, 2), (2, 5), (3, 1), (160, 441)])
def test_resample_poly_matches_scipy(rng, up, down):
    x = rng.standard_normal(8000).astype(np.float32)
    y = np.asarray(rs_mod.resample_poly(jnp.asarray(x), up, down))
    ref = ss.resample_poly(x, up, down)
    assert y.shape == ref.shape
    np.testing.assert_allclose(y, ref, atol=5e-4)


def test_resample_sr(rng):
    x = rng.standard_normal((2, 16000)).astype(np.float32)
    y = rs_mod.resample(jnp.asarray(x), 16000, 40000)
    assert y.shape == (2, 40000)
    ref = ss.resample_poly(x, 5, 2, axis=-1)
    np.testing.assert_allclose(np.asarray(y), ref, atol=5e-4)


def test_rms_envelope(rng):
    x = rng.standard_normal(16000).astype(np.float32)
    env = np.asarray(f_mod.rms_envelope(jnp.asarray(x), 2048, 512))
    # librosa-style reference
    pad = 1024
    xp = np.pad(x, pad)
    n_frames = 1 + (len(xp) - 2048) // 512
    ref = np.array([
        np.sqrt(np.mean(xp[i * 512 : i * 512 + 2048] ** 2)) for i in range(n_frames)
    ])
    np.testing.assert_allclose(env, ref, atol=1e-5)


def test_change_rms_rate1_identity(rng):
    x = rng.standard_normal(16000).astype(np.float32)
    y = rng.standard_normal(40000).astype(np.float32)
    out = np.asarray(f_mod.change_rms(jnp.asarray(x), 16000, jnp.asarray(y), 40000, 1.0))
    np.testing.assert_allclose(out, y, atol=1e-5)


def test_median_filter(rng):
    x = rng.standard_normal(999).astype(np.float32)
    y = np.asarray(f_mod.median_filter_1d(jnp.asarray(x), 5))
    ref = ss.medfilt(x, 5)
    np.testing.assert_allclose(y, ref, atol=1e-6)


def test_highpass_fir_removes_dc(rng):
    t = np.arange(16000) / 16000
    x = (1.0 + 0.1 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    y = np.asarray(f_mod.highpass_fir(jnp.asarray(x), 48.0, 16000))
    # DC should be gone, 440 Hz preserved
    assert abs(y[2000:-2000].mean()) < 1e-2
    assert y[2000:-2000].std() > 0.05
