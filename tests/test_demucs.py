"""Demucs model + chunked apply tests (tiny config, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from rvc_tpu.models.demucs import Demucs, apply_model, _apply_chunks


def tiny_demucs():
    return Demucs(sources=("vocals", "other"), channels=4, depth=3,
                  lstm_layers=1, resample=False)


def test_demucs_shapes(rng):
    model = tiny_demucs()
    T = model.valid_length(1000)
    x = jnp.asarray(rng.standard_normal((2, T, 2)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 2, T, 2)
    assert np.isfinite(np.asarray(y)).all()


def test_valid_length():
    model = tiny_demucs()
    L = model.valid_length(1000)
    assert L >= 1000
    # survives conv chain: applying again is a fixed point
    assert model.valid_length(L) == L


def test_apply_model_overlap_add(rng):
    """With an identity 'model', chunked apply reconstructs the input."""
    mix = rng.standard_normal((2, 3000)).astype(np.float32)

    def fake_apply(batch):  # (N, T, C) -> (N, 1, T, C)
        return np.asarray(batch)[:, None]

    out = _apply_chunks(fake_apply, mix, segment=1024, overlap=0.5)
    np.testing.assert_allclose(out[0], mix, atol=1e-5)


def test_apply_model_shifts(rng):
    mix = rng.standard_normal((2, 2000)).astype(np.float32)

    def fake_apply(batch):
        return np.asarray(batch)[:, None] * 2.0

    out = apply_model(fake_apply, mix, segment_samples=512, shifts=2, max_shift=100)
    assert out.shape == (1, 2, 2000)
    np.testing.assert_allclose(out[0], 2 * mix, atol=1e-4)
