"""Pallas retrieval kernel — interpreter-mode correctness on CPU."""
import jax.numpy as jnp
import numpy as np

from rvc_tpu.ops.pallas_retrieval import nearest_rows, blend_into


def test_nearest_rows_interpret(rng):
    T, D, N = 7, 16, 40
    feats = rng.standard_normal((T, D)).astype(np.float32)
    bank = rng.standard_normal((N, D)).astype(np.float32)
    out = np.asarray(nearest_rows(jnp.asarray(feats), jnp.asarray(bank), interpret=True))
    d2 = ((feats[:, None] - bank[None]) ** 2).sum(-1)
    ref = bank[np.argmin(d2, -1)]
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_nearest_rows_multi_tile_banks(rng):
    """Bank spanning several TN tiles: the running-min scratch must carry."""
    T, D, N = 3, 8, 700  # > 2 bank tiles of 256
    feats = rng.standard_normal((T, D)).astype(np.float32)
    bank = rng.standard_normal((N, D)).astype(np.float32)
    out = np.asarray(nearest_rows(jnp.asarray(feats), jnp.asarray(bank), interpret=True))
    d2 = ((feats[:, None] - bank[None]) ** 2).sum(-1)
    ref = bank[np.argmin(d2, -1)]
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_blend_into_interpret(rng):
    B, T, D, N = 1, 5, 8, 30
    feats = rng.standard_normal((B, T, D)).astype(np.float32)
    bank = rng.standard_normal((N, D)).astype(np.float32)
    out = np.asarray(blend_into(jnp.asarray(feats), jnp.asarray(bank), 0.75,
                                interpret=True))
    d2 = ((feats[0, :, None] - bank[None]) ** 2).sum(-1)
    nearest = bank[np.argmin(d2, -1)]
    ref = 0.75 * nearest + 0.25 * feats[0]
    np.testing.assert_allclose(out[0], ref, atol=1e-4)
