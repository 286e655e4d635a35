"""Pallas retrieval kernel — interpreter-mode correctness on CPU."""
import jax.numpy as jnp
import numpy as np

from rvc_tpu.ops.pallas_retrieval import (
    TN,
    blend_into,
    blend_into_q,
    nearest_rows,
    nearest_rows_q,
    quantize_bank,
)


def test_nearest_rows_interpret(rng):
    T, D, N = 7, 16, 40
    feats = rng.standard_normal((T, D)).astype(np.float32)
    bank = rng.standard_normal((N, D)).astype(np.float32)
    out = np.asarray(nearest_rows(jnp.asarray(feats), jnp.asarray(bank), interpret=True))
    d2 = ((feats[:, None] - bank[None]) ** 2).sum(-1)
    ref = bank[np.argmin(d2, -1)]
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_nearest_rows_multi_tile_banks(rng):
    """Bank spanning several TN tiles: the running-min scratch must carry.

    N is derived from TN so a tile-size bump can never silently shrink
    this back to a single-tile bank (it did once: TN 256→2048 left the
    old N=700 covering one tile)."""
    T, D, N = 3, 8, 2 * TN + 700  # > 2 bank tiles, non-multiple remainder
    feats = rng.standard_normal((T, D)).astype(np.float32)
    bank = rng.standard_normal((N, D)).astype(np.float32)
    out = np.asarray(nearest_rows(jnp.asarray(feats), jnp.asarray(bank), interpret=True))
    d2 = ((feats[:, None] - bank[None]) ** 2).sum(-1)
    ref = bank[np.argmin(d2, -1)]
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_quantize_bank_roundtrip(rng):
    bank = rng.standard_normal((40, 16)).astype(np.float32)
    q, scale = quantize_bank(bank)
    assert q.dtype == jnp.int8 and scale.shape == (40, 1)
    deq = np.asarray(q, np.float32) * np.asarray(scale)
    # symmetric per-row int8: max error = half a quantization step per row
    step = np.asarray(scale)[:, 0]
    assert np.all(np.abs(deq - bank) <= 0.5 * step[:, None] + 1e-7)


def test_nearest_rows_q_interpret(rng):
    """int8-bank search returns the dequantized argmin row (vs int8-bank
    brute force — the quantization is the bank's, not the kernel's)."""
    T, D, N = 7, 16, 2 * TN + 700  # spans >2 bank tiles: running-min must carry
    feats = rng.standard_normal((T, D)).astype(np.float32)
    bank = rng.standard_normal((N, D)).astype(np.float32)
    q, scale = quantize_bank(bank)
    deq = np.asarray(q, np.float32) * np.asarray(scale)
    out = np.asarray(nearest_rows_q(jnp.asarray(feats), q, scale, interpret=True))
    d2 = ((feats[:, None] - deq[None]) ** 2).sum(-1)
    ref = deq[np.argmin(d2, -1)]
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_blend_into_q_matches_fp32(rng):
    """End-to-end int8 blend stays within quantization noise of the fp32
    path on well-separated banks (nearest row identical)."""
    B, T, D, N = 1, 5, 16, 30
    bank = (rng.standard_normal((N, D)) * 4.0).astype(np.float32)
    feats = (bank[rng.integers(0, N, T)] + 0.05 * rng.standard_normal((T, D))
             ).astype(np.float32)[None]
    q, scale = quantize_bank(bank)
    out_q = np.asarray(blend_into_q(jnp.asarray(feats), q, scale, 0.75,
                                    interpret=True))
    out_f = np.asarray(blend_into(jnp.asarray(feats), jnp.asarray(bank), 0.75,
                                  interpret=True))
    assert np.max(np.abs(out_q - out_f)) < 0.05  # ≤ one int8 step of the bank


def test_blend_into_q_sharded_matches_single(rng):
    """The shard_map wrapper (chunk batch dp-sharded over an 8-device mesh,
    bank replicated) must return exactly the single-device result — the
    kernel is embarrassingly parallel over query rows. This is the sharding
    layout the real multi-chip serving path uses (convert.py core); on CPU
    the kernel runs in interpreter mode, on TPU the identical shard_map
    traces the Mosaic kernel."""
    import jax.numpy as jnp

    from rvc_tpu.ops.pallas_retrieval import blend_into_q_sharded
    from rvc_tpu.parallel.mesh import make_mesh

    B, T, D, N = 8, 5, 16, 40
    feats = rng.standard_normal((B, T, D)).astype(np.float32)
    bank = rng.standard_normal((N, D)).astype(np.float32)
    q, scale = quantize_bank(bank)
    mesh = make_mesh(8)
    out_sharded = np.asarray(blend_into_q_sharded(
        jnp.asarray(feats), q, scale, jnp.float32(0.75), mesh,
        interpret=True))
    out_single = np.asarray(blend_into_q(jnp.asarray(feats), q, scale, 0.75,
                                         interpret=True))
    np.testing.assert_array_equal(out_sharded, out_single)


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
