"""Banded relative-position attention kernel (ops/pallas_attention) vs the
module's XLA path — the kernel must be numerically identical (it replaces
the enc_p attention wholesale on TPU inference)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvc_tpu.models.attention import Encoder, MultiHeadAttention
from rvc_tpu.utils.fastinit import fast_init


def _mha_pair(dtype, T=70, B=3, C=32, H=2, w=10):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, C)), dtype)
    lengths = jnp.asarray([T, T - 17, T - 1], jnp.int32)
    x_mask = (jnp.arange(T)[None, :] < lengths[:, None])[..., None].astype(dtype)
    attn_mask = (x_mask[:, None, :, 0][..., None]
                 * x_mask[:, None, None, :, 0])
    ref = MultiHeadAttention(C, C, H, window_size=w, dtype=dtype)
    fused = MultiHeadAttention(C, C, H, window_size=w, fuse=True, dtype=dtype)
    params = fast_init(functools.partial(ref.init, jax.random.PRNGKey(0)),
                       x, x, attn_mask)
    y_ref = ref.apply(params, x, x, attn_mask)
    y_fused = fused.apply(params, x, x, attn_mask, lengths=lengths)
    return np.asarray(y_ref), np.asarray(y_fused), np.asarray(x_mask)


def test_fused_attention_matches_xla_f32():
    """f32: interpret-mode kernel must agree to float roundoff on the
    valid rows (identical op sequence)."""
    y_ref, y_fused, m = _mha_pair(jnp.float32)
    np.testing.assert_allclose(y_fused * m, y_ref * m, atol=2e-5, rtol=1e-5)


def test_fused_attention_matches_xla_bf16():
    """bf16: same rounding points as the einsum path — near-bit equality
    on valid rows."""
    y_ref, y_fused, m = _mha_pair(jnp.bfloat16)
    a, b = (y_fused * m).astype(np.float32), (y_ref * m).astype(np.float32)
    denom = max(np.abs(b).max(), 1e-6)
    assert np.abs(a - b).max() / denom < 2e-2, np.abs(a - b).max() / denom
    # and the overall signal agrees tightly
    resid = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)
    assert resid < 3e-3, resid


def test_fused_attention_multiblock():
    """T > BQ exercises the query-block grid and key padding (-inf tail):
    the padded columns must not perturb any valid row."""
    from rvc_tpu.ops import pallas_attention as pa

    old = pa.BQ
    pa.BQ = 64  # force multiple blocks + padding at small T
    try:
        y_ref, y_fused, m = _mha_pair(jnp.float32, T=150)
        np.testing.assert_allclose(y_fused * m, y_ref * m, atol=2e-5,
                                   rtol=1e-5)
    finally:
        pa.BQ = old


def test_encoder_fused_matches_unfused():
    """Full 6-layer Encoder with fuse=True vs fuse=False: same params,
    same outputs on every valid frame."""
    dtype = jnp.float32
    B, T, C = 2, 90, 32
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, T, C)), dtype)
    lengths = jnp.asarray([T, T - 13], jnp.int32)
    x_mask = (jnp.arange(T)[None, :] < lengths[:, None])[..., None].astype(dtype)
    enc_ref = Encoder(C, 64, 2, 3, 3, dtype=dtype)
    enc_fused = Encoder(C, 64, 2, 3, 3, fuse=True, dtype=dtype)
    params = fast_init(functools.partial(enc_ref.init, jax.random.PRNGKey(2)),
                       x, x_mask)
    y_ref = np.asarray(enc_ref.apply(params, x, x_mask))
    y_fused = np.asarray(enc_fused.apply(params, x, x_mask))
    m = np.asarray(x_mask)
    np.testing.assert_allclose(y_fused * m, y_ref * m, atol=5e-5, rtol=1e-4)
