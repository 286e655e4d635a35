"""Fused Pallas ResBlock kernel vs the unfused conv chain.

The kernel (ops/pallas_resblock.py) must match ResBlock1's conv-by-conv
path EXACTLY — including sequence-edge behavior, where the unfused path
zero-pads every conv input (the kernel reproduces this with positional
masks). Runs in interpreter mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvc_tpu.models.layers import _norm_except_dim0
from rvc_tpu.models.nsf import ResBlock1
from rvc_tpu.ops.pallas_resblock import fused_resblock1


def _convs_from_params(params, kernel_size, dilation):
    """Fold weight-norm params into the kernel's (w, b, k, d) tuples."""
    out = []
    for i, d in enumerate(dilation):
        for name, dd in ((f"convs1_{i}", d), (f"convs2_{i}", 1)):
            p = params["params"][name]
            v, g = p["weight_v"], p["weight_g"]
            w = g * v / (_norm_except_dim0(v) + 1e-12)
            out.append((w, p["bias"], kernel_size, dd))
    return out


@pytest.mark.parametrize("C,S,k", [(32, 4, 3), (32, 4, 11), (64, 2, 7),
                                   (128, 1, 11), (256, 1, 3)])
def test_fused_matches_unfused(C, S, k, rng):
    dilation = (1, 3, 5)
    rb = ResBlock1(C, k, dilation, s2d=S)
    T = 1600 // S  # packed frames; not a multiple of the kernel tile
    x = jnp.asarray(rng.standard_normal((2, T, S * C)).astype(np.float32))
    params = rb.init(jax.random.PRNGKey(0), x)
    ref = rb.apply(params, x)
    convs = _convs_from_params(params, k, dilation)
    got = fused_resblock1(x, convs, S=S, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_fused_matches_unfused_bf16(rng):
    """bf16 activations: the kernel carries f32 but rounds every conv input
    and output through bf16, and the leaky-relu slope is rounded to
    bf16(0.1) to match the unfused path's weak-typed promotion — fused and
    unfused must agree to bf16 resolution."""
    C, S, k = 32, 4, 3
    dilation = (1, 3, 5)
    rb = ResBlock1(C, k, dilation, s2d=S, dtype=jnp.bfloat16)
    x = jnp.asarray(
        rng.standard_normal((1, 208, S * C)).astype(np.float32)
    ).astype(jnp.bfloat16)
    params = rb.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    ref = rb.apply(params, x)
    convs = _convs_from_params(params, k, dilation)
    got = fused_resblock1(x, convs, S=S, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.05)


def test_resblock_tile_env_validated(monkeypatch, rng):
    """A bad RVC_TPU_RESBLOCK_TILE must fail loudly, not DMA out of bounds."""
    import rvc_tpu.ops.pallas_resblock as prb

    C, S, k = 32, 4, 3
    rb = ResBlock1(C, k, (1, 3, 5), s2d=S)
    x = jnp.asarray(rng.standard_normal((1, 40, S * C)).astype(np.float32))
    params = rb.init(jax.random.PRNGKey(0), x)
    convs = _convs_from_params(params, k, (1, 3, 5))
    monkeypatch.setattr(prb, "TILE", 12)  # not a multiple of 8
    with pytest.raises(ValueError, match="RVC_TPU_RESBLOCK_TILE"):
        prb.fused_resblock1(x, convs, S=S, interpret=True)
    monkeypatch.setattr(prb, "TILE", 8)  # ≤ halo reach for this chain
    with pytest.raises(ValueError, match="RVC_TPU_RESBLOCK_TILE"):
        prb.fused_resblock1(x, convs, S=S, interpret=True)


def test_fused_flag_param_tree_identical(rng):
    """fuse=True must not change the parameter tree (checkpoint layout)."""
    x = jnp.zeros((1, 64, 128), jnp.float32)
    p_plain = ResBlock1(32, 3, (1, 3, 5), s2d=4).init(jax.random.PRNGKey(0), x)
    p_fused = ResBlock1(32, 3, (1, 3, 5), s2d=4, fuse=True)
    # init traces the fused branch; on CPU the pallas_call would fail at
    # RUN time, but tree structure is decided at trace — use eval_shape
    shapes_plain = jax.tree.map(jnp.shape, p_plain)
    shapes_fused = jax.tree.map(
        jnp.shape, jax.eval_shape(
            lambda: p_fused.init(jax.random.PRNGKey(0), x)))
    assert shapes_plain == shapes_fused


def test_module_fused_branch_matches_on_cpu(rng):
    """ResBlock1(fuse=True) falls back to the interpreter off-accelerator
    and matches the conv path — covers the module wiring (weight
    extraction through Conv1d(return_weights=True)), not just the op."""
    rb = ResBlock1(32, 3, (1, 3, 5), s2d=4)
    rb_f = ResBlock1(32, 3, (1, 3, 5), s2d=4, fuse=True)
    x = jnp.asarray(rng.standard_normal((1, 200, 128)).astype(np.float32))
    params = rb.init(jax.random.PRNGKey(0), x)
    ref = rb.apply(params, x)
    got = rb_f.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_fused_short_sequence(rng):
    """Sequence shorter than one tile (heavy zero padding)."""
    C, S, k = 32, 4, 3
    rb = ResBlock1(C, k, (1, 3, 5), s2d=S)
    x = jnp.asarray(rng.standard_normal((1, 40, S * C)).astype(np.float32))
    params = rb.init(jax.random.PRNGKey(0), x)
    ref = rb.apply(params, x)
    got = fused_resblock1(x, _convs_from_params(params, k, (1, 3, 5)),
                          S=S, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
