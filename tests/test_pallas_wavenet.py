"""Fused WaveNet (WN) kernel vs the unfused module — values and grads.

Interpreter mode on CPU; the same code dispatches Mosaic kernels on TPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvc_tpu.models.layers import sequence_mask
from rvc_tpu.models.wavenet import WN


def build(C=32, k=5, L=4, gin=8, fuse=False):
    return WN(hidden_channels=C, kernel_size=k, dilation_rate=1, n_layers=L,
              gin_channels=gin, fuse=fuse)


@pytest.mark.parametrize("B,T,L,lengths", [
    (2, 50, 4, (50, 33)),       # ragged mask
    (1, 1100, 3, (1100,)),      # spans >1 TILE_WN: halo + overlap-add
])
def test_fused_wn_matches_unfused(B, T, L, lengths, rng):
    C, k, gin = 32, 5, 8
    wn = build(C, k, L, gin)
    wn_f = build(C, k, L, gin, fuse=True)
    mask = sequence_mask(jnp.asarray(lengths, jnp.int32), T).astype(jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32)) * mask
    g = jnp.asarray(rng.standard_normal((B, 1, gin)).astype(np.float32))
    params = wn.init(jax.random.PRNGKey(0), x, mask, g=g)
    ref = wn.apply(params, x, mask, g=g)
    got = wn_f.apply(params, x, mask, g=g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_fused_wn_param_tree_identical(rng):
    C, k, L, gin = 32, 5, 3, 8
    x = jnp.zeros((1, 40, C))
    mask = jnp.ones((1, 40, 1))
    g = jnp.zeros((1, 1, gin))
    p_plain = build(C, k, L, gin).init(jax.random.PRNGKey(0), x, mask, g=g)
    shapes_fused = jax.tree.map(jnp.shape, jax.eval_shape(
        lambda: build(C, k, L, gin, fuse=True).init(
            jax.random.PRNGKey(0), x, mask, g=g)))
    assert jax.tree.map(jnp.shape, p_plain) == shapes_fused


def test_fused_wn_grads_match_autodiff(rng):
    """Full VJP (dx, all conv weights through weight-norm, cond layer) vs
    XLA autodiff of the unfused module."""
    C, k, L, gin = 32, 5, 4, 8
    B, T = 2, 60
    wn = build(C, k, L, gin)
    wn_f = build(C, k, L, gin, fuse=True)
    mask = sequence_mask(jnp.asarray((60, 41), jnp.int32), T).astype(jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32)) * mask
    g = jnp.asarray(rng.standard_normal((B, 1, gin)).astype(np.float32))
    params = wn.init(jax.random.PRNGKey(0), x, mask, g=g)
    cot = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))

    def loss(mod):
        def f(p, x_, g_):
            return jnp.sum(mod.apply(p, x_, mask, g=g_) * cot)
        return f

    gp_r, gx_r, gg_r = jax.grad(loss(wn), argnums=(0, 1, 2))(params, x, g)
    gp_f, gx_f, gg_f = jax.grad(loss(wn_f), argnums=(0, 1, 2))(params, x, g)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=5e-5, rtol=5e-5)
    np.testing.assert_allclose(np.asarray(gg_f), np.asarray(gg_r),
                               atol=5e-5, rtol=5e-5)
    flat_r = jax.tree_util.tree_leaves_with_path(gp_r)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gp_f))
    for path, leaf_r in flat_r:
        leaf_f = flat_f[path]
        scale = max(1e-6, float(np.max(np.abs(np.asarray(leaf_r)))))
        np.testing.assert_allclose(
            np.asarray(leaf_f) / scale, np.asarray(leaf_r) / scale,
            atol=1e-4, err_msg=str(path))


def test_fused_wn_multi_group(rng):
    """L=16 (the posterior encoder) spans two chained kernel groups —
    values and end-to-end grads still match the unfused module."""
    C, k, L, gin = 32, 5, 16, 8
    B, T = 1, 80
    wn = build(C, k, L, gin)
    wn_f = build(C, k, L, gin, fuse=True)
    mask = jnp.ones((B, T, 1), jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((B, 1, gin)).astype(np.float32))
    params = wn.init(jax.random.PRNGKey(0), x, mask, g=g)
    ref = wn.apply(params, x, mask, g=g)
    got = wn_f.apply(params, x, mask, g=g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)
    gp_r = jax.grad(lambda p: jnp.sum(wn.apply(p, x, mask, g=g) ** 2))(params)
    gp_f = jax.grad(lambda p: jnp.sum(wn_f.apply(p, x, mask, g=g) ** 2))(params)
    for lr, lf in zip(jax.tree.leaves(gp_r), jax.tree.leaves(gp_f)):
        scale = max(1e-6, float(np.max(np.abs(np.asarray(lr)))))
        np.testing.assert_allclose(np.asarray(lf) / scale,
                                   np.asarray(lr) / scale, atol=2e-4)
