"""Exact parity of primitive layers vs torch CPU, and algebraic invariants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from rvc_tpu.models.layers import (
    Conv1d,
    ConvTranspose1d,
    Linear,
    LayerNorm,
    fold_weight_norm,
    sequence_mask,
    rand_slice_segments,
    slice_segments,
)


@pytest.mark.parametrize(
    "ci,co,k,stride,pad,dil,groups",
    [(8, 16, 5, 1, 2, 1, 1), (8, 8, 3, 2, 1, 1, 1), (8, 16, 3, 1, 3, 3, 1), (8, 8, 41, 4, 20, 1, 4)],
)
def test_conv1d_matches_torch(rng, ci, co, k, stride, pad, dil, groups):
    x = rng.standard_normal((2, 64, ci)).astype(np.float32)
    m = Conv1d(ci, co, k, stride=stride, padding=pad, dilation=dil, groups=groups)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    w = np.asarray(params["params"]["weight"])
    b = np.asarray(params["params"]["bias"])
    y = np.asarray(m.apply(params, jnp.asarray(x)))

    tconv = torch.nn.Conv1d(ci, co, k, stride=stride, padding=pad, dilation=dil, groups=groups)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w))
        tconv.bias.copy_(torch.from_numpy(b))
        ref = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(y, ref, atol=2e-5)


@pytest.mark.parametrize("ci,co,k,stride", [(8, 4, 16, 8), (8, 4, 16, 10), (6, 3, 4, 2)])
def test_convtranspose1d_matches_torch(rng, ci, co, k, stride):
    pad = (k - stride) // 2
    x = rng.standard_normal((2, 32, ci)).astype(np.float32)
    m = ConvTranspose1d(ci, co, k, stride=stride, padding=pad)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    w = np.asarray(params["params"]["weight"])
    b = np.asarray(params["params"]["bias"])
    y = np.asarray(m.apply(params, jnp.asarray(x)))

    tconv = torch.nn.ConvTranspose1d(ci, co, k, stride=stride, padding=pad)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w))
        tconv.bias.copy_(torch.from_numpy(b))
        ref = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
    assert y.shape == ref.shape  # exact torch output length (T*stride here)
    np.testing.assert_allclose(y, ref, atol=2e-5)

    # subpixel + space-to-depth packed form must agree exactly too
    m2 = ConvTranspose1d(ci, co, k, stride=stride, padding=pad, s2d=4)
    y2 = np.asarray(m2.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(y2, ref, atol=2e-5)


def test_convtranspose1d_general_geometry_unchanged(rng):
    """K − 2p != stride (demucs geometry) keeps the input-dilated path."""
    ci, co, k, stride = 6, 3, 8, 4
    x = rng.standard_normal((1, 16, ci)).astype(np.float32)
    m = ConvTranspose1d(ci, co, k, stride=stride, padding=0)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    w = np.asarray(params["params"]["weight"])
    b = np.asarray(params["params"]["bias"])
    y = np.asarray(m.apply(params, jnp.asarray(x)))
    tconv = torch.nn.ConvTranspose1d(ci, co, k, stride=stride)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w))
        tconv.bias.copy_(torch.from_numpy(b))
        ref = tconv(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
    assert y.shape == ref.shape
    np.testing.assert_allclose(y, ref, atol=2e-5)


def test_weight_norm_param_and_fold(rng):
    x = rng.standard_normal((1, 16, 4)).astype(np.float32)
    m = Conv1d(4, 6, 3, padding=1, weight_norm=True)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y1 = m.apply(params, jnp.asarray(x))
    # folding weight norm then running a plain conv gives identical output
    folded = fold_weight_norm(params["params"])
    m2 = Conv1d(4, 6, 3, padding=1, weight_norm=False)
    y2 = m2.apply({"params": folded}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)
    # torch weight_norm parity: w = g * v / ||v||_dim0
    v = np.asarray(params["params"]["weight_v"])
    g = np.asarray(params["params"]["weight_g"])
    tw = torch.nn.utils.weight_norm(torch.nn.Conv1d(4, 6, 3, padding=1))
    with torch.no_grad():
        tw.weight_v.copy_(torch.from_numpy(v))
        tw.weight_g.copy_(torch.from_numpy(g))
        tw.bias.copy_(torch.from_numpy(np.asarray(params["params"]["bias"])))
        ref = tw(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(y1), ref, atol=2e-5)


def test_linear_matches_torch(rng):
    x = rng.standard_normal((3, 7, 12)).astype(np.float32)
    m = Linear(12, 5)
    params = m.init(jax.random.PRNGKey(1), jnp.asarray(x))
    y = np.asarray(m.apply(params, jnp.asarray(x)))
    tl = torch.nn.Linear(12, 5)
    with torch.no_grad():
        tl.weight.copy_(torch.from_numpy(np.asarray(params["params"]["weight"])))
        tl.bias.copy_(torch.from_numpy(np.asarray(params["params"]["bias"])))
        ref = tl(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(y, ref, atol=1e-5)


def test_layernorm_matches_torch(rng):
    x = rng.standard_normal((2, 9, 16)).astype(np.float32)
    m = LayerNorm(16)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(m.apply(params, jnp.asarray(x)))
    ref = torch.nn.functional.layer_norm(torch.from_numpy(x), (16,)).numpy()
    np.testing.assert_allclose(y, ref, atol=1e-5)


def test_sequence_mask():
    m = sequence_mask(jnp.array([2, 4]), 5)
    assert m.shape == (2, 5, 1)
    np.testing.assert_array_equal(np.asarray(m[0, :, 0]), [1, 1, 0, 0, 0])


def test_slice_segments(rng):
    x = jnp.asarray(rng.standard_normal((2, 20, 3)).astype(np.float32))
    s, ids = rand_slice_segments(jax.random.PRNGKey(0), x, jnp.array([20, 20]), 8)
    assert s.shape == (2, 8, 3)
    for b in range(2):
        np.testing.assert_array_equal(np.asarray(s[b]), np.asarray(x[b, ids[b] : ids[b] + 8]))
    s2 = slice_segments(x, ids, 8)
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(s))


@pytest.mark.parametrize("I,O,k,s,p,T", [
    (1, 512, 10, 5, 0, 2880),   # HuBERT frontend layer 0 geometry
    (512, 512, 3, 2, 0, 575),   # frontend k=3 layers (odd length)
    (512, 512, 2, 2, 0, 287),   # frontend k=2 layers (Q·s == k tail crop)
    (1, 256, 80, 40, 20, 3456), # NSF noise_conv stage-0 geometry
    (1, 128, 8, 4, 2, 3456),    # NSF noise_conv with padding straddle
    (3, 16, 7, 3, 2, 1001),     # non-divisible everything
])
def test_conv1d_pack_stride_matches_plain(I, O, k, s, p, T, rng):
    """pack_stride (stride-s conv as a stride-1 superframe matmul) must be
    numerically identical to the plain strided lowering for every
    geometry the HuBERT frontend and NSF noise_convs use — including odd
    lengths where the packed form must crop unused tail samples."""
    x = jnp.asarray(rng.standard_normal((2, T, I)).astype(np.float32))
    ref_m = Conv1d(I, O, k, stride=s, padding=p, use_bias=True)
    params = ref_m.init(jax.random.PRNGKey(0), x)
    ref = ref_m.apply(params, x)
    got = Conv1d(I, O, k, stride=s, padding=p, use_bias=True,
                 pack_stride=True).apply(params, x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)
