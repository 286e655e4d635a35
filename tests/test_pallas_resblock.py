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


@pytest.mark.parametrize("C,S,k,T", [(32, 4, 3, 500), (128, 1, 3, 300),
                                     (32, 4, 11, 1100)])
def test_fused_train_grads_match_autodiff(C, S, k, T, rng):
    """The custom-VJP backward kernel (recompute-in-VMEM) must reproduce
    XLA autodiff of the unfused chain: dx, all 6 dW (through the tap
    transform back to torch layout) and db, to f32 tolerance. T=1100
    spans multiple TILE=1024 tiles so the slab overlap-add and per-tile
    dW ownership accumulation are exercised."""
    from rvc_tpu.models.layers import _norm_except_dim0
    from rvc_tpu.ops.pallas_resblock import fused_resblock1_train

    dilation = (1, 3, 5)
    rb = ResBlock1(C, k, dilation, s2d=S)
    x = jnp.asarray(rng.standard_normal((2, T, S * C)).astype(np.float32))
    params = rb.init(jax.random.PRNGKey(0), x)
    convs = _convs_from_params(params, k, dilation)
    ws = tuple(w for (w, _, _, _) in convs)
    bs = tuple(b for (_, b, _, _) in convs)
    cot = jnp.asarray(rng.standard_normal((2, T, S * C)).astype(np.float32))

    def loss_fused(x_, ws_, bs_):
        cv = [(w, b, k, d) for w, b, (_, _, _, d) in zip(ws_, bs_, convs)]
        out = fused_resblock1_train(x_, cv, S=S, interpret=True)
        return jnp.sum(out * cot)

    def loss_ref(x_, ws_, bs_):
        out = x_
        for i in range(0, 6, 2):
            t = _ref_conv(jax.nn.leaky_relu(out, 0.1), ws_[i], bs_[i],
                          convs[i][3], S)
            t = _ref_conv(jax.nn.leaky_relu(t, 0.1), ws_[i + 1], bs_[i + 1],
                          convs[i + 1][3], S)
            out = out + t
        return jnp.sum(out * cot)

    gx_f, gw_f, gb_f = jax.grad(loss_fused, argnums=(0, 1, 2))(x, ws, bs)
    gx_r, gw_r, gb_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x, ws, bs)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=2e-4, rtol=2e-4)
    for a, b_, name in [(gw_f, gw_r, "dW"), (gb_f, gb_r, "db")]:
        for i, (af, ar) in enumerate(zip(a, b_)):
            scale = max(1e-6, float(np.max(np.abs(np.asarray(ar)))))
            np.testing.assert_allclose(
                np.asarray(af) / scale, np.asarray(ar) / scale,
                atol=3e-4, err_msg=f"{name}[{i}]")


def _ref_conv(x, w, b, d, S):
    """Unfused reference conv in the packed layout (same math the module
    path uses: _s2d_weight superchannel conv when S > 1)."""
    import jax.lax as lax

    from rvc_tpu.models.layers import _s2d_weight

    k = w.shape[-1]
    padding = (k * d - d) // 2
    if S > 1:
        W2, pl_, pr_ = _s2d_weight(w, S, d, padding)
        y = lax.conv_general_dilated(
            x, W2, window_strides=(1,), padding=[(pl_, pr_)],
            dimension_numbers=("NWC", "OIW", "NWC"))
        if b is not None:
            y = y + jnp.tile(b, S)
    else:
        y = lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=[(padding, padding)],
            rhs_dilation=(d,), dimension_numbers=("NWC", "OIW", "NWC"))
        if b is not None:
            y = y + b
    return y


def test_fused_train_forward_matches_inference_kernel(rng):
    """fused_resblock1_train's primal must equal fused_resblock1."""
    from rvc_tpu.ops.pallas_resblock import fused_resblock1_train

    C, S, k = 32, 4, 3
    rb = ResBlock1(C, k, (1, 3, 5), s2d=S)
    x = jnp.asarray(rng.standard_normal((1, 200, S * C)).astype(np.float32))
    params = rb.init(jax.random.PRNGKey(0), x)
    convs = _convs_from_params(params, k, (1, 3, 5))
    a = fused_resblock1(x, convs, S=S, interpret=True)
    b = fused_resblock1_train(x, convs, S=S, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


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


def test_fused_sharded_matches_single(rng):
    """fused_resblock1_sharded under an 8-device dp mesh (batch rows
    sharded, weights replicated) must equal the single-device kernel —
    the layout multi-chip inference uses (convert.py threads the mesh
    through Synthesizer → GeneratorNSF → ResBlock1)."""
    from rvc_tpu.ops.pallas_resblock import fused_resblock1_sharded
    from rvc_tpu.parallel.mesh import make_mesh

    C, S, k = 32, 4, 3
    rb = ResBlock1(C, k, (1, 3, 5), s2d=S)
    x = jnp.asarray(rng.standard_normal((8, 96, S * C)).astype(np.float32))
    params = rb.init(jax.random.PRNGKey(0), x)
    convs = _convs_from_params(params, k, (1, 3, 5))
    single = fused_resblock1(x, convs, S=S, interpret=True)
    mesh = make_mesh(8)
    sharded = fused_resblock1_sharded(x, convs, mesh, S=S, interpret=True)
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(single))


@pytest.mark.parametrize("C,S", [(128, 1), (32, 4)])
def test_group_matches_unfused_trio(C, S, rng):
    """fused_resblock_group (one kernel per decoder stage: all three
    chains + in-VMEM averaging) vs the unfused sum-then-divide
    (reference models.py:300-311)."""
    from rvc_tpu.ops.pallas_resblock import fused_resblock_group

    dilation = (1, 3, 5)
    x = jnp.asarray(rng.standard_normal((2, 600 // S, S * C)).astype(np.float32))
    chains, refs = [], []
    for k in (3, 7, 11):
        rb = ResBlock1(C, k, dilation, s2d=S)
        params = rb.init(jax.random.PRNGKey(k), x)
        refs.append(rb.apply(params, x))
        chains.append(_convs_from_params(params, k, dilation))
    ref = (refs[0] + refs[1] + refs[2]) / 3
    got = fused_resblock_group(x, chains, S=S, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_group_short_sequence_and_bf16(rng):
    """Group kernel edge cases: sequence shorter than a tile (boundary
    masks dominate) and the bf16 carry (matches unfused to bf16
    resolution — same tolerance the single-chain kernel is held to)."""
    from rvc_tpu.ops.pallas_resblock import fused_resblock_group

    C, S = 32, 4
    dilation = (1, 3, 5)
    x32 = jnp.asarray(rng.standard_normal((1, 48, S * C)).astype(np.float32))
    chains, refs = [], []
    for k in (3, 7, 11):
        rb = ResBlock1(C, k, dilation, s2d=S)
        params = rb.init(jax.random.PRNGKey(k), x32)
        refs.append(rb.apply(params, x32))
        chains.append(_convs_from_params(params, k, dilation))
    ref = (refs[0] + refs[1] + refs[2]) / 3
    got = fused_resblock_group(x32, chains, S=S, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)

    xb = x32.astype(jnp.bfloat16)
    chains_b, refs_b = [], []
    for k in (3, 7, 11):
        rb = ResBlock1(C, k, dilation, s2d=S, dtype=jnp.bfloat16)
        params = rb.init(jax.random.PRNGKey(k), xb)
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
        refs_b.append(rb.apply(params, xb))
        chains_b.append(_convs_from_params(params, k, dilation))
    ref_b = (refs_b[0] + refs_b[1] + refs_b[2]) / 3
    got_b = fused_resblock_group(xb, chains_b, S=S, interpret=True)
    assert got_b.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got_b, np.float32), np.asarray(ref_b, np.float32),
        atol=0.05, rtol=0.05)


def test_group_sharded_matches_single(rng):
    """fused_resblock_group_sharded under an 8-device dp mesh equals the
    single-device group kernel (the multi-chip inference layout)."""
    from rvc_tpu.ops.pallas_resblock import (fused_resblock_group,
                                             fused_resblock_group_sharded)
    from rvc_tpu.parallel.mesh import make_mesh

    C, S = 32, 4
    dilation = (1, 3, 5)
    x = jnp.asarray(rng.standard_normal((8, 96, S * C)).astype(np.float32))
    chains = []
    for k in (3, 7, 11):
        rb = ResBlock1(C, k, dilation, s2d=S)
        params = rb.init(jax.random.PRNGKey(k), x)
        chains.append(_convs_from_params(params, k, dilation))
    single = fused_resblock_group(x, chains, S=S, interpret=True)
    mesh = make_mesh(8)
    sharded = fused_resblock_group_sharded(x, chains, mesh, S=S,
                                           interpret=True)
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(single))
