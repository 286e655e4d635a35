"""Retrieval index and pitch extraction tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvc_tpu.retrieval.index import FeatureIndex, train_index
from rvc_tpu.pitch.extractor import (
    PitchExtractor,
    acf_pitch,
    autotune,
    coarse_f0,
    nan_merge,
    shift_semitones,
)


def test_feature_index_exact_nn(rng):
    bank = rng.standard_normal((50, 8)).astype(np.float32)
    idx = FeatureIndex(bank)
    # query = bank rows + tiny noise → k=1 retrieval returns those rows
    q = bank[[3, 7, 11]][None] + 1e-4 * rng.standard_normal((1, 3, 8)).astype(np.float32)
    out = np.asarray(idx.search_blend(jnp.asarray(q), k=1))
    np.testing.assert_allclose(out[0], bank[[3, 7, 11]], atol=1e-3)


def test_feature_index_blend_rates(rng):
    bank = rng.standard_normal((20, 4)).astype(np.float32)
    idx = FeatureIndex(bank)
    q = jnp.asarray(rng.standard_normal((1, 5, 4)).astype(np.float32))
    out0 = idx.blend_into(q, 0.0)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(q))
    out1 = np.asarray(idx.blend_into(q, 1.0))
    ret = np.asarray(idx.search_blend(q))
    np.testing.assert_allclose(out1, ret, atol=1e-6)
    half = np.asarray(idx.blend_into(q, 0.5))
    np.testing.assert_allclose(half, 0.5 * ret + 0.5 * np.asarray(q), atol=1e-6)


def test_train_index_kmeans(rng):
    # two well-separated blobs → centroids land near blob means
    a = rng.standard_normal((300, 4)).astype(np.float32) + 10
    b = rng.standard_normal((300, 4)).astype(np.float32) - 10
    feats = np.concatenate([a, b])
    idx = train_index(feats, max_rows=100, n_clusters=2, iters=10)
    assert idx.ntotal == 2
    c = np.sort(np.asarray(idx.bank).mean(axis=1))
    assert c[0] < -8 and c[1] > 8


def test_acf_pitch_sine():
    sr = 16000
    t = np.arange(sr * 2) / sr
    for hz in (110.0, 220.0, 440.0):
        x = jnp.asarray((0.5 * np.sin(2 * np.pi * hz * t)).astype(np.float32))[None]
        f0 = np.asarray(acf_pitch(x, sr))
        mid = f0[0, 20:-20]
        voiced = mid[mid > 0]
        assert len(voiced) > 0.9 * len(mid)
        assert abs(np.median(voiced) - hz) / hz < 0.02, (hz, np.median(voiced))


def test_acf_pitch_silence():
    x = jnp.zeros((1, 16000))
    f0 = np.asarray(acf_pitch(x))
    assert (f0 == 0).all()


def test_coarse_f0_range():
    f0 = jnp.asarray([0.0, 50.0, 300.0, 1100.0, 2000.0])
    c = np.asarray(coarse_f0(f0))
    assert c.min() >= 1 and c.max() <= 255
    assert c[1] == 1 and c[3] == 255 and c[4] == 255
    assert 1 < c[2] < 255


def test_shift_and_autotune():
    f0 = jnp.asarray([220.0])
    up = np.asarray(shift_semitones(f0, 12.0))
    np.testing.assert_allclose(up, [440.0], rtol=1e-6)
    snapped = np.asarray(autotune(jnp.asarray([442.0])))
    np.testing.assert_allclose(snapped, [440.0], atol=0.01)


def test_nan_merge():
    stack = jnp.asarray([[100.0, 0.0, 200.0], [110.0, 0.0, 0.0]])
    out = np.asarray(nan_merge(stack, "median"))
    np.testing.assert_allclose(out, [105.0, 0.0, 200.0])


@pytest.mark.heavy
def test_pitch_extractor_dispatch_classical():
    sr = 16000
    t = np.arange(sr) / sr
    x = jnp.asarray((0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32))[None]
    pe = PitchExtractor()
    coarse, f0 = pe.get_f0(x, f0_up_key=0, method="pm")
    assert coarse.shape == f0.shape
    voiced = np.asarray(f0)[np.asarray(f0) > 0]
    assert abs(np.median(voiced) - 220) < 10
    # hybrid merge of the classical trio
    f0h = pe.compute(x, method=["pm", "dio", "harvest"], merge_type="median")
    voiced_h = np.asarray(f0h)[np.asarray(f0h) > 0]
    assert abs(np.median(voiced_h) - 220) < 10


def test_synthesizer_pth_roundtrip(tmp_path, rng):
    """Export to the reference .pth format, reload through the importer."""
    import jax
    from rvc_tpu.models.synthesizer import Synthesizer
    from rvc_tpu.compat.torch_export import save_rvc_checkpoint
    from rvc_tpu.compat.torch_import import (
        load_rvc_checkpoint,
        synthesizer_kwargs_from_config,
    )
    from tests.test_models import TINY

    net = Synthesizer(**TINY)
    B, T = 1, 8
    phone = jnp.asarray(rng.standard_normal((B, T, 24)).astype(np.float32))
    lengths = jnp.array([T])
    pitch = jnp.asarray(rng.integers(1, 255, (B, T)))
    nsff0 = jnp.asarray(rng.uniform(100, 300, (B, T)).astype(np.float32))
    sid = jnp.array([0])
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    params = net.init(rngs, phone, lengths, pitch, nsff0, sid, method=net.infer)

    config = [
        TINY["spec_channels"], TINY["segment_size"], TINY["inter_channels"],
        TINY["hidden_channels"], TINY["filter_channels"], TINY["n_heads"],
        TINY["n_layers"], TINY["kernel_size"], TINY["p_dropout"], TINY["resblock"],
        list(TINY["resblock_kernel_sizes"]), [list(d) for d in TINY["resblock_dilation_sizes"]],
        list(TINY["upsample_rates"]), TINY["upsample_initial_channel"],
        list(TINY["upsample_kernel_sizes"]), TINY["spk_embed_dim"],
        TINY["gin_channels"], TINY["sr"],
    ]
    p = str(tmp_path / "model.pth")
    save_rvc_checkpoint(p, params, config, sr=TINY["sr"], f0=1, version="v2")

    params2, meta = load_rvc_checkpoint(p)
    assert meta["version"] == "v2" and meta["f0"] == 1
    kwargs = synthesizer_kwargs_from_config(meta["config"], "v2", True)
    assert kwargs["upsample_rates"] == TINY["upsample_rates"]

    # all non-enc_q leaves round-trip (fp16 quantization tolerance)
    from rvc_tpu.compat.torch_export import flatten_tree

    flat1 = flatten_tree(params["params"])
    flat2 = flatten_tree(params2["params"])
    kept = {k: v for k, v in flat1.items() if k[0] != "enc_q"}
    assert set(kept) == set(flat2)
    for k in kept:
        np.testing.assert_allclose(flat2[k], kept[k], atol=2e-3, rtol=1e-2)

    # and the reloaded params drive inference identically (fp16 noise aside)
    o1, _, _ = net.apply(params, phone, lengths, pitch, nsff0, sid,
                         method=net.infer, rngs={"noise": jax.random.PRNGKey(2)})
    o2, _, _ = net.apply(params2, phone, lengths, pitch, nsff0, sid,
                         method=net.infer, rngs={"noise": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=5e-2)
