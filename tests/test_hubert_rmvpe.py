"""HuBERT parity vs HF transformers; RMVPE/CREPE structure tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from rvc_tpu.models.hubert import HubertEncoder, HubertConfig
from rvc_tpu.compat.torch_import import (
    hubert_params_from_state_dict,
    rmvpe_params_from_state_dict,
)


@pytest.fixture(scope="module")
def tiny_hf_hubert():
    from transformers import HubertModel, HubertConfig as HFConfig

    cfg = HFConfig(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
        intermediate_size=64, conv_dim=(16, 16, 16), conv_stride=(5, 2, 2),
        conv_kernel=(10, 3, 3), classifier_proj_size=8,
        do_stable_layer_norm=False, feat_extract_norm="group",
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    )
    torch.manual_seed(0)
    m = HubertModel(cfg).eval()
    m.final_proj = torch.nn.Linear(32, 8)
    return m, cfg


def test_hubert_matches_hf(tiny_hf_hubert):
    m, hf_cfg = tiny_hf_hubert
    x = np.random.default_rng(0).standard_normal((2, 3200)).astype(np.float32)
    with torch.no_grad():
        out = m(torch.from_numpy(x), output_hidden_states=True)
    # reference extract_features v2 == hidden_states[11] for 12 layers;
    # here use layer 2 of 3 (output after 2 layers == hidden_states[2])
    ref = out.hidden_states[2].numpy()

    cfg = HubertConfig(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
        intermediate_size=64, conv_dim=(16, 16, 16), conv_stride=(5, 2, 2),
        conv_kernel=(10, 3, 3), classifier_proj_size=8,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    )
    params = {"params": hubert_params_from_state_dict(m.state_dict())}
    enc = HubertEncoder(cfg)
    y = enc.apply(params, jnp.asarray(x), output_layer=3)
    assert y.shape == ref.shape
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-4)

    # v1-style: final_proj on top of an earlier layer
    with torch.no_grad():
        ref_v1 = m.final_proj(out.hidden_states[1]).numpy()
    y1 = enc.apply(params, jnp.asarray(x), output_layer=2, final_proj=True)
    np.testing.assert_allclose(np.asarray(y1), ref_v1, atol=2e-4)


def test_bigru_matches_torch(rng):
    from rvc_tpu.models.rmvpe import BiGRU

    I, H, B, T = 12, 8, 2, 9
    x = rng.standard_normal((B, T, I)).astype(np.float32)
    gru = BiGRU(I, H)
    params = gru.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tg = torch.nn.GRU(I, H, num_layers=1, batch_first=True, bidirectional=True)
    with torch.no_grad():
        for name in ["weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0",
                     "weight_ih_l0_reverse", "weight_hh_l0_reverse",
                     "bias_ih_l0_reverse", "bias_hh_l0_reverse"]:
            getattr(tg, name).copy_(torch.from_numpy(np.asarray(params["params"][name])))
        ref = tg(torch.from_numpy(x))[0].numpy()
    y = np.asarray(gru.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(y, ref, atol=1e-5)


@pytest.mark.heavy
def test_rmvpe_forward_shapes(rng):
    from rvc_tpu.models.rmvpe import RMVPE

    from conftest import finit

    audio = jnp.asarray((0.1 * rng.standard_normal((1, 16000))).astype(np.float32))
    model = RMVPE()
    params = finit(model, audio)
    f0 = model.apply(params, audio)
    assert f0.shape == (1, 101)  # 1 + 16000//160 frames, center=True
    assert np.isfinite(np.asarray(f0)).all()
    assert (np.asarray(f0) >= 0).all()


def test_rmvpe_decode_cents_matches_numpy(rng):
    from rvc_tpu.models.rmvpe import decode_cents, _CENTS_MAPPING

    sal = rng.uniform(0, 1, (1, 7, 360)).astype(np.float32)
    out = np.asarray(decode_cents(jnp.asarray(sal), thred=0.03))[0]
    # reference to_local_average_cents loop
    s = sal[0]
    center = np.argmax(s, axis=1) + 4
    sp = np.pad(s, ((0, 0), (4, 4)))
    ref = []
    for i in range(s.shape[0]):
        sl = sp[i, center[i] - 4 : center[i] + 5]
        cm = _CENTS_MAPPING[center[i] - 4 : center[i] + 5]
        cents = np.sum(sl * cm) / np.sum(sl)
        if s[i].max() <= 0.03:
            cents = 0.0
        f0 = 10 * 2 ** (cents / 1200)
        ref.append(0.0 if f0 == 10 else f0)
    np.testing.assert_allclose(out, np.array(ref), rtol=1e-4)


@pytest.mark.heavy
def test_crepe_shapes(rng):
    from rvc_tpu.models import crepe

    audio = jnp.asarray((0.1 * rng.standard_normal((1, 3200))).astype(np.float32))
    net = crepe.CrepeNet(capacity="tiny")
    frames = crepe.preprocess_frames(audio, 160)
    assert frames.shape == (1, 21, 1024)
    params = net.init(jax.random.PRNGKey(0), frames.reshape(-1, 1024))
    f0, pd = crepe.predict(params, audio, hop_length=160, capacity="tiny",
                           decoder="weighted_argmax")
    assert f0.shape == (1, 21)
    assert np.isfinite(np.asarray(f0)).all()
    f0v, pdv = crepe.predict(params, audio, hop_length=160, capacity="tiny",
                             decoder="viterbi")
    assert f0v.shape == (1, 21)


def test_viterbi_prefers_smooth_path():
    from rvc_tpu.models.crepe import viterbi_decode

    T = 20
    probs = np.full((1, T, 360), 1e-6, np.float32)
    probs[0, :, 100] = 0.5
    probs[0, 10, 100] = 1e-6
    probs[0, 10, 300] = 0.9  # isolated jump should be smoothed away
    path = np.asarray(viterbi_decode(jnp.asarray(probs)))[0]
    assert (path == 100).sum() >= T - 1
