"""THE parity gate: run the actual reference PyTorch synthesizer (mounted
read-only at /root/reference) and our Flax synthesizer with IDENTICAL
weights, and compare outputs — waveform closeness and the <0.1 dB
mel-distance north star (BASELINE.json).

Stochastic sources are disabled on both sides (noise_scale=0 for the
prior; the NSF source noise is patched to zero — with harmonic_num=0 the
fundamental's random initial phase is already 0 on both sides), so the
computation is deterministic and the comparison is exact-up-to-numerics.
"""
import sys
import types

import numpy as np
import pytest

REF_LIB = "/root/reference/lib"


@pytest.fixture(scope="module")
def ref_models():
    ma = types.ModuleType("monotonic_align")
    ma.maximum_path = lambda *a, **k: None
    sys.modules.setdefault("monotonic_align", ma)
    if REF_LIB not in sys.path:
        sys.path.insert(0, REF_LIB)
    import infer_pack.models as M

    return M


CFG = dict(
    spec_channels=129,
    segment_size=16,
    inter_channels=16,
    hidden_channels=16,
    filter_channels=32,
    n_heads=2,
    n_layers=2,
    kernel_size=3,
    p_dropout=0.0,
    resblock="1",
    resblock_kernel_sizes=[3, 5],
    resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]],
    upsample_rates=[10, 4, 2, 2],
    upsample_initial_channel=32,
    upsample_kernel_sizes=[16, 8, 4, 4],
    spk_embed_dim=4,
    gin_channels=8,
    sr=16000,
)


def test_synthesizer_matches_reference(ref_models, rng, monkeypatch):
    import torch

    import jax
    import jax.numpy as jnp

    from rvc_tpu.compat.torch_import import synthesizer_params_from_state_dict
    from rvc_tpu.models import nsf as nsf_mod
    from rvc_tpu.models.synthesizer import Synthesizer

    feat_dim = 768
    B, T = 1, 24
    torch.manual_seed(0)
    ref = ref_models.SynthesizerTrnMs768NSFsid(**CFG, is_half=False).eval()

    phone = rng.standard_normal((B, T, feat_dim)).astype(np.float32)
    pitch = rng.integers(1, 255, (B, T))
    nsff0 = rng.uniform(100, 300, (B, T)).astype(np.float32)

    # deterministic: zero the prior noise and the NSF source noise
    monkeypatch.setattr(torch, "randn_like", lambda x: torch.zeros_like(x))
    monkeypatch.setattr(torch, "rand", lambda *s, **k: torch.zeros(*s, **k))
    with torch.no_grad():
        o_ref, _, _ = ref.infer(
            torch.from_numpy(phone), torch.LongTensor([T]),
            torch.from_numpy(pitch).long(), torch.from_numpy(nsff0),
            torch.LongTensor([1]),
        )
    o_ref = o_ref[0, 0].numpy()

    orig_sine = nsf_mod.sine_source

    def quiet_sine(f0, upp, sampling_rate, key, harmonic_num=0, sine_amp=0.1,
                   noise_std=0.003, voiced_threshold=0.0):
        return orig_sine(f0, upp, sampling_rate, jax.random.PRNGKey(0),
                         harmonic_num, sine_amp, 0.0, voiced_threshold)

    monkeypatch.setattr(nsf_mod, "sine_source", quiet_sine)

    mine = Synthesizer(
        **{**CFG,
           "resblock_kernel_sizes": tuple(CFG["resblock_kernel_sizes"]),
           "resblock_dilation_sizes": tuple(map(tuple, CFG["resblock_dilation_sizes"])),
           "upsample_rates": tuple(CFG["upsample_rates"]),
           "upsample_kernel_sizes": tuple(CFG["upsample_kernel_sizes"])},
        feature_dim=feat_dim, use_f0=True,
    )
    params = {"params": synthesizer_params_from_state_dict(ref.state_dict())}
    o_mine, _, _ = mine.apply(
        params, jnp.asarray(phone), jnp.asarray([T]), jnp.asarray(pitch),
        jnp.asarray(nsff0), jnp.asarray([1]), 0.0,
        method=mine.infer, rngs={"noise": jax.random.PRNGKey(0)},
    )
    o_mine = np.asarray(o_mine)[0, :, 0]

    assert o_mine.shape == o_ref.shape
    # waveform closeness (unvoiced noise disabled; pure numerics differences)
    np.testing.assert_allclose(o_mine, o_ref, atol=5e-3)

    # the north-star metric: <0.1 dB mel distance
    from rvc_tpu.bench.parity import mel_distance_db

    dist = mel_distance_db(o_mine, o_ref, 16000, n_fft=512, hop=128, n_mels=64)
    assert dist < 0.1, f"mel distance {dist:.4f} dB"


def test_rmvpe_mel_frontend_matches_reference(rng):
    """Our HTK mel frontend vs the reference rmvpe STFT+mel math (the
    reference uses a conv-DFT STFT — same transform)."""
    import torch

    import jax.numpy as jnp

    from rvc_tpu.models.rmvpe import mel_frontend

    x = (0.3 * rng.standard_normal(16000)).astype(np.float32)
    mine = np.asarray(mel_frontend(jnp.asarray(x)[None]))[0]  # (T, 128)

    # reference math: torch.stft + librosa htk mel (reimplemented here from
    # the same published formula our ops.mel uses — this cross-checks the
    # jax DFT-matmul stft against torch.stft under the rmvpe settings)
    win = torch.hann_window(1024)
    spec = torch.stft(torch.from_numpy(x)[None], 1024, 160, 1024, window=win,
                      center=True, pad_mode="reflect", return_complex=True)
    mag = spec.abs()[0].numpy()  # (bins, T)
    from rvc_tpu.ops.mel import _mel_filterbank_np

    fb = _mel_filterbank_np(16000, 1024, 128, 30.0, 8000.0, htk=True)  # (bins, mels)
    mel = mag.T @ fb
    ref = np.log(np.clip(mel, 1e-5, None))
    assert mine.shape == ref.shape
    np.testing.assert_allclose(mine, ref, atol=2e-3)
