"""Reference-parity for hybrid Demucs v3/v4: run the actual reference
torch HDemucs / HTDemucs (lib/uvr5_pack/demucs/) with shared weights and
compare waveform outputs against our TPU-native models/htdemucs.py."""
import sys
import types

import numpy as np
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.parity]  # torch reference parity

REF_LIB = "/root/reference/lib"


@pytest.fixture(scope="module")
def ref_demucs():
    import importlib.machinery as _im

    # stub deps of the reference demucs package that the model forward
    # never touches: julius (resampling, classic Demucs only), omegaconf +
    # diffq (checkpoint tooling in states.py), xformers (sparse attention)
    installed = []
    for name, attrs in [
        ("julius", ["resample_frac"]),
        ("omegaconf", ["OmegaConf", "DictConfig"]),
        ("diffq", ["DiffQuantizer", "UniformQuantizer", "restore_quantized_state"]),
        ("tqdm", ["tqdm"]),
    ]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__spec__ = _im.ModuleSpec(name, loader=None)
            for a in attrs:
                setattr(mod, a, type(a, (), {}))
            sys.modules[name] = mod
            installed.append(name)
    path_added = REF_LIB not in sys.path
    if path_added:
        sys.path.insert(0, REF_LIB)
    import uvr5_pack.demucs.hdemucs as ref_h
    import uvr5_pack.demucs.htdemucs as ref_ht

    yield ref_h, ref_ht
    # teardown: unstub + purge reference modules (no cross-file leakage)
    for name in installed:
        sys.modules.pop(name, None)
    if path_added and REF_LIB in sys.path:
        sys.path.remove(REF_LIB)
    for name, mod in list(sys.modules.items()):
        if getattr(mod, "__file__", None) and \
                str(getattr(mod, "__file__", "")).startswith("/root/reference"):
            sys.modules.pop(name, None)


def _compare(ref_model, mine, x_np, atol):
    import torch

    import jax
    import jax.numpy as jnp

    from rvc_tpu.compat.torch_import import demucs_v4_params_from_state_dict

    with torch.no_grad():
        out_ref = ref_model(torch.from_numpy(x_np.transpose(0, 2, 1)))
    params = demucs_v4_params_from_state_dict(
        {k: v for k, v in ref_model.state_dict().items()})
    out = mine.apply(params, jnp.asarray(x_np))
    out = np.asarray(out)  # (B, S, T, C)
    ref = out_ref.numpy().transpose(0, 1, 3, 2)
    assert out.shape == ref.shape, (out.shape, ref.shape)
    np.testing.assert_allclose(out, ref, atol=atol)


def test_hdemucs_matches_reference(ref_demucs, rng):
    """v3 topology incl. the time/freq merge, GroupNorm start, and DConv
    branches carrying BLSTM + LocalState at the inner layers."""
    import torch

    ref_h, _ = ref_demucs
    from rvc_tpu.models.htdemucs import HDemucs

    torch.manual_seed(0)
    kw = dict(sources=["a", "b"], audio_channels=2, channels=16, depth=3,
              nfft=64, norm_starts=2, dconv_lstm=2, dconv_attn=2,
              wiener_iters=0, end_iters=0)
    ref = ref_h.HDemucs(**kw).eval()
    mine = HDemucs(**{**kw, "sources": ("a", "b")})
    x = (0.3 * rng.standard_normal((1, 640, 2))).astype(np.float32)
    _compare(ref, mine, x, atol=3e-4)


def test_hdemucs_framed_blstm_matches_reference(ref_demucs, rng):
    """Long input exercising the BLSTM 200-step framing/stitch path."""
    import torch

    ref_h, _ = ref_demucs
    from rvc_tpu.models.htdemucs import HDemucs

    torch.manual_seed(3)
    kw = dict(sources=["a", "b"], audio_channels=1, channels=16, depth=2,
              nfft=64, norm_starts=1, dconv_lstm=0, dconv_attn=6)
    ref = ref_h.HDemucs(**kw).eval()
    mine = HDemucs(**{**kw, "sources": ("a", "b")})
    # time branch at layer 0 sees T = 8192/4 = 2048 > 200 → framing engages
    x = (0.3 * rng.standard_normal((1, 8192, 1))).astype(np.float32)
    _compare(ref, mine, x, atol=3e-4)


def test_htdemucs_matches_reference(ref_demucs, rng):
    """v4: all-frequency encoder + cross-domain transformer with
    bottom-channel resampling, LayerScale, GroupNorm-out."""
    import torch

    ref_h, ref_ht = ref_demucs
    from rvc_tpu.models.htdemucs import HTDemucs

    torch.manual_seed(1)
    kw = dict(sources=["a", "b"], audio_channels=2, channels=16, depth=2,
              nfft=512, norm_starts=1, t_layers=3, t_heads=2,
              bottom_channels=8, use_train_segment=False)
    ref = ref_ht.HTDemucs(**kw).eval()
    mine = HTDemucs(**{**kw, "sources": ("a", "b")})
    x = (0.3 * rng.standard_normal((1, 2048, 2))).astype(np.float32)
    _compare(ref, mine, x, atol=3e-4)


def test_htdemucs_train_segment_padding(ref_demucs, rng):
    """use_train_segment inference padding: short input is padded to the
    training segment and cropped back (reference htdemucs.py:527-537)."""
    import torch

    _, ref_ht = ref_demucs
    from rvc_tpu.models.htdemucs import HTDemucs

    torch.manual_seed(2)
    kw = dict(sources=["a"], audio_channels=1, channels=16, depth=2,
              nfft=128, norm_starts=1, t_layers=2, t_heads=2,
              use_train_segment=True, samplerate=1024, segment=2)
    ref = ref_ht.HTDemucs(**kw).eval()
    mine = HTDemucs(**{**kw, "sources": ("a",), "segment": 2.0})
    x = (0.3 * rng.standard_normal((1, 1500, 1))).astype(np.float32)
    _compare(ref, mine, x, atol=3e-4)


def test_hdemucs_noncac_wiener_matches_reference(ref_demucs, rng):
    """Non-CaC checkpoint path: magnitude masks refined by the Wiener EM
    filter (reference hdemucs.py:642-668 + filtering.py:336). Unblocks
    catalog models trained with cac=False."""
    import torch

    ref_h, _ = ref_demucs
    from rvc_tpu.models.htdemucs import HDemucs

    torch.manual_seed(4)
    kw = dict(sources=["a", "b"], audio_channels=2, channels=16, depth=2,
              nfft=64, norm_starts=1, cac=False, wiener_iters=1, end_iters=1)
    ref = ref_h.HDemucs(**kw).eval()
    mine = HDemucs(**{**kw, "sources": ("a", "b")})
    del kw
    x = (0.3 * rng.standard_normal((1, 640, 2))).astype(np.float32)
    _compare(ref, mine, x, atol=5e-4)


def test_hdemucs_noncac_naive_mask_matches_reference(ref_demucs, rng):
    """wiener_iters < 0 → mixture-phase ratio mask (reference _mask:653)."""
    import torch

    ref_h, _ = ref_demucs
    from rvc_tpu.models.htdemucs import HDemucs

    torch.manual_seed(5)
    kw = dict(sources=["a", "b"], audio_channels=2, channels=16, depth=2,
              nfft=64, norm_starts=1, cac=False, wiener_iters=-1, end_iters=-1)
    ref = ref_h.HDemucs(**kw).eval()
    mine = HDemucs(**{**kw, "sources": ("a", "b")})
    x = (0.3 * rng.standard_normal((1, 640, 2))).astype(np.float32)
    _compare(ref, mine, x, atol=3e-4)
