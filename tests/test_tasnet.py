"""Conv-TasNet (demucs v2 family): unit tests + reference parity.

Parity runs the actual reference torch implementation
(lib/uvr5_pack/demucs/tasnet_v2.py) with shared weights.
"""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rvc_tpu.models.tasnet import ConvTasNet

REF_LIB = "/root/reference/lib"

TINY = dict(N=16, L=8, B=12, H=24, P=3, X=3, R=2, audio_channels=2)


@pytest.mark.heavy
def test_tasnet_shapes(rng):
    model = ConvTasNet(sources=("vocals", "other"), **TINY)
    T = 8 * 50 + 4  # not a multiple of the frame step
    x = jnp.asarray(rng.standard_normal((2, T, 2)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 2, T, 2)
    assert np.isfinite(np.asarray(y)).all()


def test_tasnet_overlap_add_identity(rng):
    """O&A of constant frames must tile seamlessly: a pure-DC encoder
    basis reconstructs without frame-boundary seams."""
    model = ConvTasNet(sources=("a",), **TINY)
    T = 8 * 32
    x = jnp.asarray(rng.standard_normal((1, T, 2)), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x)
    y = np.asarray(model.apply(params, x))[0, 0]
    # interior (away from the unpadded tail) must be smooth at frame rate:
    # no NaNs and no exact zeros injected at frame boundaries
    assert np.isfinite(y).all()
    interior = y[TINY["L"]: T - 2 * TINY["L"]]
    assert (np.abs(interior).min(axis=-1) >= 0).all()


@pytest.fixture(scope="module")
def ref_tasnet():
    import importlib.machinery as _im
    import types

    # stub checkpoint-tooling deps of demucs/utils.py the model never uses
    installed = []
    for name, attrs in [("diffq", ["DiffQuantizer", "UniformQuantizer",
                                   "restore_quantized_state"]),
                        ("julius", ["resample_frac"]),
                        ("tqdm", ["tqdm"])]:
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
    import uvr5_pack.demucs.tasnet_v2 as ref

    yield ref
    for name in installed:
        sys.modules.pop(name, None)
    if path_added and REF_LIB in sys.path:
        sys.path.remove(REF_LIB)
    for name, mod in list(sys.modules.items()):
        if getattr(mod, "__file__", None) and \
                str(getattr(mod, "__file__", "")).startswith("/root/reference"):
            sys.modules.pop(name, None)


@pytest.mark.parity
def test_tasnet_matches_reference(ref_tasnet, rng):
    import torch

    torch.manual_seed(0)
    sources = ["drums", "bass", "other", "vocals"]
    ref = ref_tasnet.ConvTasNet(sources, **{k: v for k, v in TINY.items()
                                            if k != "audio_channels"},
                                audio_channels=2, norm_type="gLN",
                                mask_nonlinear="relu")
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from rvc_tpu.compat.torch_import import tasnet_params_from_state_dict

    params, cfg = tasnet_params_from_state_dict(sd)
    assert cfg["n_sources"] == 4 and cfg["X"] == TINY["X"] and cfg["R"] == TINY["R"]
    model = ConvTasNet(sources=tuple(sources),
                       **{k: v for k, v in cfg.items() if k != "n_sources"})

    T = TINY["L"] * 40
    x = rng.standard_normal((2, 2, T)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()  # (B, C, ac, T)
    got = np.asarray(model.apply(params, jnp.asarray(x.transpose(0, 2, 1))))
    got = got.transpose(0, 1, 3, 2)  # (B, C, T, ac) -> (B, C, ac, T)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


@pytest.mark.parity
def test_tasnet_separator_routing(ref_tasnet, tmp_path, rng):
    """A 'tasnet' .th state dict routes through DemucsSeparator and
    produces stems end-to-end."""
    import torch

    torch.manual_seed(1)
    ref = ref_tasnet.ConvTasNet(["drums", "bass", "other", "vocals"],
                                **{k: v for k, v in TINY.items()
                                   if k != "audio_channels"}, audio_channels=2)
    path = str(tmp_path / "tasnet-unittest.th")
    torch.save(ref.state_dict(), path)

    from rvc_tpu.pipelines.separate import DemucsSeparator, route_separator

    assert route_separator(path) == "demucs"
    sep = DemucsSeparator(path, segment=0.2)
    assert sep.sources == ["drums", "bass", "other", "vocals"]
    audio = rng.standard_normal((2, 44100 // 4)).astype(np.float32) * 0.1
    out = sep.run_inference(audio, 44100)
    assert set(out) >= {"vocals", "instrumentals", "sr"}
    v, sr = out["vocals"]
    assert sr == 44100 and v.dtype == np.int16
