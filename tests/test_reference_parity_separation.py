"""Reference-parity for separation + pitch models: run the actual reference
torch implementations (librosa stubbed with our own filterbank — same
published formula) with shared random weights and compare outputs."""
import sys
import types

import numpy as np
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.parity]  # torch reference parity

REF_LIB = "/root/reference/lib"


@pytest.fixture(scope="module")
def ref_path():
    # stub librosa (reference modules import it at module level; only the
    # mel filterbank function is used by the models we exercise here).
    # Everything installed here is removed again in the teardown below so
    # no stub or reference module leaks into other test files (the round-1
    # whisper-parity order-dependence came from exactly this kind of leak).
    installed_stubs = []
    if "librosa" not in sys.modules:
        installed_stubs += ["librosa", "librosa.filters", "librosa.util"]
        import numpy as _np

        from rvc_tpu.ops.mel import _mel_filterbank_np

        librosa = types.ModuleType("librosa")
        filters = types.ModuleType("librosa.filters")

        def mel(sr, n_fft, n_mels=128, fmin=0.0, fmax=None, htk=False, **kw):
            return _np.ascontiguousarray(
                _mel_filterbank_np(sr, n_fft, n_mels, float(fmin),
                                   None if fmax is None else float(fmax), htk=htk).T)

        filters.mel = mel
        librosa.filters = filters
        util = types.ModuleType("librosa.util")

        def pad_center(data, size, **kw):
            n = size - len(data)
            lpad = n // 2
            return _np.pad(data, (lpad, n - lpad))

        util.pad_center = pad_center
        util.tiny = lambda x: _np.finfo(_np.float32).tiny
        util.normalize = lambda x, **kw: x / (_np.abs(x).max() or 1.0)
        librosa.util = util
        import importlib.machinery as _im

        for mod in (librosa, filters, util):
            mod.__spec__ = _im.ModuleSpec(mod.__name__, loader=None)
        sys.modules["librosa"] = librosa
        sys.modules["librosa.filters"] = filters
        sys.modules["librosa.util"] = util
    if "soundfile" not in sys.modules:
        import importlib.machinery as _im

        sf = types.ModuleType("soundfile")
        sf.__spec__ = _im.ModuleSpec("soundfile", loader=None)
        sys.modules["soundfile"] = sf
        installed_stubs.append("soundfile")
    path_added = REF_LIB not in sys.path
    if path_added:
        sys.path.insert(0, REF_LIB)
    yield REF_LIB
    # teardown: unstub, drop the reference path, purge reference modules
    for name in installed_stubs:
        sys.modules.pop(name, None)
    if path_added and REF_LIB in sys.path:
        sys.path.remove(REF_LIB)
    for name, mod in list(sys.modules.items()):
        if getattr(mod, "__file__", None) and \
                str(getattr(mod, "__file__", "")).startswith("/root/reference"):
            sys.modules.pop(name, None)


def _load_module(name: str, path: str):
    import importlib.util

    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_tfc_tdf_net_matches_reference(ref_path, rng):
    """MDX23C TFC-TDF U-net vs reference karafan/tfc_tdf.py."""
    import torch
    from types import SimpleNamespace as NS

    import jax
    import jax.numpy as jnp

    TFC_TDF_net = _load_module(
        "ref_tfc_tdf", f"{ref_path}/karafan/tfc_tdf.py").TFC_TDF_net

    from rvc_tpu.compat.torch_import import build_tree
    from rvc_tpu.models.mdx_net import TFCTDFNet

    config = NS(
        model=NS(norm="InstanceNorm", act="gelu", num_subbands=2, num_scales=2,
                 scale=[2, 2], num_blocks_per_scale=1, num_channels=8, growth=8,
                 bottleneck_factor=2),
        training=NS(target_instrument=None, instruments=["vocals", "other"]),
        audio=NS(num_channels=2, dim_f=64, n_fft=128, hop_length=32),
    )
    torch.manual_seed(0)
    ref = TFC_TDF_net(config).eval()

    B, T, F = 1, 8, 64
    dim_c = 2 * 2  # channels*2 (complex-as-channels)
    spec = rng.standard_normal((B, T, F, dim_c)).astype(np.float32)

    # reference forward operates wave->wave; drive its core: cac2cws etc.
    # feed the packed spec directly through the net's inner ops
    x_t = torch.from_numpy(spec.transpose(0, 3, 2, 1))  # (B, C, F, T)
    with torch.no_grad():
        mix = x = ref.cac2cws(x_t)
        first_conv_out = x = ref.first_conv(x)
        x = x.transpose(-1, -2)
        enc_outs = []
        for block in ref.encoder_blocks:
            x = block.tfc_tdf(x)
            enc_outs.append(x)
            x = block.downscale(x)
        x = ref.bottleneck_block(x)
        for block in ref.decoder_blocks:
            x = block.upscale(x)
            x = torch.cat([x, enc_outs.pop()], 1)
            x = block.tfc_tdf(x)
        x = x.transpose(-1, -2)
        x = x * first_conv_out
        x = ref.final_conv(torch.cat([mix, x], 1))
        x = ref.cws2cac(x)
        o_ref = x.numpy()  # (B, n_targets*dim_c? ...) reshaped below
    o_ref = o_ref.reshape(B, 2, dim_c, F, T).transpose(0, 1, 4, 3, 2)

    renames = [
        (r"encoder_blocks\.(\d+)\.tfc_tdf", r"encoder_blocks_\1_tfc_tdf"),
        (r"decoder_blocks\.(\d+)\.tfc_tdf", r"decoder_blocks_\1_tfc_tdf"),
        (r"encoder_blocks\.(\d+)\.downscale\.conv\.(\d+)", r"encoder_blocks_\1_downscale_\2"),
        (r"decoder_blocks\.(\d+)\.upscale\.conv\.(\d+)", r"decoder_blocks_\1_upscale_\2"),
        (r"blocks\.(\d+)\.tfc1\.(\d+)", r"blocks_\1_tfc1_\2"),
        (r"blocks\.(\d+)\.tfc2\.(\d+)", r"blocks_\1_tfc2_\2"),
        (r"blocks\.(\d+)\.tdf\.(\d+)", r"blocks_\1_tdf_\2"),
        (r"blocks\.(\d+)\.shortcut", r"blocks_\1_shortcut"),
        (r"final_conv\.(\d+)", r"final_conv_\1"),
    ]
    params = {"params": build_tree(ref.state_dict(), renames=renames)}
    mine = TFCTDFNet(num_targets=2, num_subbands=2, num_channels_audio=2,
                     num_scales=2, scale=(2, 2), num_blocks_per_scale=1,
                     c=8, g=8, bn=2, dim_f=64, norm="InstanceNorm", act="gelu")
    o_mine = np.asarray(mine.apply(params, jnp.asarray(spec)))
    assert o_mine.shape == o_ref.shape
    np.testing.assert_allclose(o_mine, o_ref, atol=2e-4)


def test_cascaded_asppnet_matches_reference(ref_path, rng):
    """VR CascadedASPPNet mask vs reference uvr5_pack/vr_network/nets.py."""
    import torch

    import jax
    import jax.numpy as jnp

    from uvr5_pack.vr_network.nets import CascadedASPPNet as RefNet

    from rvc_tpu.models.vr_network import CascadedASPPNet

    n_fft = 64
    torch.manual_seed(0)
    ref = RefNet(n_fft).eval()
    B, T = 1, 512  # bins = n_fft//2
    mag = rng.uniform(0, 1, (B, 2, n_fft // 2 + 1, T)).astype(np.float32)
    with torch.no_grad():
        pred = ref(torch.from_numpy(mag))  # mask * mix
    o_ref = pred.numpy()

    from rvc_tpu.compat.torch_import import vr_params_from_state_dict

    params = vr_params_from_state_dict(ref.state_dict())
    mine = CascadedASPPNet(n_fft)
    x = jnp.asarray(mag.transpose(0, 3, 2, 1))  # (B, T, bins, 2)
    mask = np.asarray(mine.apply(params, x))
    o_mine = (mask * mag.transpose(0, 3, 2, 1)).transpose(0, 3, 2, 1)
    assert o_mine.shape == o_ref.shape
    np.testing.assert_allclose(o_mine, o_ref, atol=2e-4)


def test_rmvpe_e2e_matches_reference(ref_path, rng):
    """RMVPE salience network vs reference lib/rmvpe.py E2E."""
    import torch

    import jax
    import jax.numpy as jnp

    ref_rmvpe = _load_module("ref_rmvpe", f"{ref_path}/rmvpe.py")

    from rvc_tpu.compat.torch_import import rmvpe_params_from_state_dict
    from rvc_tpu.models.rmvpe import E2E

    torch.manual_seed(0)
    ref = ref_rmvpe.E2E(4, 1, (2, 2)).eval()
    B, T = 1, 32
    mel = rng.standard_normal((B, 128, T)).astype(np.float32)  # (B, mels, T)
    with torch.no_grad():
        hidden_ref = ref(torch.from_numpy(mel)).numpy()  # (B, T, 360)

    params = rmvpe_params_from_state_dict(ref.state_dict())
    mine = E2E()
    hidden = np.asarray(mine.apply({"params": params["params"]["model"]},
                                   jnp.asarray(mel.transpose(0, 2, 1))))
    assert hidden.shape == hidden_ref.shape
    np.testing.assert_allclose(hidden, hidden_ref, atol=5e-4)


@pytest.mark.parametrize("iterations,residual,softmask", [
    (0, False, False), (1, False, False), (2, True, False), (1, False, True),
])
def test_wiener_matches_reference(ref_path, rng, iterations, residual, softmask):
    """ops/wiener.py vs the reference OpenUnmix-derived EM filter
    (lib/uvr5_pack/demucs/filtering.py:336) on random spectra."""
    import torch

    import jax.numpy as jnp

    from rvc_tpu.ops.wiener import wiener

    ref_filt = _load_module("ref_filtering",
                            f"{ref_path}/uvr5_pack/demucs/filtering.py")
    T, F, C, S = 11, 17, 2, 3
    mag = np.abs(rng.standard_normal((T, F, C, S))).astype(np.float32)
    mix_c = (rng.standard_normal((T, F, C)) +
             1j * rng.standard_normal((T, F, C))).astype(np.complex64)

    with torch.no_grad():
        y_ref = ref_filt.wiener(
            torch.from_numpy(mag),
            torch.view_as_real(torch.from_numpy(mix_c)),
            iterations, softmask=softmask, residual=residual,
        ).numpy()
    y_ref = y_ref[..., 0, :] + 1j * y_ref[..., 1, :]
    if residual:
        y_ref = y_ref[..., :S]

    # win_len > T → single EM window, directly comparable to one ref call
    y = np.asarray(wiener(jnp.asarray(mag), jnp.asarray(mix_c), iterations,
                          softmask=softmask, residual=residual, win_len=32))
    np.testing.assert_allclose(y.real, y_ref.real, atol=2e-4)
    np.testing.assert_allclose(y.imag, y_ref.imag, atol=2e-4)


def test_wiener_windowed_matches_reference(ref_path, rng):
    """The 300-frame windowed EM of reference hdemucs.py:655-668: windows
    are independent EM problems — compare a win_len=4 run against separate
    reference calls per window."""
    import torch

    import jax.numpy as jnp

    from rvc_tpu.ops.wiener import wiener

    ref_filt = _load_module("ref_filtering2",
                            f"{ref_path}/uvr5_pack/demucs/filtering.py")
    T, F, C, S = 10, 9, 2, 2
    win = 4
    mag = np.abs(rng.standard_normal((T, F, C, S))).astype(np.float32)
    mix_c = (rng.standard_normal((T, F, C)) +
             1j * rng.standard_normal((T, F, C))).astype(np.complex64)

    outs = []
    with torch.no_grad():
        for pos in range(0, T, win):
            sl = slice(pos, pos + win)
            z = ref_filt.wiener(
                torch.from_numpy(mag[sl]),
                torch.view_as_real(torch.from_numpy(mix_c[sl])),
                1, residual=True,
            ).numpy()
            outs.append(z[..., 0, :] + 1j * z[..., 1, :])
    y_ref = np.concatenate(outs, axis=0)[..., :S]

    y = np.asarray(wiener(jnp.asarray(mag), jnp.asarray(mix_c), 1,
                          residual=True, win_len=win))
    np.testing.assert_allclose(y.real, y_ref.real, atol=2e-4)
    np.testing.assert_allclose(y.imag, y_ref.imag, atol=2e-4)


def test_cascaded_net_matches_reference(ref_path, rng):
    """VR 'new' CascadedNet (DeEcho family) vs reference nets_new.py."""
    import torch

    import jax
    import jax.numpy as jnp

    from uvr5_pack.vr_network.nets_new import CascadedNet as RefNet

    from rvc_tpu.compat.torch_import import build_tree, vr_params_from_state_dict
    from rvc_tpu.models.vr_network import CascadedNet

    n_fft, nout, nout_lstm = 64, 8, 16
    torch.manual_seed(0)
    ref = RefNet(n_fft, nout=nout, nout_lstm=nout_lstm).eval()
    B, T = 1, 128
    mag = rng.uniform(0, 1, (B, 2, n_fft // 2 + 1, T)).astype(np.float32)
    with torch.no_grad():
        mask_ref = ref(torch.from_numpy(mag)).numpy()

    import re

    import numpy as _np

    from rvc_tpu.compat.torch_import import _VR_RENAMES

    renames = [(r"\.dec(\d)\.conv1\.", r".dec\1.conv.")] + list(_VR_RENAMES)
    tree = build_tree(ref.state_dict(), renames=renames,
                      skip=(r"num_batches_tracked", r"aux_out"))

    def transpose_convs(node):
        if isinstance(node, dict):
            return {k: transpose_convs(v) for k, v in node.items()}
        arr = _np.asarray(node)
        if arr.ndim == 4:
            return _np.ascontiguousarray(arr.transpose(0, 1, 3, 2))
        return arr

    params = {"params": transpose_convs(tree)}
    mine = CascadedNet(n_fft, nout=nout, nout_lstm=nout_lstm)
    x = jnp.asarray(mag.transpose(0, 3, 2, 1))
    mask = np.asarray(mine.apply(params, x)).transpose(0, 3, 2, 1)
    assert mask.shape == mask_ref.shape
    np.testing.assert_allclose(mask, mask_ref, atol=5e-4)


_WHISPER_REF_SCRIPT = r"""
import sys, types, importlib.machinery
import numpy as np

def stub(name):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules.setdefault(name, m)

for name in ("tiktoken", "numba", "ffmpeg", "more_itertools"):
    stub(name)
sys.path.insert(0, "/root/reference/lib/musetalk/whisper")
import torch
import whisper.model as WM

inp = np.load(sys.argv[1])
dims_kw = {k: int(v) for k, v in np.load(sys.argv[3]).items()}
torch.manual_seed(0)
ref = WM.Whisper(WM.ModelDimensions(**dims_kw)).eval()
# The vendored TextDecoder leaves positional_embedding as torch.empty()
# (model.py:179) — UNINITIALIZED memory, normally overwritten by checkpoint
# load. With random init it may contain NaN depending on heap history (the
# actual root cause of the round-1 order-dependent flake). Initialize it
# deterministically; the state_dict carries it over to the Flax side.
with torch.no_grad():
    pe = np.random.default_rng(7).standard_normal(
        ref.decoder.positional_embedding.shape) * 0.02
    ref.decoder.positional_embedding.copy_(torch.from_numpy(pe).float())
mel = torch.from_numpy(inp["mel"])
tokens = torch.from_numpy(inp["tokens"]).long()
with torch.no_grad():
    enc = ref.encoder(mel)
    logits = ref.decoder(tokens, enc)
out = {"enc": enc.numpy(), "logits": logits.numpy()}
out.update({"sd." + k: v.numpy() for k, v in ref.state_dict().items()})
np.savez(sys.argv[2], **out)
"""


def test_whisper_matches_reference(rng, tmp_path):
    """Flax Whisper vs the reference's vendored (modified) OpenAI whisper.

    The reference side runs in a SUBPROCESS with a clean interpreter: the
    vendored package needs tiktoken/numba stubs and a sys.path insert, and
    leaking those into this process made the comparison order-dependent
    (round-1 flake). Weights + activations cross over via an npz file."""
    import subprocess

    import jax.numpy as jnp

    from rvc_tpu.models.whisper import (
        Whisper,
        WhisperDims,
        whisper_params_from_state_dict,
    )

    dims_kw = dict(n_mels=80, n_audio_ctx=100, n_audio_state=32, n_audio_head=2,
                   n_audio_layer=2, n_vocab=100, n_text_ctx=24, n_text_state=32,
                   n_text_head=2, n_text_layer=2)
    mel = rng.standard_normal((1, 80, 200)).astype(np.float32)
    tokens = rng.integers(0, 100, (1, 5))

    inp, outp, dimsp = (str(tmp_path / n) for n in ("in.npz", "out.npz", "dims.npz"))
    np.savez(inp, mel=mel, tokens=tokens)
    np.savez(dimsp, **{k: np.int64(v) for k, v in dims_kw.items()})
    script = tmp_path / "ref_whisper.py"
    script.write_text(_WHISPER_REF_SCRIPT)
    proc = subprocess.run(
        [sys.executable, str(script), inp, outp, dimsp],
        capture_output=True, text=True, timeout=300,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    ref = np.load(outp)
    enc_ref, logits_ref = ref["enc"], ref["logits"]
    assert np.isfinite(enc_ref).all() and np.isfinite(logits_ref).all()
    sd = {k[3:]: ref[k] for k in ref.files if k.startswith("sd.")}

    params = whisper_params_from_state_dict(sd)
    mine = Whisper(WhisperDims(**dims_kw))
    enc = mine.apply(params, jnp.asarray(mel.transpose(0, 2, 1)),
                     method=Whisper.embed_audio)
    np.testing.assert_allclose(np.asarray(enc), enc_ref, atol=2e-4)
    logits = mine.apply(params, jnp.asarray(tokens), jnp.asarray(enc_ref),
                        method=Whisper.logits)
    np.testing.assert_allclose(np.asarray(logits), logits_ref, atol=2e-4)
