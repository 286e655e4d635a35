"""Separation stack tests (tiny nets, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvc_tpu.models.mdx_net import MDXSpectrogram, TFCTDFNet, ConvTDFNetTrim
from rvc_tpu.models.vr_network import CascadedASPPNet
from rvc_tpu.ops import bands as B
from rvc_tpu.pipelines.separate import MDXSeparator, VRSeparator, make_padding, route_separator


def test_mdx_spectrogram_roundtrip(rng):
    # full-bin pack/unpack is exact; real models crop dim_f < n_bins (lossy
    # top end, same as the reference)
    sp = MDXSpectrogram(dim_f=257, dim_t=32, n_fft=512, hop=128)
    x = rng.standard_normal((2, 2, sp.chunk_size)).astype(np.float32)
    spec = sp.pack(jnp.asarray(x))
    assert spec.shape == (2, 32, 257, 4)
    y = np.asarray(sp.unpack(spec))
    # center trim region reconstructs (edges lose OLA coverage)
    t = sp.trim
    np.testing.assert_allclose(y[:, :, t:-t], x[:, :, t:-t], atol=1e-3)


@pytest.mark.heavy
def test_conv_tdf_net_shapes(rng):
    net = ConvTDFNetTrim(num_blocks=5, l=1, g=4, bn=2, dim_f=64, norm="GroupNorm2")
    x = jnp.asarray(rng.standard_normal((1, 16, 64, 4)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(params, x)
    assert y.shape == (1, 16, 64, 4)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.heavy
def test_tfc_tdf_net_shapes(rng):
    net = TFCTDFNet(num_targets=2, num_subbands=2, num_scales=2, scale=(2, 2),
                    num_blocks_per_scale=1, c=4, g=4, bn=2, dim_f=64)
    # packed spec input: (B, T, F, C=num_channels*2)
    x = jnp.asarray(rng.standard_normal((1, 8, 64, 4)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(params, x)
    assert y.shape == (1, 2, 8, 64, 4)
    assert np.isfinite(np.asarray(y)).all()


def test_make_padding():
    left, right, roi = make_padding(1000, 512, 128)
    assert left == 128
    assert roi == 256
    assert (1000 % roi) + right - left == roi


def test_band_spectrogram_roundtrip(rng):
    mp = B.ModelParameters()
    x = (0.3 * rng.standard_normal((2, 44100))).astype(np.float32)
    spec = B.wave_to_spectrogram(x, 512, 1536)
    assert spec.shape[0] == 2 and spec.shape[1] == 769
    y = B.spectrogram_to_wave(spec, 512)
    n = min(y.shape[-1], x.shape[-1])
    np.testing.assert_allclose(y[:, 2000 : n - 2000], x[:, 2000 : n - 2000], atol=1e-3)


def test_band_combine_and_reconstruct(rng):
    """Full 2-band default params: combine then reconstruct runs and yields
    audio at the top-band rate."""
    mp = B.ModelParameters()
    p = mp.param
    sr_hi = p["band"][2]["sr"]
    x = (0.2 * rng.standard_normal((2, sr_hi))).astype(np.float32)
    waves = {2: x, 1: np.asarray(B._resample_np(x, sr_hi, p["band"][1]["sr"]))}
    specs = {
        d: B.wave_to_spectrogram(waves[d], p["band"][d]["hl"], p["band"][d]["n_fft"])
        for d in (1, 2)
    }
    comb = B.combine_spectrograms(specs, mp)
    assert comb.shape[1] == p["bins"] + 1
    wav = B.cmb_spectrogram_to_wave(comb, mp)
    assert wav.shape[0] == 2
    assert np.isfinite(wav).all()
    assert abs(wav.shape[1] - sr_hi) < 4096


@pytest.mark.heavy
def test_vr_cascaded_net(rng):
    from conftest import finit

    net = CascadedASPPNet(n_fft=128)
    x = jnp.asarray(rng.uniform(0, 1, (1, 128, 65, 2)).astype(np.float32))
    params = finit(net, x)
    mask = net.apply(params, x)
    assert mask.shape == (1, 128, 65, 2)
    m = np.asarray(mask)
    assert (m >= 0).all() and (m <= 1).all()
    # aggressiveness exponent reduces the mask
    mask2 = net.apply(params, x, aggressiveness={"split_bin": 32, "value": 0.5})
    assert np.asarray(mask2).mean() <= m.mean() + 1e-6


@pytest.mark.heavy
def test_mdx_separator_end_to_end(rng):
    net = ConvTDFNetTrim(num_blocks=5, l=1, g=4, bn=2, dim_f=256, norm="GroupNorm2")
    x0 = jnp.zeros((1, 32, 256, 4))
    params = net.init(jax.random.PRNGKey(0), x0)
    sep = MDXSeparator(params, dim_f=256, dim_t=32, n_fft=512, hop=128, chunks=0,
                       net=net)
    audio = (0.2 * rng.standard_normal(44100)).astype(np.float32)
    out = sep.run_inference(audio, 44100)
    assert out["sr"] == 44100
    assert out["vocals"][0].dtype == np.int16
    assert out["vocals"][0].shape == out["instrumentals"][0].shape


def test_routing():
    assert route_separator("UVR-MDX-NET-vocal.onnx") == "mdx"
    assert route_separator("UVR-DeEcho-DeReverb.pth") == "vr_new"
    assert route_separator("HP5-vocals.pth") == "vr"


@pytest.mark.slow
def test_fused_vr_matches_host_path(rng):
    """The fully-fused device VR chain must reproduce the host band chain
    (integration tier; units + reference parity cover VR in the fast/parity
    tiers)."""
    import copy

    from rvc_tpu.pipelines.vr_fused import FusedVRSeparator

    mp = B.ModelParameters()
    mp.param = {
        "bins": 128, "unstable_bins": 4, "reduction_bins": 120, "sr": 8000,
        "pre_filter_start": 120, "pre_filter_stop": 128,
        "band": {
            1: {"sr": 2000, "hl": 32, "n_fft": 128, "crop_start": 0,
                "crop_stop": 40, "lpf_start": 20, "lpf_stop": 40,
                "res_type": "polyphase"},
            2: {"sr": 8000, "hl": 128, "n_fft": 256, "crop_start": 8,
                "crop_stop": 96, "hpf_start": 20, "hpf_stop": 8,
                "res_type": "polyphase"},
        },
        "mid_side": False, "mid_side_b": False, "mid_side_b2": False,
        "stereo_w": False, "stereo_n": False, "reverse": False,
    }
    from conftest import finit

    net = CascadedASPPNet(mp.param["bins"] * 2)
    params = finit(net, jnp.zeros((1, 512, mp.param["bins"] + 1, 2)))
    audio = (0.3 * rng.standard_normal(8000 * 3)).astype(np.float32)
    host = VRSeparator(params, copy.deepcopy(mp), agg=10)
    fused = FusedVRSeparator(params, copy.deepcopy(mp), agg=10)
    oh = host.run_inference(audio, 8000)
    of = fused.run_inference(audio, 8000)
    vh = oh["vocals"][0].astype(np.float32)
    vf = of["vocals"][0].astype(np.float32)
    n = min(len(vh), len(vf))
    corr = np.corrcoef(vh[:n], vf[:n])[0, 1]
    assert corr > 0.999, corr


def test_mixer_real_checkpoint_parity():
    """REAL pretrained weights: the reference ships lib/mixer.ckpt (UVR
    mixer mode); run the torch Mixer and our matmul form with it and
    compare exactly (reference lib/uvr5_pack/mdxnet.py:126-140)."""
    import os

    import pytest

    path = "/root/reference/lib/mixer.ckpt"
    if not os.path.exists(path):
        pytest.skip("reference mixer.ckpt not mounted")
    torch = pytest.importorskip("torch")

    from rvc_tpu.models.mdx_net import apply_mixer, load_mixer

    w = load_mixer(path)
    rng = np.random.default_rng(7)
    stems = rng.standard_normal((4, 2, 1000)).astype(np.float32)
    orig = rng.standard_normal((2, 1000)).astype(np.float32)

    got = np.asarray(apply_mixer(w, jnp.asarray(stems), jnp.asarray(orig)))

    lin = torch.nn.Linear(10, 8, bias=False)
    lin.load_state_dict({"weight": torch.from_numpy(w)})
    with torch.no_grad():
        x = torch.from_numpy(np.concatenate([stems.reshape(8, -1), orig]))
        x = x.reshape(1, 10, -1).transpose(-1, -2)
        ref = lin(x).transpose(-1, -2).reshape(4, 2, -1).numpy()

    assert np.max(np.abs(got - ref)) < 1e-5
