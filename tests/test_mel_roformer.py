"""Mel-Band RoFormer: parity of the Flax model + importer against an
in-test torch implementation of the public lucidrains layout (overlapping
mel bands, gather by freq_indices, scatter-averaged masks). The reference
has no roformer code at all; see tests/test_bs_roformer.py."""
import functools
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rvc_tpu.models.mel_roformer import (
    MelBandRoformer,
    MelRoformerConfig,
    MelRoformerSeparator,
    init_random,
    mel_band_indices,
)

# tiny overlapping-band layout: bins=9 (n_fft=16), stereo → FS=18
_BANDS = [(0, 1, 2), (1, 2, 3, 4), (4, 5, 6, 7, 8)]
_IDX = tuple(f * 2 + c for band in _BANDS for f in band for c in (0, 1))
_WIDTHS = tuple(2 * len(band) for band in _BANDS)

CFG = MelRoformerConfig(
    dim=32, depth=2, stereo=True, num_stems=2, num_bands=len(_BANDS),
    dim_head=8, heads=2, ff_mult=2, n_fft=16, hop_length=8, win_length=16,
    mask_estimator_depth=2, mlp_expansion_factor=2,
    freq_indices=_IDX, band_widths=_WIDTHS,
)


def _build_torch_model(cfg):
    """Minimal torch Mel-Band RoFormer with the exact lucidrains state-dict
    layout + the freq_indices buffer real checkpoints carry."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class RMSNorm(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.scale = dim ** 0.5
            self.gamma = nn.Parameter(torch.randn(dim) * 0.1 + 1.0)

        def forward(self, x):
            return F.normalize(x, dim=-1) * self.scale * self.gamma

    def rotary(x, dim_head):
        rot = dim_head // 2
        n = x.shape[-2]
        freqs = 1.0 / 10000 ** (torch.arange(0, rot, 2).double() / rot)
        ang = torch.arange(n).double()[:, None] * freqs[None]
        ang = ang.repeat_interleave(2, dim=-1).float()
        xr, xp = x[..., :rot], x[..., rot:]
        x2 = xr.reshape(*xr.shape[:-1], rot // 2, 2)
        rotated = torch.stack([-x2[..., 1], x2[..., 0]], dim=-1).reshape(xr.shape)
        return torch.cat([xr * ang.cos() + rotated * ang.sin(), xp], dim=-1)

    class Attention(nn.Module):
        def __init__(self, dim, heads, dim_head):
            super().__init__()
            self.heads, self.dim_head = heads, dim_head
            inner = heads * dim_head
            self.norm = RMSNorm(dim)
            self.to_qkv = nn.Linear(dim, inner * 3, bias=False)
            self.to_gates = nn.Linear(dim, heads)
            self.to_out = nn.Sequential(nn.Linear(inner, dim, bias=False))

        def forward(self, x):
            h, dh = self.heads, self.dim_head
            x = self.norm(x)
            q, k, v = self.to_qkv(x).chunk(3, dim=-1)
            B, N, _ = x.shape
            q = q.reshape(B, N, h, dh).transpose(1, 2)
            k = k.reshape(B, N, h, dh).transpose(1, 2)
            v = v.reshape(B, N, h, dh).transpose(1, 2)
            q, k = rotary(q, dh), rotary(k, dh)
            att = (q @ k.transpose(-2, -1)) / math.sqrt(dh)
            o = att.softmax(-1) @ v
            o = o * self.to_gates(x).sigmoid().transpose(1, 2).unsqueeze(-1)
            return self.to_out(o.transpose(1, 2).reshape(B, N, h * dh))

    class FeedForward(nn.Module):
        def __init__(self, dim, mult):
            super().__init__()
            inner = dim * mult
            self.net = nn.Sequential(RMSNorm(dim), nn.Linear(dim, inner),
                                     nn.GELU(), nn.Identity(),
                                     nn.Linear(inner, dim), nn.Identity())

        def forward(self, x):
            return self.net(x)

    class Transformer(nn.Module):
        def __init__(self, dim, depth, heads, dim_head, mult):
            super().__init__()
            self.layers = nn.ModuleList(
                [nn.ModuleList([Attention(dim, heads, dim_head),
                                FeedForward(dim, mult)]) for _ in range(depth)])
            self.norm = nn.Identity()  # norm_output=False in real ckpts

        def forward(self, x):
            for attn, ff in self.layers:
                x = attn(x) + x
                x = ff(x) + x
            return self.norm(x)

    class Model(nn.Module):
        def __init__(self, c):
            super().__init__()
            dims_in = c.dims_in
            self.register_buffer(
                "freq_indices", torch.tensor(c.freq_indices, dtype=torch.long))
            self.band_split = nn.Module()
            self.band_split.to_features = nn.ModuleList(
                [nn.Sequential(RMSNorm(d), nn.Linear(d, c.dim)) for d in dims_in])
            self.layers = nn.ModuleList(
                [nn.ModuleList([
                    Transformer(c.dim, c.time_transformer_depth, c.heads,
                                c.dim_head, c.ff_mult),
                    Transformer(c.dim, c.freq_transformer_depth, c.heads,
                                c.dim_head, c.ff_mult),
                ]) for _ in range(c.depth)])
            self.final_norm = RMSNorm(c.dim)
            hidden = c.dim * c.mlp_expansion_factor
            self.mask_estimators = nn.ModuleList()
            for _ in range(c.num_stems):
                est = nn.Module()
                est.to_freqs = nn.ModuleList()
                for d in dims_in:
                    dims = (c.dim,) + (hidden,) * (c.mask_estimator_depth - 1) + (d * 2,)
                    mlp = []
                    for j, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
                        mlp.append(nn.Linear(a, b))
                        if j < len(dims) - 2:
                            mlp.append(nn.Tanh())
                    est.to_freqs.append(nn.Sequential(nn.Sequential(*mlp),
                                                      nn.GLU(dim=-1)))
                self.mask_estimators.append(est)
            self.c = c

        def forward(self, spec_ri):
            c = self.c
            B, T, FS, _ = spec_ri.shape
            x = spec_ri[:, :, self.freq_indices]       # (B, T, K, 2)
            feats = x.reshape(B, T, -1)
            xs, off = [], 0
            for i, d in enumerate(c.dims_in):
                xs.append(self.band_split.to_features[i](feats[..., off:off + d]))
                off += d
            x = torch.stack(xs, dim=2)
            nb = len(c.dims_in)
            for time_tr, freq_tr in self.layers:
                xt = x.permute(0, 2, 1, 3).reshape(B * nb, T, c.dim)
                x = time_tr(xt).reshape(B, nb, T, c.dim).permute(0, 2, 1, 3)
                xf = x.reshape(B * T, nb, c.dim)
                x = freq_tr(xf).reshape(B, T, nb, c.dim)
            x = self.final_norm(x)
            masks = []
            for est in self.mask_estimators:
                outs = []
                for i in range(nb):
                    outs.append(est.to_freqs[i](x[:, :, i]))
                masks.append(torch.cat(outs, dim=-1).reshape(B, T, -1, 2))
            mask = torch.stack(masks)                  # (S, B, T, K, 2)
            summed = torch.zeros(c.num_stems, B, T, FS, 2)
            summed.index_add_(3, self.freq_indices,
                              mask.reshape(c.num_stems, B, T, -1, 2))
            counts = torch.bincount(self.freq_indices, minlength=FS).float()
            avg = summed / counts.clamp(min=1)[None, None, None, :, None]
            sc = torch.view_as_complex(spec_ri.contiguous())
            mc = torch.view_as_complex(avg.contiguous())
            return torch.view_as_real(mc * sc.unsqueeze(0))

    return Model(cfg)


def test_forward_matches_torch_layout(rng):
    torch = pytest.importorskip("torch")
    from rvc_tpu.compat.torch_import import (
        build_tree,
        mel_roformer_config_from_state_dict,
    )

    torch.manual_seed(0)
    ref = _build_torch_model(CFG)
    sd = ref.state_dict()

    cfg = mel_roformer_config_from_state_dict(
        {k: v.numpy() for k, v in sd.items()})
    assert cfg.dim == CFG.dim and cfg.depth == CFG.depth
    assert cfg.freq_indices == CFG.freq_indices
    assert cfg.band_widths == CFG.band_widths
    assert cfg.stereo and cfg.n_fft == CFG.n_fft
    assert cfg.num_stems == CFG.num_stems

    params = {"params": build_tree(sd, skip=(r"freq_indices",))}
    FS = (CFG.n_fft // 2 + 1) * 2
    spec = rng.standard_normal((2, 5, FS, 2)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(spec)).numpy()
    out = np.asarray(MelBandRoformer(cfg).apply(params, jnp.asarray(spec)))
    assert out.shape == out_ref.shape
    np.testing.assert_allclose(out, out_ref, atol=2e-5)


def test_real_layout_indices_cover_all_bins():
    """The slaney 60-band / 1025-bin layout every public Mel-Band RoFormer
    uses: every bin covered, DC in band 0, Nyquist in the last band."""
    idx, widths = mel_band_indices(44100, 2048, 60, 2)
    assert len(widths) == 60
    assert sum(widths) == len(idx)
    FS = 1025 * 2
    assert set(idx) == set(range(FS)) - (set(range(FS)) - set(idx))
    covered = np.zeros(FS, bool)
    covered[list(idx)] = True
    assert covered.all()
    assert 0 in idx[: widths[0]] and FS - 1 in idx[-widths[-1]:]


def test_separator_roundtrip(rng):
    params = init_random(CFG, seed=1)
    sep = MelRoformerSeparator(params, CFG, segment_seconds=0.01, overlap=0.5)
    T = int(0.05 * CFG.sample_rate)
    mix = rng.standard_normal((2, T)).astype(np.float32) * 0.1
    stems = sep.demix(mix)
    assert stems.shape == (CFG.num_stems, 2, T)
    assert np.isfinite(stems).all()


def test_importer_layout_assertion(rng):
    """load-path layout check: params built from a state dict with a
    missing transformer layer must fail loudly."""
    torch = pytest.importorskip("torch")
    from rvc_tpu.compat.torch_import import (
        assert_params_match_model,
        build_tree,
    )

    torch.manual_seed(0)
    sd = dict(_build_torch_model(CFG).state_dict())
    dropped = {k: v for k, v in sd.items() if "layers.1." not in k}
    params = {"params": build_tree(dropped, skip=(r"freq_indices",))}
    model = MelBandRoformer(CFG)
    FS = (CFG.n_fft // 2 + 1) * 2
    with pytest.raises(ValueError, match="missing"):
        assert_params_match_model(
            params, functools.partial(model.init, jax.random.PRNGKey(0)),
            jnp.zeros((1, 4, FS, 2)))
