"""MuseTalk VAE/UNet importer golden parity (VERDICT r2 weak #5).

diffusers is absent in this environment and the catalog checkpoints are
offline, so the golden source is a torch MIRROR of the diffusers
architectures (AutoencoderKL / UNet2DConditionModel), written here from
the diffusers module semantics with module attribute names chosen so the
mirror's ``state_dict()`` keys are byte-identical to a real diffusers
checkpoint's (``encoder.down_blocks.0.resnets.0.norm1.weight`` …).

That state dict is pushed through the repo's importers
(models/musetalk/{vae,unet}.py ``*_params_from_state_dict``) and the Flax
models must reproduce the torch forward numerically — any rename gap,
transpose bug, or topology drift fails loudly. Reference wrappers:
lib/musetalk/models/vae.py:8-145, lib/musetalk/models/unet.py:8-42.
"""
import math

import numpy as np
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.parity]  # torch golden parity

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
tnn = torch.nn
F = torch.nn.functional


@pytest.fixture
def rng():
    return np.random.default_rng(7)


# ---------------------------------------------------------------------------
# torch mirrors (diffusers layout)
# ---------------------------------------------------------------------------


class TResnet(tnn.Module):
    def __init__(self, cin, cout, groups, eps, temb_ch=None):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        if temb_ch:
            self.time_emb_proj = tnn.Linear(temb_ch, cout)
        self.norm2 = tnn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = tnn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TVAEAttn(tnn.Module):
    """diffusers Attention as used in the VAE mid block (1 head)."""

    def __init__(self, c, groups):
        super().__init__()
        self.group_norm = tnn.GroupNorm(groups, c, eps=1e-6)
        self.to_q = tnn.Linear(c, c)
        self.to_k = tnn.Linear(c, c)
        self.to_v = tnn.Linear(c, c)
        self.to_out = tnn.ModuleList([tnn.Linear(c, c)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).reshape(B, C, H * W).transpose(1, 2)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        attn = torch.softmax(q @ k.transpose(1, 2) / math.sqrt(C), -1)
        o = self.to_out[0](attn @ v)
        return x + o.transpose(1, 2).reshape(B, C, H, W)


class TDownsample(tnn.Module):
    def __init__(self, c, pad):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, stride=2, padding=pad)
        self.pad = pad

    def forward(self, x):
        if self.pad == 0:  # VAE: asymmetric (0,1,0,1) pad
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class TUpsample(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class _Container(tnn.Module):
    pass


class TVAEEncoder(tnn.Module):
    def __init__(self, chans, lpb, groups, in_ch, latent):
        super().__init__()
        self.conv_in = tnn.Conv2d(in_ch, chans[0], 3, padding=1)
        self.down_blocks = tnn.ModuleList()
        cin = chans[0]
        for i, cout in enumerate(chans):
            blk = _Container()
            blk.resnets = tnn.ModuleList(
                [TResnet(cin if j == 0 else cout, cout, groups, 1e-6)
                 for j in range(lpb)])
            if i < len(chans) - 1:
                blk.downsamplers = tnn.ModuleList([TDownsample(cout, pad=0)])
            self.down_blocks.append(blk)
            cin = cout
        self.mid_block = _Container()
        self.mid_block.resnets = tnn.ModuleList(
            [TResnet(cin, cin, groups, 1e-6), TResnet(cin, cin, groups, 1e-6)])
        self.mid_block.attentions = tnn.ModuleList([TVAEAttn(cin, groups)])
        self.conv_norm_out = tnn.GroupNorm(groups, cin, eps=1e-6)
        self.conv_out = tnn.Conv2d(cin, 2 * latent, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for blk in self.down_blocks:
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
        h = self.mid_block.resnets[0](h)
        h = self.mid_block.attentions[0](h)
        h = self.mid_block.resnets[1](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TVAEDecoder(tnn.Module):
    def __init__(self, chans, lpb, groups, out_ch, latent):
        super().__init__()
        rchans = list(reversed(chans))
        self.conv_in = tnn.Conv2d(latent, rchans[0], 3, padding=1)
        cin = rchans[0]
        self.mid_block = _Container()
        self.mid_block.resnets = tnn.ModuleList(
            [TResnet(cin, cin, groups, 1e-6), TResnet(cin, cin, groups, 1e-6)])
        self.mid_block.attentions = tnn.ModuleList([TVAEAttn(cin, groups)])
        self.up_blocks = tnn.ModuleList()
        for i, cout in enumerate(rchans):
            blk = _Container()
            blk.resnets = tnn.ModuleList(
                [TResnet(cin if j == 0 else cout, cout, groups, 1e-6)
                 for j in range(lpb + 1)])
            if i < len(rchans) - 1:
                blk.upsamplers = tnn.ModuleList([TUpsample(cout)])
            self.up_blocks.append(blk)
            cin = cout
        self.conv_norm_out = tnn.GroupNorm(groups, cin, eps=1e-6)
        self.conv_out = tnn.Conv2d(cin, out_ch, 3, padding=1)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid_block.resnets[0](h)
        h = self.mid_block.attentions[0](h)
        h = self.mid_block.resnets[1](h)
        for blk in self.up_blocks:
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TVAE(tnn.Module):
    def __init__(self, chans=(32, 64), lpb=2, groups=8, latent=4):
        super().__init__()
        self.encoder = TVAEEncoder(chans, lpb, groups, 3, latent)
        self.decoder = TVAEDecoder(chans, lpb, groups, 3, latent)
        self.quant_conv = tnn.Conv2d(2 * latent, 2 * latent, 1)
        self.post_quant_conv = tnn.Conv2d(latent, latent, 1)


# -- UNet mirror -------------------------------------------------------------


class TCrossAttention(tnn.Module):
    def __init__(self, q_dim, ctx_dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.to_q = tnn.Linear(q_dim, inner, bias=False)
        self.to_k = tnn.Linear(ctx_dim, inner, bias=False)
        self.to_v = tnn.Linear(ctx_dim, inner, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(inner, q_dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        B, T, _ = x.shape
        S = ctx.shape[1]
        q = self.to_q(x).reshape(B, T, self.heads, self.dim_head).transpose(1, 2)
        k = self.to_k(ctx).reshape(B, S, self.heads, self.dim_head).transpose(1, 2)
        v = self.to_v(ctx).reshape(B, S, self.heads, self.dim_head).transpose(1, 2)
        p = torch.softmax(q @ k.transpose(2, 3) / math.sqrt(self.dim_head), -1)
        o = (p @ v).transpose(1, 2).reshape(B, T, -1)
        return self.to_out[0](o)


class TGEGLU(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.proj = tnn.Linear(dim, dim * 8)

    def forward(self, x):
        a, g = self.proj(x).chunk(2, dim=-1)
        return a * F.gelu(g)


class TBasicTransformer(tnn.Module):
    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = TCrossAttention(dim, dim, heads, dim // heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = TCrossAttention(dim, ctx_dim, heads, dim // heads)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = _Container()
        self.ff.net = tnn.ModuleList([TGEGLU(dim), tnn.Identity(),
                                      tnn.Linear(dim * 4, dim)])

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        return x + self.ff.net[2](self.ff.net[0](self.norm3(x)))


class TTransformer2D(tnn.Module):
    def __init__(self, c, ctx_dim, heads, groups):
        super().__init__()
        self.norm = tnn.GroupNorm(groups, c, eps=1e-6)
        self.proj_in = tnn.Conv2d(c, c, 1)
        self.transformer_blocks = tnn.ModuleList(
            [TBasicTransformer(c, ctx_dim, heads)])
        self.proj_out = tnn.Conv2d(c, c, 1)

    def forward(self, x, ctx):
        B, C, H, W = x.shape
        res = x
        h = self.proj_in(self.norm(x))
        h = h.reshape(B, C, H * W).transpose(1, 2)
        h = self.transformer_blocks[0](h, ctx)
        h = h.transpose(1, 2).reshape(B, C, H, W)
        return self.proj_out(h) + res


class TUNetDownsample(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class TUNet(tnn.Module):
    """UNet2DConditionModel mirror (SD-1.5 topology, musetalk-style config:
    reference lib/musetalk/models/unet.py:8-42)."""

    def __init__(self, chans=(32, 64, 64, 64), lpb=2, groups=8, in_ch=8,
                 out_ch=4, ctx_dim=16, heads=2):
        super().__init__()
        temb_ch = chans[0] * 4
        self.heads = heads
        down_types = ["CrossAttnDownBlock2D"] * 3 + ["DownBlock2D"]
        up_types = ["UpBlock2D"] + ["CrossAttnUpBlock2D"] * 3
        self.time_embedding = _Container()
        self.time_embedding.linear_1 = tnn.Linear(chans[0], temb_ch)
        self.time_embedding.linear_2 = tnn.Linear(temb_ch, temb_ch)
        self.conv_in = tnn.Conv2d(in_ch, chans[0], 3, padding=1)

        skip_ch = [chans[0]]
        self.down_blocks = tnn.ModuleList()
        cin = chans[0]
        for i, (btype, cout) in enumerate(zip(down_types, chans)):
            blk = _Container()
            blk.resnets = tnn.ModuleList(
                [TResnet(cin if j == 0 else cout, cout, groups, 1e-5, temb_ch)
                 for j in range(lpb)])
            if btype.startswith("CrossAttn"):
                blk.attentions = tnn.ModuleList(
                    [TTransformer2D(cout, ctx_dim, heads, groups)
                     for _ in range(lpb)])
            skip_ch += [cout] * lpb
            if i < len(chans) - 1:
                blk.downsamplers = tnn.ModuleList([TUNetDownsample(cout)])
                skip_ch.append(cout)
            self.down_blocks.append(blk)
            cin = cout

        self.mid_block = _Container()
        self.mid_block.resnets = tnn.ModuleList(
            [TResnet(cin, cin, groups, 1e-5, temb_ch),
             TResnet(cin, cin, groups, 1e-5, temb_ch)])
        self.mid_block.attentions = tnn.ModuleList(
            [TTransformer2D(cin, ctx_dim, heads, groups)])

        self.up_blocks = tnn.ModuleList()
        up_chans = list(reversed(chans))
        for i, btype in enumerate(up_types):
            cout = up_chans[i]
            blk = _Container()
            resnets = []
            for j in range(lpb + 1):
                rin = (cin if j == 0 else cout) + skip_ch.pop()
                resnets.append(TResnet(rin, cout, groups, 1e-5, temb_ch))
            blk.resnets = tnn.ModuleList(resnets)
            if btype.startswith("CrossAttn"):
                blk.attentions = tnn.ModuleList(
                    [TTransformer2D(cout, ctx_dim, heads, groups)
                     for _ in range(lpb + 1)])
            if i < len(up_types) - 1:
                blk.upsamplers = tnn.ModuleList([TUpsample(cout)])
            self.up_blocks.append(blk)
            cin = cout
        self.conv_norm_out = tnn.GroupNorm(groups, cin, eps=1e-5)
        self.conv_out = tnn.Conv2d(cin, out_ch, 3, padding=1)

    def forward(self, sample, t, ctx):
        c0 = self.conv_in.weight.shape[0]
        half = c0 // 2
        exponent = -math.log(10000.0) * torch.arange(half).float() / half
        emb = t[:, None].float() * exponent.exp()[None]
        temb = torch.cat([emb.cos(), emb.sin()], -1)  # flip_sin_to_cos
        temb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(temb)))

        h = self.conv_in(sample)
        skips = [h]
        for blk in self.down_blocks:
            for j, r in enumerate(blk.resnets):
                h = r(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
                skips.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
                skips.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, temb)
        for i, blk in enumerate(self.up_blocks):
            for j, r in enumerate(blk.resnets):
                h = r(torch.cat([h, skips.pop()], 1), temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def _leaf_paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_leaf_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(np.shape(v))
    return out


def test_vae_importer_golden_parity(rng):
    from rvc_tpu.models.musetalk.vae import (AutoencoderKL, VAEConfig,
                                             vae_params_from_state_dict)

    cfg = VAEConfig(block_out_channels=(32, 64), layers_per_block=2,
                    norm_num_groups=8, latent_channels=4)
    tvae = TVAE(chans=(32, 64), lpb=2, groups=8, latent=4).eval()
    # sanity: mirror emits real diffusers key names
    keys = set(tvae.state_dict())
    assert "encoder.down_blocks.0.resnets.0.norm1.weight" in keys
    assert "encoder.down_blocks.0.downsamplers.0.conv.weight" in keys
    assert "encoder.mid_block.attentions.0.to_out.0.bias" in keys
    assert "decoder.up_blocks.1.upsamplers.0.conv.weight" not in keys  # last up block has no upsampler...
    assert "decoder.up_blocks.0.upsamplers.0.conv.weight" in keys
    assert "post_quant_conv.weight" in keys

    variables = vae_params_from_state_dict(tvae.state_dict())
    vae = AutoencoderKL(cfg)

    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        moments = tvae.quant_conv(tvae.encoder(torch.from_numpy(
            x.transpose(0, 3, 1, 2))))
        ref_mean = moments.chunk(2, 1)[0].numpy() * cfg.scaling_factor
    got = np.asarray(vae.apply(variables, jnp.asarray(x), method=vae.encode))
    assert got.transpose(0, 3, 1, 2).shape == ref_mean.shape
    assert np.max(np.abs(got.transpose(0, 3, 1, 2) - ref_mean)) < 2e-4

    z = ref_mean.transpose(0, 2, 3, 1)
    with torch.no_grad():
        ref_img = tvae.decoder(tvae.post_quant_conv(
            torch.from_numpy(ref_mean) / cfg.scaling_factor)).numpy()
    got_img = np.asarray(vae.apply(variables, jnp.asarray(z), method=vae.decode))
    assert np.max(np.abs(got_img.transpose(0, 3, 1, 2) - ref_img)) < 2e-3

    # the importer tree is EXACTLY the flax init tree (no missing/extra keys,
    # no shape drift) — catches rename gaps that parity-by-luck could hide
    init = jax.eval_shape(
        lambda: AutoencoderKL(cfg).init(jax.random.PRNGKey(0),
                                        jnp.zeros((1, 32, 32, 3))))
    assert _leaf_paths(variables["params"]) == _leaf_paths(init["params"])


def test_unet_importer_golden_parity(rng):
    from rvc_tpu.models.musetalk.unet import (UNet2DCondition, UNetConfig,
                                              unet_params_from_state_dict)

    cfg = UNetConfig(block_out_channels=(32, 64, 64, 64), layers_per_block=2,
                     cross_attention_dim=16, attention_head_dim=2,
                     norm_num_groups=8)
    tnet = TUNet(chans=(32, 64, 64, 64), lpb=2, groups=8, ctx_dim=16,
                 heads=2).eval()
    keys = set(tnet.state_dict())
    assert ("down_blocks.0.attentions.0.transformer_blocks.0"
            ".attn2.to_k.weight") in keys
    assert "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight" in keys
    assert "time_embedding.linear_1.weight" in keys
    assert "up_blocks.1.attentions.2.proj_out.weight" in keys
    assert "mid_block.resnets.1.time_emb_proj.weight" in keys

    variables = unet_params_from_state_dict(tnet.state_dict())
    net = UNet2DCondition(cfg)

    x = rng.standard_normal((2, 8, 8, 8)).astype(np.float32)
    ctx = rng.standard_normal((2, 10, 16)).astype(np.float32)
    t = np.array([0.0, 7.0], np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(t), torch.from_numpy(ctx)).numpy()
    got = np.asarray(net.apply(variables, jnp.asarray(x), jnp.asarray(t),
                               jnp.asarray(ctx)))
    assert got.transpose(0, 3, 1, 2).shape == ref.shape
    assert np.max(np.abs(got.transpose(0, 3, 1, 2) - ref)) < 2e-3

    init = jax.eval_shape(
        lambda: UNet2DCondition(cfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8)),
            jnp.zeros((1,), jnp.float32), jnp.zeros((1, 10, 16))))
    assert _leaf_paths(variables["params"]) == _leaf_paths(init["params"])
