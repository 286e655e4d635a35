"""Torch checkpoint → Flax param-tree converters.

Because every layer in rvc_tpu stores weights in torch layout
(models/layers.py), conversion is pure key-path renaming — no transposes.
Handles:

  * RVC inference checkpoints (``cpt["weight"]`` + positional ``config``;
    reference vc_infer_pipeline.py:199-226 / training_cli.py:38-74),
  * ContentVec/HuBERT safetensors (reference lib/infer_pack/loaders.py),
  * RMVPE ``.pt`` (E2E state_dict, reference lib/rmvpe.py:579-581),
  * torchcrepe state_dicts.

Generic rule: torch ``a.b.0.c`` → flax path ``a / b_0 / c`` (ModuleList
indices merge into the parent name); per-model regex fixups cover the few
places our module nesting is flatter than torch's.
"""
from __future__ import annotations

import re
from typing import Callable, Mapping

import numpy as np


def _to_np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    try:  # torch tensor without importing torch at module scope
        return t.detach().cpu().float().numpy()
    except AttributeError:
        return np.asarray(t)


def torch_key_to_path(key: str) -> tuple[str, ...]:
    """'a.b.0.c.weight' -> ('a', 'b_0', 'c', 'weight')."""
    parts = key.split(".")
    out: list[str] = []
    for p in parts:
        if p.isdigit() and out:
            out[-1] = f"{out[-1]}_{p}"
        else:
            out.append(p)
    return tuple(out)


def insert_path(tree: dict, path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def build_tree(
    state_dict: Mapping[str, object],
    renames: list[tuple[str, str]] | None = None,
    skip: tuple[str, ...] = (),
) -> dict:
    """Apply regex renames then the generic path rule."""
    tree: dict = {}
    for key, val in state_dict.items():
        if any(re.search(s, key) for s in skip):
            continue
        k = key
        for pat, rep in renames or []:
            k = re.sub(pat, rep, k)
        insert_path(tree, torch_key_to_path(k), _to_np(val))
    return tree


# ---------------------------------------------------------------------------
# RVC synthesizer (.pth inference format)
# ---------------------------------------------------------------------------


def synthesizer_params_from_state_dict(weights: Mapping[str, object]) -> dict:
    """Reference state_dict names map 1:1 through the generic rule."""
    return build_tree(weights, skip=(r"^enc_q\.",))


def load_rvc_checkpoint(path: str):
    """Load a reference RVC .pth; returns (flax_params, metadata dict).

    metadata: config (positional list), sr, f0, version — the contract of
    reference get_vc (vc_infer_pipeline.py:199-226).
    """
    import torch

    cpt = torch.load(path, map_location="cpu", weights_only=False)
    weights = cpt["weight"]
    params = synthesizer_params_from_state_dict(weights)
    n_spk = _to_np(weights["emb_g.weight"]).shape[0]
    config = list(cpt["config"])
    config[-3] = n_spk
    meta = {
        "config": config,
        "sr": cpt["config"][-1],
        "f0": cpt.get("f0", 1),
        "version": cpt.get("version", "v1"),
        "n_spk": n_spk,
    }
    return {"params": params}, meta


def synthesizer_kwargs_from_config(config: list, version: str, use_f0: bool) -> dict:
    """Positional reference config list → Synthesizer kwargs
    (order per reference models.py SynthesizerTrn* __init__)."""
    (spec_channels, segment_size, inter_channels, hidden_channels, filter_channels,
     n_heads, n_layers, kernel_size, p_dropout, resblock, resblock_kernel_sizes,
     resblock_dilation_sizes, upsample_rates, upsample_initial_channel,
     upsample_kernel_sizes, spk_embed_dim, gin_channels, sr) = config
    from ..config import SR_MAP

    if isinstance(sr, str):
        sr = SR_MAP[sr]
    return dict(
        spec_channels=spec_channels,
        segment_size=segment_size,
        inter_channels=inter_channels,
        hidden_channels=hidden_channels,
        filter_channels=filter_channels,
        n_heads=n_heads,
        n_layers=n_layers,
        kernel_size=kernel_size,
        p_dropout=p_dropout,
        resblock=resblock,
        resblock_kernel_sizes=tuple(resblock_kernel_sizes),
        resblock_dilation_sizes=tuple(map(tuple, resblock_dilation_sizes)),
        upsample_rates=tuple(upsample_rates),
        upsample_initial_channel=upsample_initial_channel,
        upsample_kernel_sizes=tuple(upsample_kernel_sizes),
        spk_embed_dim=spk_embed_dim,
        gin_channels=gin_channels,
        sr=sr,
        feature_dim=256 if version == "v1" else 768,
        use_f0=bool(use_f0),
    )


# ---------------------------------------------------------------------------
# HuBERT / ContentVec
# ---------------------------------------------------------------------------

_HUBERT_RENAMES = [
    (r"feature_extractor\.conv_layers\.(\d+)\.conv", r"feature_extractor.conv_layers_\1_conv"),
    (r"feature_extractor\.conv_layers\.0\.layer_norm",
     r"feature_extractor.conv_layers_0_layer_norm"),
    (r"feature_projection\.layer_norm", r"feature_projection_layer_norm"),
    (r"feature_projection\.projection", r"feature_projection_projection"),
    (r"encoder\.pos_conv_embed\.conv\.parametrizations\.weight\.original0",
     r"encoder_pos_conv_embed_conv.weight_g"),
    (r"encoder\.pos_conv_embed\.conv\.parametrizations\.weight\.original1",
     r"encoder_pos_conv_embed_conv.weight_v"),
    (r"encoder\.pos_conv_embed\.conv", r"encoder_pos_conv_embed_conv"),
    (r"encoder\.layer_norm", r"encoder_layer_norm"),
    (r"encoder\.layers\.(\d+)\.feed_forward\.intermediate_dense",
     r"encoder_layers_\1.feed_forward_intermediate_dense"),
    (r"encoder\.layers\.(\d+)\.feed_forward\.output_dense",
     r"encoder_layers_\1.feed_forward_output_dense"),
    (r"encoder\.layers\.(\d+)", r"encoder_layers_\1"),
]


def _fix_pos_conv_weight_norm(tree: dict) -> dict:
    """HF pos-conv weight norm is over dim=2; our module reconstructs over
    dim 0. Fold the imported (g, v) to a plain weight, then re-split along
    dim 0 so the module's math reproduces it exactly."""
    node = tree.get("encoder_pos_conv_embed_conv")
    if node and "weight_g" in node:
        g, v = node["weight_g"], node["weight_v"]
        axes_g = tuple(i for i, s in enumerate(g.shape) if s == 1)
        norm = np.sqrt(np.sum(v * v, axis=axes_g, keepdims=True))
        w = g * v / (norm + 1e-12)
        norm0 = np.sqrt(np.sum(w * w, axis=(1, 2), keepdims=True))
        node["weight_v"] = w
        node["weight_g"] = norm0
    return tree


def hubert_params_from_state_dict(state_dict: Mapping[str, object]) -> dict:
    tree = build_tree(state_dict, renames=_HUBERT_RENAMES, skip=(r"masked_spec_embed",))
    return _fix_pos_conv_weight_norm(tree)


def load_hubert_safetensors(path: str):
    """Load content-vec-best.safetensors → (flax params, HubertConfig)."""
    import json

    from safetensors import safe_open

    from ..models.hubert import HubertConfig

    with safe_open(path, framework="np") as f:
        meta = f.metadata() or {}
        state = {k: f.get_tensor(k) for k in f.keys()}
    cfg = HubertConfig.from_hf_dict(json.loads(meta["config"])) if "config" in meta else HubertConfig()
    return {"params": hubert_params_from_state_dict(state)}, cfg


# ---------------------------------------------------------------------------
# RMVPE
# ---------------------------------------------------------------------------

_RMVPE_RENAMES = [
    (r"unet\.encoder\.bn", r"unet.encoder_bn"),
    (r"unet\.encoder\.layers\.(\d+)", r"unet.encoder_layers_\1"),
    (r"unet\.intermediate\.layers\.(\d+)", r"unet.intermediate_layers_\1"),
    (r"unet\.decoder\.layers\.(\d+)", r"unet.decoder_layers_\1"),
    # ConvBlockRes / ResEncoderBlock / ResDecoderBlock inner sequential ids
    (r"\.conv\.(\d+)\.conv\.(\d+)\.", r".conv_\1.conv_\2."),
    (r"\.conv\.(\d+)\.shortcut", r".conv_\1.shortcut"),
    (r"\.conv1\.(\d+)\.", r".conv1_\1."),
    (r"\.conv2\.(\d+)\.conv\.(\d+)\.", r".conv2_\1.conv_\2."),
    (r"\.conv2\.(\d+)\.shortcut", r".conv2_\1.shortcut"),
    (r"^cnn\.", r"cnn."),
    (r"^fc\.0\.gru\.", r"fc_0_gru."),
    (r"^fc\.1\.", r"fc_1."),
]


def rmvpe_params_from_state_dict(state_dict: Mapping[str, object]) -> dict:
    tree = build_tree(state_dict, renames=_RMVPE_RENAMES, skip=(r"num_batches_tracked",))
    return {"params": {"model": tree}}


def load_rmvpe(path: str):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd and hasattr(sd["model"], "keys"):
        sd = sd["model"]
    return rmvpe_params_from_state_dict(sd)


# ---------------------------------------------------------------------------
# Demucs v3/v4 hybrid (.th packages: {klass, args, kwargs, state})
# ---------------------------------------------------------------------------

_DEMUCS_RENAMES = [
    # ScaledEmbedding wrapper flattens to the Embedding weight
    (r"freq_emb\.embedding\.", r"freq_emb."),
    # DConv BLSTM: our FramedBLSTM nests a BiLSTM named `blstm` whose lstm
    # params are flat leaves (lstm_weight_ih_l0, ...)
    (r"(dconv\.layers\.\d+\.3)\.lstm\.(weight|bias)_(ih|hh)_l(\d+)(_reverse)?",
     r"\1.blstm.lstm_\2_\3_l\4\5"),
    (r"(dconv\.layers\.\d+\.3)\.linear\.", r"\1.blstm.linear."),
]


def demucs_v4_params_from_state_dict(state_dict: Mapping[str, object]) -> dict:
    """Hybrid (HT)Demucs torch state_dict → flax params for
    models/htdemucs.py. Pure renaming: every layer keeps torch layout."""
    tree = build_tree(state_dict, renames=_DEMUCS_RENAMES,
                      skip=(r"num_batches_tracked",))
    return {"params": tree}


def _install_demucs_stubs() -> None:
    """Register stub `demucs.*` modules so unpickling a reference .th
    package (which pickles the model class object) works without the
    torch demucs package installed (reference demucs/states.py:37-67)."""
    import sys
    import types
    import importlib.machinery

    names = ["demucs", "demucs.htdemucs", "demucs.hdemucs", "demucs.demucs",
             "demucs.transformer", "demucs.apply", "demucs.states"]
    for name in names:
        _install_stub_module(name)


def _install_stub_module(name: str) -> None:
    import sys
    import types
    import importlib.machinery

    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None,
                                                  is_package=True)
    mod.__path__ = []  # behave as a (empty) package for submodule imports

    def _getattr(attr, _m=name, _mod=mod):
        if attr.startswith("__"):
            raise AttributeError(attr)
        # cache so repeated lookups return the same class object
        # (keeps a loaded package re-picklable)
        kls = type(attr, (), {"__module__": _m, "__qualname__": attr})
        setattr(_mod, attr, kls)
        return kls

    mod.__getattr__ = _getattr  # type: ignore[method-assign]
    sys.modules[name] = mod


def load_demucs_v4(path: str):
    """Load a demucs v3/v4 ``.th`` package → (flax_params, meta).

    meta: {"klass": class-name str, "kwargs": constructor kwargs,
    "sources", "samplerate", "segment"} — enough to instantiate
    models.htdemucs.HTDemucs / HDemucs.
    """
    import torch

    _install_demucs_stubs()
    # checkpoints pickle the model class object; stub whatever module path
    # the pickle references (demucs.*, or a vendored prefix) and retry
    for _ in range(8):
        try:
            pkg = torch.load(path, map_location="cpu", weights_only=False)
            break
        except ModuleNotFoundError as e:
            parts = (e.name or "").split(".")
            if not parts or not parts[0]:
                raise
            for i in range(len(parts)):
                _install_stub_module(".".join(parts[: i + 1]))
    else:
        raise RuntimeError(f"could not unpickle {path}")
    if "state" not in pkg:
        # raw state_dict fallback
        return demucs_v4_params_from_state_dict(pkg), {}
    state = pkg["state"]
    if isinstance(state, dict) and state.get("__quantized"):
        raise NotImplementedError("diffq-quantized demucs checkpoints")
    kwargs = dict(pkg.get("kwargs", {}))
    args = list(pkg.get("args", ()))
    if args and "sources" not in kwargs:
        kwargs["sources"] = args[0]
    meta = {
        "klass": getattr(pkg.get("klass"), "__name__", "HTDemucs"),
        "kwargs": kwargs,
        "sources": tuple(kwargs.get("sources", ())),
        "samplerate": kwargs.get("samplerate", 44100),
        "segment": float(kwargs.get("segment", 10.0)),
    }
    state = {k: _to_np(v) for k, v in state.items()}
    return demucs_v4_params_from_state_dict(state), meta


def htdemucs_kwargs_from_meta(meta: dict) -> dict:
    """Filter reference constructor kwargs down to the fields our flax
    modules expose (training-only options like t_cape_* are dropped)."""
    from ..models.htdemucs import HDemucs, HTDemucs

    klass = HTDemucs if meta.get("klass", "HTDemucs") == "HTDemucs" else HDemucs
    fields = set(klass.__dataclass_fields__)
    out = {}
    for k, v in meta.get("kwargs", {}).items():
        if k in fields:
            out[k] = tuple(v) if isinstance(v, list) else v
    if "sources" in out:
        out["sources"] = tuple(out["sources"])
    if "segment" in out:
        out["segment"] = float(out["segment"])
    return out


def tasnet_params_from_state_dict(state_dict: Mapping[str, object]):
    """demucs v2 Conv-TasNet state_dict → (flax params, config kwargs).

    Reference layout (lib/uvr5_pack/demucs/tasnet_v2.py): encoder.conv1d_U,
    separator.network = [cLN, bottleneck 1x1, R*X TemporalBlocks, mask 1x1],
    decoder.basis_signals. All 1x1 convs become dense matmuls here
    (models/tasnet.py), so their trailing kernel dim is squeezed.
    """
    sd = {k: _to_np(v) for k, v in state_dict.items()}
    if any("running_mean" in k for k in sd):
        raise NotImplementedError("BatchNorm ('BN') tasnet checkpoints")
    enc = sd["encoder.conv1d_U.weight"]  # (N, ac, L)
    N, ac, L = enc.shape
    bott = sd["separator.network.1.weight"]  # (B, N, 1)
    B = bott.shape[0]
    mask_w = sd["separator.network.3.weight"]  # (C*N, B, 1)
    C = mask_w.shape[0] // N
    rs = xs = -1
    for k in sd:
        m = re.match(r"separator\.network\.2\.(\d+)\.(\d+)\.", k)
        if m:
            rs = max(rs, int(m.group(1)))
            xs = max(xs, int(m.group(2)))
    R, X = rs + 1, xs + 1
    P = sd["separator.network.2.0.0.net.3.net.0.weight"].shape[-1]
    H = sd["separator.network.2.0.0.net.0.weight"].shape[0]

    def norm(prefix):
        return {"gamma": sd[prefix + ".gamma"].reshape(-1),
                "beta": sd[prefix + ".beta"].reshape(-1)}

    params = {
        "encoder_U": {"weight": enc},
        "layer_norm": norm("separator.network.0"),
        "bottleneck": {"weight": bott[..., 0]},
        "mask_conv": {"weight": mask_w[..., 0]},
        "basis_signals": {"weight": sd["decoder.basis_signals.weight"]},
    }
    for r in range(R):
        for x in range(X):
            p = f"separator.network.2.{r}.{x}.net"
            params[f"block_{r}_{x}"] = {
                "conv1x1": {"weight": sd[p + ".0.weight"][..., 0]},
                "prelu1": sd[p + ".1.weight"].reshape(1),
                "norm1": norm(p + ".2"),
                "dw_weight": sd[p + ".3.net.0.weight"][:, 0, :].T,  # (P, H)
                "prelu2": sd[p + ".3.net.1.weight"].reshape(1),
                "norm2": norm(p + ".3.net.2"),
                "pointwise": {"weight": sd[p + ".3.net.3.weight"][..., 0]},
            }
    cfg = {"N": N, "L": L, "B": B, "H": H, "P": P, "X": X, "R": R,
           "audio_channels": ac, "n_sources": C}
    return {"params": params}, cfg


def load_tasnet(path: str):
    """Load a demucs v2 Conv-TasNet ``.th`` → (flax params, cfg)."""
    import torch

    _install_demucs_stubs()
    pkg = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(pkg, dict) and "state" in pkg:
        pkg = pkg["state"]
    return tasnet_params_from_state_dict(pkg)


# ---------------------------------------------------------------------------
# CREPE (torchcrepe layout: conv1..conv6, conv1_BN.., classifier)
# ---------------------------------------------------------------------------


def crepe_params_from_state_dict(state_dict: Mapping[str, object]) -> dict:
    return {"params": build_tree(state_dict, skip=(r"num_batches_tracked",))}


def load_crepe(path: str):
    import torch

    return crepe_params_from_state_dict(torch.load(path, map_location="cpu", weights_only=False))


# ---------------------------------------------------------------------------
# UVR5 VR networks (CascadedASPPNet / CascadedNet)
# ---------------------------------------------------------------------------

_VR_RENAMES = [
    # separable depthwise conv is a flat leaf param in our module
    (r"aspp\.conv([3456])\.conv\.0\.weight", r"aspp.conv\1.conv_0_weight"),
    (r"\.conv\.(\d+)\.", r".conv_\1."),  # Conv2DBNActiv sequential
    (r"conv1\.1\.conv_", r"conv1_1.conv_"),  # ASPP pooled branch
    (r"\.bottleneck\.0\.conv_", r".bottleneck_0.conv_"),
    (r"\.bottleneck\.conv_", r".bottleneck.conv_"),
    # CascadedNet (nets_new) extras
    (r"stg(\d)_low_band_net\.(\d)\.", r"stg\1_low_band_net_\2."),
    (r"\.conv1\.(\d+)\.", r".conv1_\1."),
    (r"\.conv2\.(\d+)\.", r".conv2_\1."),
    (r"\.lstm_dec2\.dense\.(\d+)\.", r".lstm_dec2.dense_\1."),
]


def vr_params_from_state_dict(state_dict) -> dict:
    """VR nets: besides name mapping, conv kernels must be spatially
    transposed — torch's spatial layout is (bins, frames) while ours is
    (frames, bins) (time-major like the rest of the framework)."""
    tree = build_tree(state_dict, renames=_VR_RENAMES,
                      skip=(r"num_batches_tracked", r"aux\d?_out", r"^aux_out"))

    def transpose_convs(node):
        if isinstance(node, dict):
            return {k: transpose_convs(v) for k, v in node.items()}
        arr = np.asarray(node)
        if arr.ndim == 4:  # (O, I, kh, kw) → swap spatial dims
            return np.ascontiguousarray(arr.transpose(0, 1, 3, 2))
        return arr

    return {"params": transpose_convs(tree)}


# ---------------------------------------------------------------------------
# BS-RoFormer (.ckpt, lucidrains/MSST layout — the UVR community format)
# ---------------------------------------------------------------------------


def bs_roformer_params_from_state_dict(state_dict: Mapping[str, object]) -> dict:
    """State-dict names map 1:1 through the generic path rule (the module
    tree in models/bs_roformer.py mirrors the torch layout); rotary
    frequency buffers are recomputed, not loaded."""
    tree = build_tree(
        state_dict,
        skip=(r"rotary_embed\.", r"multi_stft", r"stft_window", r"window_fn"),
    )
    return {"params": tree}


def bs_roformer_config_from_state_dict(state_dict: Mapping[str, object]):
    """Infer the architecture hyperparameters from tensor shapes, so any
    public checkpoint variant (mono/stereo, different depth/bands) loads
    without a side-channel YAML."""
    from ..models.bs_roformer import BSRoformerConfig

    sd = {k: v for k, v in state_dict.items()}
    if any("freq_indices" in k for k in sd):
        raise ValueError(
            "this looks like a Mel-Band RoFormer checkpoint (freq_indices "
            "buffer present); overlapping mel bands are a different "
            "architecture — load it with the mel_band_roformer importer")
    dims_in = []
    i = 0
    while f"band_split.to_features.{i}.1.weight" in sd:
        dims_in.append(int(sd[f"band_split.to_features.{i}.1.weight"].shape[1]))
        i += 1
    if not dims_in:
        raise ValueError("not a BS-RoFormer state dict (no band_split keys)")
    dim = int(sd["band_split.to_features.0.1.weight"].shape[0])
    total = sum(dims_in)  # == 2 * channels * (n_fft // 2 + 1)
    # channels: total = 2 * ch * bins with bins = n_fft//2+1, which is odd
    # for every even n_fft — so exactly one of ch∈{1,2} yields an odd,
    # integral bins count and per-band widths divisible by 2·ch. Validate
    # rather than guess (a mono checkpoint with odd total//4 must not be
    # silently loaded as stereo with halved n_fft).
    candidates = [
        ch for ch in (1, 2)
        if total % (2 * ch) == 0
        and (total // (2 * ch)) % 2 == 1
        and all(d % (2 * ch) == 0 for d in dims_in)
    ]
    if len(candidates) != 1:
        raise ValueError(
            f"cannot infer channel count from band widths {dims_in} "
            f"(total={total}): no unique ch in {{1,2}} gives an odd "
            "n_fft//2+1 bin count")
    ch = candidates[0]
    bins = total // (2 * ch)
    n_fft = (bins - 1) * 2
    freqs_per_bands = tuple(d // (2 * ch) for d in dims_in)
    # upstream builds the axial transformers with norm_output=False, so
    # real checkpoints have no layers.L.{0,1}.norm.gamma keys — infer
    # depth from the attention weights, which always exist.
    depth = 0
    while f"layers.{depth}.0.layers.0.0.to_qkv.weight" in sd:
        depth += 1
    if depth == 0:
        raise ValueError(
            "no transformer layers found (layers.0.0.layers.0.0.to_qkv."
            "weight missing) — unexpected BS-RoFormer state-dict layout")
    norm_output = "layers.0.0.norm.gamma" in sd
    t_depth = 0
    while f"layers.0.0.layers.{t_depth}.0.to_qkv.weight" in sd:
        t_depth += 1
    f_depth = 0
    while f"layers.0.1.layers.{f_depth}.0.to_qkv.weight" in sd:
        f_depth += 1
    heads = int(sd["layers.0.0.layers.0.0.to_gates.weight"].shape[0])
    dim_head = int(sd["layers.0.0.layers.0.0.to_qkv.weight"].shape[0]) // (3 * heads)
    ff_mult = int(sd["layers.0.0.layers.0.1.net.1.weight"].shape[0]) // dim
    num_stems = 0
    while f"mask_estimators.{num_stems}.to_freqs.0.0.0.weight" in sd:
        num_stems += 1
    est_depth = 0
    while f"mask_estimators.0.to_freqs.0.0.{2 * est_depth}.weight" in sd:
        est_depth += 1
    mlp_exp = 4
    if est_depth > 1:
        mlp_exp = int(sd["mask_estimators.0.to_freqs.0.0.0.weight"].shape[0]) // dim
    return BSRoformerConfig(
        dim=dim, depth=depth, stereo=ch == 2, num_stems=num_stems,
        time_transformer_depth=t_depth, freq_transformer_depth=f_depth,
        freqs_per_bands=freqs_per_bands, dim_head=dim_head, heads=heads,
        ff_mult=ff_mult, n_fft=n_fft, mask_estimator_depth=est_depth,
        mlp_expansion_factor=mlp_exp, transformer_norm_output=norm_output,
    )


def assert_params_match_model(params: Mapping, init_fn, *example_args,
                              what: str = "model") -> None:
    """Loudly fail if an imported param tree doesn't exactly match the
    module tree (missing keys → the model would silently run with
    untrained submodules; extra keys → wrong-layout checkpoint)."""
    import jax

    expected = jax.eval_shape(init_fn, *example_args)
    exp = {"/".join(map(str, p)): v.shape
           for p, v in jax.tree_util.tree_flatten_with_path(expected)[0]}
    got = {"/".join(map(str, p)): tuple(getattr(v, "shape", ()))
           for p, v in jax.tree_util.tree_flatten_with_path(params)[0]}

    def _name(path: str) -> str:
        return path.replace("DictKey(key='", "").replace("')", "")

    exp = {_name(k): tuple(v) for k, v in exp.items()}
    got = {_name(k): tuple(v) for k, v in got.items()}
    missing = sorted(set(exp) - set(got))
    extra = sorted(set(got) - set(exp))
    badshape = sorted(k for k in set(exp) & set(got) if exp[k] != got[k])
    if missing or extra or badshape:
        msg = [f"imported {what} params do not match the module tree:"]
        if missing:
            msg.append(f"  missing ({len(missing)}): {missing[:8]}")
        if extra:
            msg.append(f"  unexpected ({len(extra)}): {extra[:8]}")
        if badshape:
            msg.append("  shape mismatches: " + ", ".join(
                f"{k} {got[k]} != {exp[k]}" for k in badshape[:8]))
        raise ValueError("\n".join(msg))


def mel_roformer_config_from_state_dict(state_dict: Mapping[str, object]):
    """Infer a MelRoformerConfig from tensor shapes (+ the ``freq_indices``
    buffer when the checkpoint carries it; recomputed from the slaney mel
    filterbank pattern otherwise, validated against the band widths)."""
    from ..models.mel_roformer import MelRoformerConfig, mel_band_indices

    sd = {k: v for k, v in state_dict.items()}
    dims_in = []
    i = 0
    while f"band_split.to_features.{i}.1.weight" in sd:
        dims_in.append(int(sd[f"band_split.to_features.{i}.1.weight"].shape[1]))
        i += 1
    if not dims_in:
        raise ValueError("not a Mel-Band RoFormer state dict (no band_split keys)")
    dim = int(sd["band_split.to_features.0.1.weight"].shape[0])
    widths = tuple(d // 2 for d in dims_in)  # complex pairs → entry counts
    num_bands = len(widths)

    freq_indices = None
    for key in ("freq_indices", "model.freq_indices"):
        if key in sd:
            freq_indices = tuple(int(v) for v in np.asarray(sd[key]).reshape(-1))
            break
    if freq_indices is not None:
        FS = max(freq_indices) + 1
        idxset = set(freq_indices)
        # stereo iff every entry's channel sibling (idx ^ 1) is also present
        # and FS splits into an odd bin count over 2 channels
        stereo = (FS % 2 == 0 and (FS // 2) % 2 == 1
                  and all((v ^ 1) in idxset for v in freq_indices))
        ch = 2 if stereo else 1
        bins = FS // ch
        n_fft = (bins - 1) * 2
    else:
        # no buffer: try both channel counts against the recomputed pattern
        match = None
        for ch in (2, 1):
            if all(w % ch == 0 for w in widths):
                for n_fft in (2048, 4096, 1024):
                    idx, w = mel_band_indices(44100, n_fft, num_bands, ch)
                    if w == widths:
                        match = (idx, ch, n_fft)
                        break
            if match:
                break
        if match is None:
            raise ValueError(
                f"cannot reconstruct mel band layout for widths {widths[:8]}…; "
                "checkpoint lacks a freq_indices buffer and no standard "
                "(sr=44100, n_fft∈{1024,2048,4096}) layout matches")
        freq_indices, ch, n_fft = match
        stereo = ch == 2

    depth = 0
    while f"layers.{depth}.0.layers.0.0.to_qkv.weight" in sd:
        depth += 1
    if depth == 0:
        raise ValueError("no transformer layers found in mel roformer state dict")
    norm_output = "layers.0.0.norm.gamma" in sd
    t_depth = 0
    while f"layers.0.0.layers.{t_depth}.0.to_qkv.weight" in sd:
        t_depth += 1
    f_depth = 0
    while f"layers.0.1.layers.{f_depth}.0.to_qkv.weight" in sd:
        f_depth += 1
    heads = int(sd["layers.0.0.layers.0.0.to_gates.weight"].shape[0])
    dim_head = int(sd["layers.0.0.layers.0.0.to_qkv.weight"].shape[0]) // (3 * heads)
    ff_mult = int(sd["layers.0.0.layers.0.1.net.1.weight"].shape[0]) // dim
    num_stems = 0
    while f"mask_estimators.{num_stems}.to_freqs.0.0.0.weight" in sd:
        num_stems += 1
    est_depth = 0
    while f"mask_estimators.0.to_freqs.0.0.{2 * est_depth}.weight" in sd:
        est_depth += 1
    mlp_exp = 4
    if est_depth > 1:
        mlp_exp = int(sd["mask_estimators.0.to_freqs.0.0.0.weight"].shape[0]) // dim
    return MelRoformerConfig(
        dim=dim, depth=depth, stereo=stereo, num_stems=num_stems,
        time_transformer_depth=t_depth, freq_transformer_depth=f_depth,
        num_bands=num_bands, dim_head=dim_head, heads=heads, ff_mult=ff_mult,
        n_fft=n_fft, mask_estimator_depth=est_depth,
        mlp_expansion_factor=mlp_exp, transformer_norm_output=norm_output,
        freq_indices=freq_indices, band_widths=widths,
    )


def load_mel_roformer(path: str):
    """Returns (params, MelRoformerConfig) from a UVR/MSST .ckpt file."""
    import functools

    import jax
    import jax.numpy as jnp
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k[6:] if k.startswith("model.") else k: v for k, v in sd.items()}
    cfg = mel_roformer_config_from_state_dict(sd)
    tree = build_tree(
        sd,
        skip=(r"rotary_embed\.", r"multi_stft", r"stft_window", r"window_fn",
              r"freq_indices", r"freqs_per_band", r"num_freqs_per_band",
              r"num_bands_per_freq"),
    )
    params = {"params": tree}
    from ..models.mel_roformer import MelBandRoformer

    model = MelBandRoformer(cfg)
    FS = (cfg.n_fft // 2 + 1) * cfg.audio_channels
    assert_params_match_model(
        params,
        functools.partial(model.init, jax.random.PRNGKey(0)),
        jnp.zeros((1, 8, FS, 2)),
        what="mel_band_roformer",
    )
    return params, cfg


def load_bs_roformer(path: str):
    """Returns (params, BSRoformerConfig) from a UVR/MSST .ckpt file."""
    import functools

    import jax
    import jax.numpy as jnp
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k[6:] if k.startswith("model.") else k: v for k, v in sd.items()}
    cfg = bs_roformer_config_from_state_dict(sd)
    params = bs_roformer_params_from_state_dict(sd)
    from ..models.bs_roformer import BSRoformer

    model = BSRoformer(cfg)
    FS = (cfg.n_fft // 2 + 1) * cfg.audio_channels
    assert_params_match_model(
        params,
        functools.partial(model.init, jax.random.PRNGKey(0)),
        jnp.zeros((1, 8, FS, 2)),
        what="bs_roformer",
    )
    return params, cfg
