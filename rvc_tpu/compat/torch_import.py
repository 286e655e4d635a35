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
    dims_in = []
    i = 0
    while f"band_split.to_features.{i}.1.weight" in sd:
        dims_in.append(int(sd[f"band_split.to_features.{i}.1.weight"].shape[1]))
        i += 1
    if not dims_in:
        raise ValueError("not a BS-RoFormer state dict (no band_split keys)")
    dim = int(sd["band_split.to_features.0.1.weight"].shape[0])
    total = sum(dims_in)  # == 2 * channels * (n_fft // 2 + 1)
    # channels: total = 2 * ch * bins with bins = n_fft//2+1 (odd) → ch is
    # the largest of {1,2} dividing total/2 into an odd bins count
    ch = 2 if (total // 4) % 2 == 1 else 1
    bins = total // (2 * ch)
    n_fft = (bins - 1) * 2
    freqs_per_bands = tuple(d // (2 * ch) for d in dims_in)
    depth = 0
    while f"layers.{depth}.0.norm.gamma" in sd:
        depth += 1
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
        mlp_expansion_factor=mlp_exp,
    )


def load_bs_roformer(path: str):
    """Returns (params, BSRoformerConfig) from a UVR/MSST .ckpt file."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k[6:] if k.startswith("model.") else k: v for k, v in sd.items()}
    cfg = bs_roformer_config_from_state_dict(sd)
    return bs_roformer_params_from_state_dict(sd), cfg
