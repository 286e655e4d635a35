"""Flax param-tree → reference-format checkpoint export.

Produces the RVC *inference* .pth format that the reference ecosystem
consumes (fp16 weights, no enc_q, positional ``config`` list + sr/f0/
version/info keys — reference training_cli.py:38-74), so models trained
with rvc_tpu drop into any RVC tooling.
"""
from __future__ import annotations

import re
from typing import Mapping

import numpy as np


def flax_path_to_torch_key(path: tuple[str, ...]) -> str:
    """Inverse of torch_key_to_path for synthesizer trees: one trailing
    ``_N`` per component becomes ``.N`` (ModuleList index)."""
    parts = []
    for p in path:
        m = re.match(r"^(.*)_(\d+)$", p)
        parts.append(f"{m.group(1)}.{m.group(2)}" if m else p)
    return ".".join(parts)


def flatten_tree(tree: Mapping, prefix: tuple[str, ...] = ()) -> dict[tuple[str, ...], np.ndarray]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out.update(flatten_tree(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def synthesizer_state_dict(params: Mapping, half: bool = True) -> dict[str, np.ndarray]:
    """Flax synthesizer params → torch-style flat state_dict (fp16, no enc_q)."""
    tree = params.get("params", params)
    flat = flatten_tree(tree)
    sd = {}
    for path, arr in flat.items():
        if path[0] == "enc_q":
            continue
        key = flax_path_to_torch_key(path)
        sd[key] = arr.astype(np.float16) if half else arr.astype(np.float32)
    return sd


def save_rvc_checkpoint(
    path: str,
    params: Mapping,
    config: list,
    sr: str | int,
    f0: int = 1,
    version: str = "v2",
    epoch: int | str = "",
    info: str = "",
) -> None:
    """Write the reference inference checkpoint (training_cli.py:38-74)."""
    import torch

    sd = {k: torch.from_numpy(v.copy()) for k, v in synthesizer_state_dict(params).items()}
    cpt = {
        "weight": sd,
        "config": list(config),
        "info": info or f"{epoch}epoch",
        "sr": sr,
        "f0": f0,
        "version": version,
    }
    torch.save(cpt, path)
