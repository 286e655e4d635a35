"""Checkpointing: Orbax training state + reference-format interop.

Two formats, mirroring the reference (SURVEY §5):
  1. *Training* checkpoints — full TrainState (params G/D, both optimizer
     states, step, balancer EMAs) via Orbax; ``latest_checkpoint`` resumes
     the highest step (reference latest_checkpoint_path,
     lib/train/utils.py:182-187).
  2. *Inference* export — fp16 .pth minus enc_q with the positional config
     list (compat/torch_export.py; reference training_cli.py:38-74), plus
     import of reference pretrained G_/D_ state_dicts as warm starts
     (reference training_cli.py:249-273).
"""
from __future__ import annotations

import os
import re
from typing import Any

import jax
import numpy as np


def save_train_state(ckpt_dir: str, state, step: int) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"state_{step}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(ckpt_dir):
        m = re.match(r"state_(\d+)$", name)
        if m and int(m.group(1)) > best_step:
            best, best_step = os.path.join(ckpt_dir, name), int(m.group(1))
    return best


def restore_train_state(path: str, template):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=template)


def load_pretrained_g(path: str) -> dict:
    """Reference pretrained G_*.pth ('model' key or raw state_dict) → flax
    params (shape-tolerant like reference load_checkpoint,
    lib/train/utils.py:76-116: missing/mismatched keys keep init values —
    handled by the caller merging trees)."""
    import torch

    from ..compat.torch_import import build_tree

    cpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = cpt.get("model", cpt.get("weight", cpt))
    return build_tree(sd)


def merge_pretrained(init_params: dict, pretrained: dict, verbose: bool = False) -> dict:
    """Overlay pretrained leaves whose path+shape match (shape-tolerant
    resume semantics of reference lib/train/utils.py:76-116)."""

    def merge(dst, src, path=""):
        out = {}
        for k, v in dst.items():
            if isinstance(v, dict):
                out[k] = merge(v, src.get(k, {}), f"{path}/{k}") if isinstance(src.get(k), dict) else v
            else:
                s = src.get(k)
                if s is not None and np.shape(s) == np.shape(v):
                    out[k] = np.asarray(s, dtype=np.asarray(v).dtype)
                else:
                    if verbose and s is not None:
                        print(f"shape mismatch at {path}/{k}: {np.shape(s)} vs {np.shape(v)}")
                    out[k] = v
        return out

    return merge(init_params, pretrained)
