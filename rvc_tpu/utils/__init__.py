"""Host-side utilities: hashing, merge functions, namespaces.

Covers reference lib/utils.py (get_hash, merge funcs, thread pickers) and
lib/__init__.py (ObjectNamespace) without the torch/psutil dependencies.
"""
from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Callable

import numpy as np


def get_hash(*args) -> str:
    """Stable md5 of the stringified args (reference lib/utils.py:19-24)."""

    def default(o):
        if isinstance(o, np.ndarray):
            return hashlib.md5(o.tobytes()).hexdigest()
        return str(o)

    payload = json.dumps(args, default=default, sort_keys=True)
    return hashlib.md5(payload.encode()).hexdigest()


def file_hash(path: str, tail_bytes: int = 10000 * 1024) -> str:
    """md5 of the last `tail_bytes` of a file (reference lib/model_utils.py:9-16)."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        if size > tail_bytes:
            f.seek(-tail_bytes, 2)
        return hashlib.md5(f.read()).hexdigest()


_MERGE_FUNCS: dict[str, Callable] = {
    "min": np.nanmin,
    "max": np.nanmax,
    "median": np.nanmedian,
    "mean": np.nanmean,
}


def get_merge_func(merge_type: str | None) -> Callable:
    """Reference lib/utils.py:104-111: nan-aware reducers keyed by name."""
    return _MERGE_FUNCS.get(merge_type or "median", np.nanmedian)


class ObjectNamespace(dict):
    """Attribute-style dict (reference lib/__init__.py:15-34)."""

    def __getattr__(self, k: str) -> Any:
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k: str, v: Any) -> None:
        self[k] = v

    def __delattr__(self, k: str) -> None:
        del self[k]
