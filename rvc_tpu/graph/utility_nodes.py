"""Utility glue nodes (reference custom_nodes/utility_nodes.py).

Batch merging, RMS-weighted repeat-interleave for latent/image batches,
math/slice/zip/sort helpers. Torch-free: IMAGE/LATENT payloads are numpy
arrays (ComfyUI tensors convert transparently via np.asarray).
"""
from __future__ import annotations

import numpy as np


def _as_np(x):
    return np.asarray(x if not hasattr(x, "numpy") else x.numpy())


class MergeImageBatchesNode:
    """Concatenate image batches (reference utility_nodes.py:13 uses a
    memmap for huge batches; numpy concatenate covers the node contract)."""

    CATEGORY = "rvc_tpu/utils"
    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "merge"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"images1": ("IMAGE",), "images2": ("IMAGE",)}}

    def merge(self, images1, images2):
        return (np.concatenate([_as_np(images1), _as_np(images2)], axis=0),)


class MergeLatentBatchesNode:
    """Concatenate a list of LATENT dicts along the batch dim (reference
    utility_nodes.py:88 MergeLatentBatches): merges ``samples`` and any
    ``noise_mask``, rebuilds ``batch_index``, drops empty fields."""

    CATEGORY = "rvc_tpu/utils"
    RETURN_TYPES = ("LATENT",)
    INPUT_IS_LIST = True
    FUNCTION = "merge"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"latents": ("LATENT",)}}

    def merge(self, latents):
        samples = np.concatenate(
            [_as_np(lat["samples"]) for lat in latents], axis=0)
        merged = {"samples": samples,
                  "batch_index": list(range(len(samples)))}
        masks = [_as_np(lat["noise_mask"]) for lat in latents
                 if "noise_mask" in lat]
        if masks:
            merged["noise_mask"] = np.concatenate(masks, axis=0)
        return (merged,)


class ImageRepeatInterleavedNode:
    """Repeat each image by per-frame weights (reference :120-170)."""

    CATEGORY = "rvc_tpu/utils"
    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "repeat"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"images": ("IMAGE",), "repeats": ("FLOAT",)},
                "optional": {"max_frames": ("INT", {"default": 0})}}

    def repeat(self, images, repeats, max_frames: int = 0):
        imgs = _as_np(images)
        reps = np.maximum(np.rint(np.atleast_1d(np.asarray(repeats))).astype(int), 1)
        if len(reps) < len(imgs):
            reps = np.resize(reps, len(imgs))
        out = np.repeat(imgs, reps[: len(imgs)], axis=0)
        if max_frames > 0:
            out = out[:max_frames]
        return (out,)


class LatentRepeatInterleavedNode:
    """Same, over LATENT dicts (reference :173-220)."""

    CATEGORY = "rvc_tpu/utils"
    RETURN_TYPES = ("LATENT",)
    FUNCTION = "repeat"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"latents": ("LATENT",), "repeats": ("FLOAT",)},
                "optional": {"max_frames": ("INT", {"default": 0})}}

    def repeat(self, latents, repeats, max_frames: int = 0):
        samples = _as_np(latents["samples"])
        reps = np.maximum(np.rint(np.atleast_1d(np.asarray(repeats))).astype(int), 1)
        if len(reps) < len(samples):
            reps = np.resize(reps, len(samples))
        out = np.repeat(samples, reps[: len(samples)], axis=0)
        if max_frames > 0:
            out = out[:max_frames]
        return ({"samples": out},)


class MathNode:
    CATEGORY = "rvc_tpu/utils"
    RETURN_TYPES = ("FLOAT",)
    FUNCTION = "calc"

    OPS = {
        "add": np.add, "subtract": np.subtract, "multiply": np.multiply,
        "divide": np.divide, "min": np.minimum, "max": np.maximum, "pow": np.power,
    }

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"a": ("FLOAT",), "b": ("FLOAT",),
                             "op": (list(cls.OPS), {"default": "add"})}}

    def calc(self, a, b, op="add"):
        result = self.OPS[op](np.asarray(a, np.float64), np.asarray(b, np.float64))
        return (result.tolist() if result.ndim else float(result),)


class SliceNode:
    CATEGORY = "rvc_tpu/utils"
    RETURN_TYPES = ("*",)
    FUNCTION = "slice"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"values": ("*",), "start": ("INT", {"default": 0}),
                             "end": ("INT", {"default": -1})}}

    def slice(self, values, start=0, end=-1):
        end = None if end == -1 else end
        return (values[start:end],)


class ZipNode:
    CATEGORY = "rvc_tpu/utils"
    RETURN_TYPES = ("*",)
    FUNCTION = "zip"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"a": ("*",), "b": ("*",)}}

    def zip(self, a, b):
        return (list(zip(a, b)),)


class SortNode:
    CATEGORY = "rvc_tpu/utils"
    RETURN_TYPES = ("*",)
    FUNCTION = "sort"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"values": ("*",)},
                "optional": {"reverse": ("BOOLEAN", {"default": False})}}

    def sort(self, values, reverse=False):
        return (sorted(values, reverse=reverse),)


class Any2ListNode:
    """Wrap any value into a ComfyUI output list (reference
    utility_nodes.py Any2ListNode:341)."""

    CATEGORY = "rvc_tpu/utility"
    RETURN_TYPES = ("*",)
    OUTPUT_IS_LIST = (True,)
    FUNCTION = "to"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"any": ("*",)}}

    def to(self, any):  # noqa: A002 - reference signature
        return (list(any),)


class List2AnyNode:
    """Collapse a ComfyUI input list back into one value (reference
    utility_nodes.py List2AnyNode:361)."""

    CATEGORY = "rvc_tpu/utility"
    RETURN_TYPES = ("*",)
    INPUT_IS_LIST = (True,)
    FUNCTION = "to"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"any": ("*",)}}

    def to(self, any):  # noqa: A002
        return (any,)


UTILITY_NODE_CLASS_MAPPINGS = {
    "RVC_TPU_Any2List": Any2ListNode,
    "RVC_TPU_List2Any": List2AnyNode,
    "RVC_TPU_MergeImageBatches": MergeImageBatchesNode,
    "RVC_TPU_MergeLatentBatches": MergeLatentBatchesNode,
    "RVC_TPU_ImageRepeatInterleaved": ImageRepeatInterleavedNode,
    "RVC_TPU_LatentRepeatInterleaved": LatentRepeatInterleavedNode,
    "RVC_TPU_Math": MathNode,
    "RVC_TPU_Slice": SliceNode,
    "RVC_TPU_Zip": ZipNode,
    "RVC_TPU_Sort": SortNode,
}
