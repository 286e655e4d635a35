"""MuseTalk lip-sync nodes (reference custom_nodes/musetalk_nodes.py)."""
from __future__ import annotations

import numpy as np

from ..utils import get_hash


class MuseAudioFeatureExtractionNode:
    """Audio → per-video-frame whisper features (reference :96)."""

    CATEGORY = "rvc_tpu/musetalk"
    RETURN_TYPES = ("WHISPER_FEATURES", "INT")
    RETURN_NAMES = ("features", "num_frames")
    FUNCTION = "extract"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"audio": ("AUDIO",),
                             "whisper": ("WHISPER_MODEL",),
                             "fps": ("FLOAT", {"default": 25.0})}}

    def extract(self, audio, whisper, fps: float = 25.0):
        from .nodes import from_audio_input
        from ..io.audio import remix_audio
        from ..pipelines.musetalk import Audio2Feature

        wav, sr = from_audio_input(audio)
        mono, _ = remix_audio((wav, sr), target_sr=16000)
        m = whisper() if callable(whisper) else whisper
        a2f = Audio2Feature(m["params"], m["dims"])
        feats = a2f.audio2feat(mono)
        rows = feats[:, -1]
        chunks = a2f.feature2chunks(rows, fps)
        return (np.stack(chunks), len(chunks))


class MuseImageFeatureExtractionNode:
    """Image preprocessing: per-frame face crop coordinates (reference
    MuseImageFeatureExtractionNode.process :167 — bbox detection with a
    cached coord list). With a face model path the S3FD detector runs;
    otherwise full-frame boxes are returned."""

    CATEGORY = "rvc_tpu/musetalk"
    RETURN_TYPES = ("COORDS", "IMAGE")
    RETURN_NAMES = ("coord_list", "images")
    FUNCTION = "process"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"images": ("IMAGE",)},
                "optional": {"face_model_path": ("STRING", {"default": ""}),
                             "use_cache": ("BOOLEAN", {"default": True})}}

    _CACHE: dict = {}

    def process(self, images, face_model_path="", use_cache=True):
        frames = [np.asarray(f) for f in np.asarray(images)]
        frames = [(f * 255).astype(np.uint8) if f.dtype != np.uint8 else f
                  for f in frames]
        key = get_hash("musecoords", len(frames), get_hash(frames[0].tobytes()),
                       face_model_path)
        if use_cache and key in self._CACHE:
            return (self._CACHE[key], images)
        if face_model_path:
            import torch

            from ..models.musetalk.face import s3fd_params_from_state_dict
            from ..pipelines.musetalk import MuseTalkPipeline

            face_params = s3fd_params_from_state_dict(
                torch.load(face_model_path, map_location="cpu",
                           weights_only=False))
            pipe = MuseTalkPipeline(None, None, None, face_params)
            coords = pipe.detect_faces(frames)
        else:
            coords = [(0, 0, f.shape[1], f.shape[0]) for f in frames]
        if use_cache:
            self._CACHE[key] = coords
        return (coords, images)


class MuseTalkNode:
    """Latent lip-sync inference (reference MuseTalkNode.process :224)."""

    CATEGORY = "rvc_tpu/musetalk"
    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "process"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "images": ("IMAGE",),
            "audio": ("AUDIO",),
            "whisper": ("WHISPER_MODEL",),
            "vae_path": ("STRING", {"default": ""}),
            "unet_path": ("STRING", {"default": ""}),
        }, "optional": {
            "face_model_path": ("STRING", {"default": ""}),
            "parsing_model_path": ("STRING", {"default": ""}),
            "coords": ("COORDS",),
            "fps": ("FLOAT", {"default": 25.0}),
            "batch_size": ("INT", {"default": 8}),
        }}

    def process(self, images, audio, whisper, vae_path, unet_path,
                face_model_path="", parsing_model_path="", coords=None,
                fps=25.0, batch_size=8):
        import torch

        from .nodes import from_audio_input
        from ..io.audio import remix_audio
        from ..models.musetalk.vae import vae_params_from_state_dict
        from ..models.musetalk.unet import unet_params_from_state_dict
        from ..models.musetalk.face import s3fd_params_from_state_dict
        from ..pipelines.musetalk import Audio2Feature, MuseTalkPipeline

        wav, sr = from_audio_input(audio)
        mono, _ = remix_audio((wav, sr), target_sr=16000)
        m = whisper() if callable(whisper) else whisper
        a2f = Audio2Feature(m["params"], m["dims"])
        vae_params = vae_params_from_state_dict(
            torch.load(vae_path, map_location="cpu", weights_only=False))
        unet_params = unet_params_from_state_dict(
            torch.load(unet_path, map_location="cpu", weights_only=False))
        face_params = None
        if face_model_path:
            face_params = s3fd_params_from_state_dict(
                torch.load(face_model_path, map_location="cpu", weights_only=False))
        parse_params = None
        if parsing_model_path:
            # BiSeNet 79999_iter.pth → jaw-region parsed blend
            # (reference blending.py:23-59 via face_parsing/__init__.py)
            from ..models.musetalk.face import bisenet_params_from_state_dict

            parse_params = bisenet_params_from_state_dict(
                torch.load(parsing_model_path, map_location="cpu",
                           weights_only=False))
        pipe = MuseTalkPipeline(vae_params, unet_params, a2f, face_params,
                                parse_params)
        frames = [np.asarray(f) for f in np.asarray(images)]
        frames = [(f * 255).astype(np.uint8) if f.dtype != np.uint8 else f
                  for f in frames]
        if coords is not None:
            boxes = list(coords)
        elif face_params is not None:
            boxes = None  # detect inside the pipeline
        else:
            boxes = [(0, 0, f.shape[1], f.shape[0]) for f in frames]
        out = pipe.process(frames, mono, fps=fps, boxes=boxes, batch_size=batch_size)
        return (np.stack([f.astype(np.float32) / 255.0 for f in out]),)


MUSETALK_NODE_CLASS_MAPPINGS = {
    "RVC_TPU_MuseAudioFeatures": MuseAudioFeatureExtractionNode,
    "RVC_TPU_MuseImageFeatures": MuseImageFeatureExtractionNode,
    "RVC_TPU_MuseTalk": MuseTalkNode,
}
