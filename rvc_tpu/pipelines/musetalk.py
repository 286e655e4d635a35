"""MuseTalk lip-sync pipeline (reference custom_nodes/musetalk_nodes.py +
lib/musetalk/).

Stages (reference musetalk_nodes.py:224-290):
  1. whisper features per video frame (Audio2Feature slicing of 50 Hz
     encoder embeddings, reference audio2feature.py:14-40),
  2. face bbox per frame (S3FD), crop + resize 256,
  3. VAE encode the half-masked crop + the reference crop → (B, 32, 32, 8)
     latent input, UNet single step at t=0 with PE'd audio features,
  4. VAE decode → paste back with a face-parsing-feathered mask
     (reference blending.py:23-59).

All heavy stages are batched device dispatches; OpenCV work stays host-side.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.whisper import (
    N_FRAMES,
    Whisper,
    WhisperDims,
    log_mel_spectrogram,
)


class Audio2Feature:
    """Per-video-frame whisper feature windows (reference audio2feature.py)."""

    def __init__(self, params, dims: WhisperDims, dtype=jnp.float32):
        self.params = params
        self.dims = dims
        self.model = Whisper(dims, dtype=dtype)
        self._embed = jax.jit(
            lambda p, mel: self.model.apply(p, mel, True, method=Whisper.embed_audio)
        )

    def audio2feat(self, audio: np.ndarray) -> np.ndarray:
        """(T,) 16 kHz -> (frames50, 5*layers?, D) whisper embeddings.

        The reference stacks per-chunk encoder embeddings over layers and
        keeps a 50 Hz grid (2 encoder frames per 20 ms...); here we return
        (frames, n_layers+1?, D) == reshaped (frames*2, D) per the
        reference's get_sliced_feature contract (rows of 384)."""
        T = len(audio)
        feats = []
        for start in range(0, T, 30 * 16000):
            seg = audio[start : start + 30 * 16000]
            seg = np.pad(seg, (0, 30 * 16000 - len(seg)))
            mel = log_mel_spectrogram(jnp.asarray(seg, jnp.float32)[None])
            _, layers = self._embed(self.params, mel)
            # (1, L, 1500, D) -> (1500, L, D); valid frames = ceil(len/320)
            emb = np.asarray(layers[0]).transpose(1, 0, 2)
            n_valid = int(np.ceil(len(audio[start : start + 30 * 16000]) / 320))
            feats.append(emb[:n_valid])
        return np.concatenate(feats, axis=0)  # (frames50, L, D)

    @staticmethod
    def get_sliced_feature(feature_array: np.ndarray, vid_idx: int,
                           audio_feat_length=(2, 2), fps: float = 25.0):
        """Window of 2·(l+r+1) 50 Hz feature rows centered on the video frame
        (reference audio2feature.py:14-40)."""
        length = len(feature_array)
        center = int(vid_idx * 50 / fps)
        left = center - audio_feat_length[0] * 2
        right = center + (audio_feat_length[1] + 1) * 2
        rows = []
        idxs = []
        for i in range(left, right):
            i = int(np.clip(i, 0, length - 1))
            rows.append(feature_array[i])
            idxs.append(i)
        out = np.concatenate(rows, axis=0).reshape(-1, feature_array.shape[-1])
        return out, idxs

    def feature2chunks(self, feature_array: np.ndarray, fps: float,
                       audio_feat_length=(2, 2)) -> list[np.ndarray]:
        n_frames = int(len(feature_array) / 50 * fps)
        return [
            self.get_sliced_feature(feature_array, i, audio_feat_length, fps)[0]
            for i in range(n_frames)
        ]


def blend_face(frame: np.ndarray, face: np.ndarray, box: tuple[int, int, int, int],
               mask: np.ndarray | None = None, expand: float = 1.2) -> np.ndarray:
    """Paste the generated face back with a feathered mask (reference
    lib/musetalk/utils/blending.py:23-59). frame/face uint8 RGB; box
    (x1, y1, x2, y2)."""
    import cv2

    x1, y1, x2, y2 = box
    h, w = frame.shape[:2]
    face_resized = cv2.resize(face, (x2 - x1, y2 - y1))
    if mask is None:
        mask = np.ones(face_resized.shape[:2], np.float32)
    else:
        mask = cv2.resize(mask.astype(np.float32), (x2 - x1, y2 - y1))
    ks = max((x2 - x1) // 10 * 2 + 1, 3)
    mask = cv2.GaussianBlur(mask, (ks, ks), 0)[..., None]
    out = frame.copy()
    region = frame[y1:y2, x1:x2].astype(np.float32)
    out[y1:y2, x1:x2] = (mask * face_resized + (1 - mask) * region).astype(np.uint8)
    return out


class FaceParser:
    """BiSeNet face segmentation → binary face mask (reference
    lib/musetalk/utils/face_parsing/__init__.py:30-47: resize 512,
    imagenet-normalize, argmax over 19 classes, keep classes 1-13)."""

    _MEAN = np.array([0.485, 0.456, 0.406], np.float32)
    _STD = np.array([0.229, 0.224, 0.225], np.float32)

    def __init__(self, params, dtype: Any = jnp.float32, size: int = 512):
        from ..models.musetalk.face import BiSeNet

        self.params = params
        self.size = size
        model = BiSeNet(dtype=dtype)
        self._apply = jax.jit(lambda p, x: jnp.argmax(model.apply(p, x), axis=-1))

    def __call__(self, images: list[np.ndarray]) -> list[np.ndarray]:
        """uint8 RGB crops (any sizes) → uint8 0/255 masks at input sizes;
        one batched device dispatch for the whole group."""
        import cv2

        s = self.size
        batch = np.stack([
            (cv2.resize(im, (s, s), interpolation=cv2.INTER_LINEAR)
             .astype(np.float32) / 255.0 - self._MEAN) / self._STD
            for im in images
        ])
        cls = np.asarray(self._apply(self.params, jnp.asarray(batch)))
        masks = ((cls >= 1) & (cls <= 13)).astype(np.uint8) * 255
        return [
            cv2.resize(m, (im.shape[1], im.shape[0]),
                       interpolation=cv2.INTER_NEAREST)
            for m, im in zip(masks, images)
        ]


def _crop_box(box: tuple[int, int, int, int], expand: float):
    """Square expanded crop box (reference blending.py get_crop_box)."""
    x, y, x1, y1 = box
    xc, yc = (x + x1) // 2, (y + y1) // 2
    s = int(max(x1 - x, y1 - y) // 2 * expand)
    return (xc - s, yc - s, xc + s, yc + s), s


def _crop_padded(img: np.ndarray, box) -> np.ndarray:
    """PIL-style crop: out-of-bounds area is zero-filled."""
    x0, y0, x1, y1 = box
    h, w = img.shape[:2]
    out = np.zeros((y1 - y0, x1 - x0) + img.shape[2:], img.dtype)
    sx0, sy0 = max(x0, 0), max(y0, 0)
    sx1, sy1 = min(x1, w), min(y1, h)
    if sx1 > sx0 and sy1 > sy0:
        out[sy0 - y0 : sy1 - y0, sx0 - x0 : sx1 - x0] = img[sy0:sy1, sx0:sx1]
    return out


def blend_face_parsed(frame: np.ndarray, face: np.ndarray,
                      box: tuple[int, int, int, int], mask_crop: np.ndarray,
                      upper_boundary_ratio: float = 0.5,
                      expand: float = 1.2) -> np.ndarray:
    """Face-parsing-feathered paste-back (reference blending.py:23-59):
    segment the expanded square crop, keep the mask inside the face box,
    zero the top ``upper_boundary_ratio`` of the crop (only the talking
    jaw region blends), Gaussian-feather, composite."""
    import cv2

    x, y, x1, y1 = box
    cbox, _ = _crop_box(box, expand)
    x_s, y_s, x_e, y_e = cbox
    face_large = _crop_padded(frame, cbox)
    ch, cw = face_large.shape[:2]

    # mask restricted to the face box inside the crop
    mask = np.zeros((ch, cw), np.uint8)
    sub = mask_crop[y - y_s : y1 - y_s, x - x_s : x1 - x_s]
    mask[y - y_s : y1 - y_s, x - x_s : x1 - x_s] = sub
    mask[: int(ch * upper_boundary_ratio)] = 0
    ks = int(0.1 * cw // 2 * 2) + 1
    mask = cv2.GaussianBlur(mask, (ks, ks), 0).astype(np.float32) / 255.0

    face_resized = cv2.resize(face, (x1 - x, y1 - y))
    face_large[y - y_s : y1 - y_s, x - x_s : x1 - x_s] = face_resized

    out = frame.copy()
    dx0, dy0 = max(x_s, 0), max(y_s, 0)
    dx1, dy1 = min(x_e, frame.shape[1]), min(y_e, frame.shape[0])
    m = mask[dy0 - y_s : dy1 - y_s, dx0 - x_s : dx1 - x_s, None]
    src = face_large[dy0 - y_s : dy1 - y_s, dx0 - x_s : dx1 - x_s].astype(np.float32)
    dst = frame[dy0:dy1, dx0:dx1].astype(np.float32)
    out[dy0:dy1, dx0:dx1] = (m * src + (1 - m) * dst).astype(np.uint8)
    return out


def refine_box_with_landmarks(box: tuple[int, int, int, int],
                              landmarks: np.ndarray,
                              bbox_shift: int = 0) -> tuple[int, int, int, int]:
    """Landmark-refined crop box (reference preprocessing.py:105-131).

    The upper bound is mirrored around the nose-bridge point (landmark 29,
    68-point layout; ``bbox_shift`` nudges it down/up like the reference's
    upperbondrange knob), sides/bottom hug the landmark extents. Falls back
    to the detector box when the refined one is degenerate."""
    lm = np.asarray(landmarks)
    half_y = float(lm[29, 1]) + bbox_shift
    half_dist = float(np.max(lm[:, 1])) - half_y
    upper = max(0.0, half_y - half_dist)
    x1 = int(np.min(lm[:, 0]))
    y1 = int(upper)
    x2 = int(np.max(lm[:, 0]))
    y2 = int(np.max(lm[:, 1]))
    if y2 - y1 <= 0 or x2 - x1 <= 0 or x1 < 0:
        return box
    return (x1, y1, x2, y2)


@dataclass
class MuseTalkPipeline:
    """End-to-end lip sync over a frame sequence."""

    vae_params: Any
    unet_params: Any
    whisper: Audio2Feature
    face_params: Any = None  # S3FD params; None → caller provides boxes
    parse_params: Any = None  # BiSeNet params; None → bbox-feathered blend
    fan_params: Any = None  # FAN params; None → raw S3FD boxes (no refine)
    dtype: Any = jnp.float32

    def __post_init__(self):
        self.parser = (FaceParser(self.parse_params, dtype=self.dtype)
                       if self.parse_params is not None else None)
        from ..models.musetalk.unet import UNet2DCondition, UNetConfig, positional_encoding
        from ..models.musetalk.vae import AutoencoderKL

        self.vae = AutoencoderKL(dtype=self.dtype)
        self.unet = UNet2DCondition(UNetConfig(), dtype=self.dtype)
        self._pe = positional_encoding
        self._encode = jax.jit(
            lambda p, x: self.vae.apply(p, x, method=AutoencoderKL.encode))
        self._decode = jax.jit(
            lambda p, z: self.vae.apply(p, z, method=AutoencoderKL.decode))
        self._unet_step = jax.jit(
            lambda p, lat, feat: self.unet.apply(
                p, lat, jnp.zeros((lat.shape[0],), jnp.int32), feat))

    def detect_faces(self, frames: list[np.ndarray]) -> list[tuple[int, int, int, int]]:
        from ..models.musetalk.face import S3FD, decode_s3fd, nms

        model = S3FD(dtype=self.dtype)
        boxes = []
        for frame in frames:
            x = frame.astype(np.float32) - np.array([104.0, 117.0, 123.0])
            outs = model.apply(self.face_params, jnp.asarray(x[None]))
            dets = nms(decode_s3fd([np.asarray(o) for o in outs]), 0.3)
            if len(dets) == 0:
                boxes.append((0, 0, frame.shape[1], frame.shape[0]))
            else:
                s, x1, y1, x2, y2 = dets[0]
                boxes.append((int(x1), int(y1), int(x2), int(y2)))
        return boxes

    def get_landmarks(self, frames: list[np.ndarray],
                      boxes: list[tuple[int, int, int, int]],
                      size: int = 256) -> list[np.ndarray]:
        """68-point landmarks per frame (FAN over the face crops, ONE
        batched dispatch), mapped back to full-frame pixel coordinates."""
        import cv2

        from ..models.musetalk.face import FAN, heatmaps_to_landmarks

        # stack depth is encoded in the checkpoint (l0..l{n-1} heads)
        heads = [k for k in self.fan_params["params"]
                 if k.startswith("l") and k[1:].isdigit()]
        model = FAN(num_modules=len(heads), dtype=self.dtype)
        crops, metas = [], []
        for frame, (x1, y1, x2, y2) in zip(frames, boxes):
            crop = frame[y1:y2, x1:x2]
            if crop.size == 0:
                crop, x1, y1 = frame, 0, 0
            ch, cw = crop.shape[:2]
            crops.append(cv2.resize(crop, (size, size)).astype(np.float32) / 255.0)
            metas.append((x1, y1, cw, ch))
        hm = model.apply(self.fan_params, jnp.asarray(np.stack(crops)))
        pts = np.asarray(heatmaps_to_landmarks(hm))  # (N, 68, 2) crop coords
        return [p * np.array([cw / size, ch / size]) + np.array([x1, y1])
                for p, (x1, y1, cw, ch) in zip(pts, metas)]

    def process(self, frames: list[np.ndarray], audio: np.ndarray, fps: float = 25.0,
                boxes: list[tuple[int, int, int, int]] | None = None,
                batch_size: int = 8, bbox_shift: int = 0) -> list[np.ndarray]:
        """frames: uint8 RGB; audio: (T,) 16 kHz → lip-synced frames."""
        import cv2

        from ..models.musetalk.vae import postprocess_image, preprocess_image

        feats50 = self.whisper.audio2feat(audio)
        # use the last encoder layer rows (reference uses stacked embeddings)
        feat_rows = feats50[:, -1]  # (frames50, D)
        chunks = Audio2Feature.get_sliced_feature  # noqa: F841
        if boxes is None:
            boxes = self.detect_faces(frames)
            if self.fan_params is not None:
                landmarks = self.get_landmarks(frames, boxes)
                boxes = [refine_box_with_landmarks(b, lm, bbox_shift)
                         for b, lm in zip(boxes, landmarks)]

        out_frames = []
        n = min(len(frames), int(len(feat_rows) / 50 * fps))
        for k in range(0, n, batch_size):
            group = list(range(k, min(k + batch_size, n)))
            crops, feats = [], []
            for i in group:
                x1, y1, x2, y2 = boxes[i]
                crop = frames[i][y1:y2, x1:x2]
                masked = preprocess_image(crop, half_mask=True)
                ref = preprocess_image(crop, half_mask=False)
                crops.append((masked, ref))
                f, _ = Audio2Feature.get_sliced_feature(feat_rows, i, (2, 2), fps)
                feats.append(f)
            masked_b = jnp.asarray(np.concatenate([c[0] for c in crops]))
            ref_b = jnp.asarray(np.concatenate([c[1] for c in crops]))
            lat_masked = self._encode(self.vae_params, masked_b)
            lat_ref = self._encode(self.vae_params, ref_b)
            lat_in = jnp.concatenate([lat_masked, lat_ref], axis=-1)  # (B, 32, 32, 8)
            audio_feat = self._pe(jnp.asarray(np.stack(feats), jnp.float32))
            pred = self._unet_step(self.unet_params, lat_in, audio_feat.astype(self.dtype))
            imgs = postprocess_image(np.asarray(self._decode(self.vae_params, pred)))
            if self.parser is not None:
                # parse the expanded square crops of the whole group in one
                # batched dispatch, then jaw-region paste-back
                larges = [_crop_padded(frames[i], _crop_box(boxes[i], 1.2)[0])
                          for i in group]
                masks = self.parser(larges)
                for j, i in enumerate(group):
                    out_frames.append(blend_face_parsed(
                        frames[i], imgs[j], boxes[i], masks[j]))
            else:
                for j, i in enumerate(group):
                    out_frames.append(blend_face(frames[i], imgs[j], boxes[i]))
        return out_frames
