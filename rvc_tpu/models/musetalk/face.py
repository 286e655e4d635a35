"""Face detection (S3FD) and face parsing (BiSeNet/ResNet18) in Flax.

Reference: lib/musetalk/utils/face_detection/ (S3FD detector + FAN API)
and lib/musetalk/utils/face_parsing/ (BiSeNet segmentation). Both are
pretrained inference networks; parameter names mirror the torch
state_dicts for direct import. NHWC activations, torch-layout weights.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..layers import BatchNorm, Conv2dTorch


# ---------------------------------------------------------------------------
# S3FD face detector (VGG16 + extras + multi-scale heads)
# ---------------------------------------------------------------------------


class L2Norm(nn.Module):
    channels: int
    scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", lambda k, s: jnp.full(s, self.scale, jnp.float32),
                       (self.channels,))
        norm = jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)) + 1e-10
        return (x / norm * w).astype(self.dtype)


def _max_pool_2x2(x):
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W // 2, 2, C).max(axis=(2, 4))


class S3FD(nn.Module):
    """S3FD (reference net_s3fd.py): returns (cls, reg) pairs at 6 scales."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) BGR, mean-subtracted. Returns list of 12 maps
        [cls1, reg1, cls2, reg2, ...] in NHWC."""
        conv = lambda ci, co, k, s, p, name: Conv2dTorch(  # noqa: E731
            ci, co, (k, k), (s, s), (p, p), dtype=self.dtype, name=name)
        relu = jax.nn.relu
        h = relu(conv(3, 64, 3, 1, 1, "conv1_1")(x))
        h = relu(conv(64, 64, 3, 1, 1, "conv1_2")(h))
        h = _max_pool_2x2(h)
        h = relu(conv(64, 128, 3, 1, 1, "conv2_1")(h))
        h = relu(conv(128, 128, 3, 1, 1, "conv2_2")(h))
        h = _max_pool_2x2(h)
        h = relu(conv(128, 256, 3, 1, 1, "conv3_1")(h))
        h = relu(conv(256, 256, 3, 1, 1, "conv3_2")(h))
        h = relu(conv(256, 256, 3, 1, 1, "conv3_3")(h))
        f3_3 = h
        h = _max_pool_2x2(h)
        h = relu(conv(256, 512, 3, 1, 1, "conv4_1")(h))
        h = relu(conv(512, 512, 3, 1, 1, "conv4_2")(h))
        h = relu(conv(512, 512, 3, 1, 1, "conv4_3")(h))
        f4_3 = h
        h = _max_pool_2x2(h)
        h = relu(conv(512, 512, 3, 1, 1, "conv5_1")(h))
        h = relu(conv(512, 512, 3, 1, 1, "conv5_2")(h))
        h = relu(conv(512, 512, 3, 1, 1, "conv5_3")(h))
        f5_3 = h
        h = _max_pool_2x2(h)
        h = relu(conv(512, 1024, 3, 1, 3, "fc6")(h))  # dilation handled below
        # fc6 actually uses kernel 3, padding 3, dilation... reference: Conv2d(512,1024,3,1,3)
        h = relu(conv(1024, 1024, 1, 1, 0, "fc7")(h))
        ffc7 = h
        h = relu(conv(1024, 256, 1, 1, 0, "conv6_1")(h))
        h = relu(conv(256, 512, 3, 2, 1, "conv6_2")(h))
        f6_2 = h
        h = relu(conv(512, 128, 1, 1, 0, "conv7_1")(h))
        h = relu(conv(128, 256, 3, 2, 1, "conv7_2")(h))
        f7_2 = h

        f3_3 = L2Norm(256, 10.0, dtype=self.dtype, name="conv3_3_norm")(f3_3)
        f4_3 = L2Norm(512, 8.0, dtype=self.dtype, name="conv4_3_norm")(f4_3)
        f5_3 = L2Norm(512, 5.0, dtype=self.dtype, name="conv5_3_norm")(f5_3)

        outs = [
            conv(256, 4, 3, 1, 1, "conv3_3_norm_mbox_conf")(f3_3),
            conv(256, 4, 3, 1, 1, "conv3_3_norm_mbox_loc")(f3_3),
            conv(512, 2, 3, 1, 1, "conv4_3_norm_mbox_conf")(f4_3),
            conv(512, 4, 3, 1, 1, "conv4_3_norm_mbox_loc")(f4_3),
            conv(512, 2, 3, 1, 1, "conv5_3_norm_mbox_conf")(f5_3),
            conv(512, 4, 3, 1, 1, "conv5_3_norm_mbox_loc")(f5_3),
            conv(1024, 2, 3, 1, 1, "fc7_mbox_conf")(ffc7),
            conv(1024, 4, 3, 1, 1, "fc7_mbox_loc")(ffc7),
            conv(512, 2, 3, 1, 1, "conv6_2_mbox_conf")(f6_2),
            conv(512, 4, 3, 1, 1, "conv6_2_mbox_loc")(f6_2),
            conv(256, 2, 3, 1, 1, "conv7_2_mbox_conf")(f7_2),
            conv(256, 4, 3, 1, 1, "conv7_2_mbox_loc")(f7_2),
        ]
        # first scale: max-out background label (reference net_s3fd.py forward)
        chunk = outs[0]
        bmax = jnp.maximum(jnp.maximum(chunk[..., :1], chunk[..., 1:2]), chunk[..., 2:3])
        outs[0] = jnp.concatenate([bmax, chunk[..., 3:]], axis=-1)
        return outs


def decode_s3fd(outs: list[np.ndarray], scale_threshold: float = 0.05) -> np.ndarray:
    """Anchor decode (reference sfd_detector/detect.py semantics): returns
    (N, 5) [score, x1, y1, x2, y2] candidates; apply NMS downstream."""
    boxes = []
    for i in range(len(outs) // 2):
        ocls = np.asarray(outs[i * 2])[0]
        oreg = np.asarray(outs[i * 2 + 1])[0]
        stride = 2 ** (i + 2)  # 4, 8, 16, 32, 64, 128
        # softmax over 2 classes
        e = np.exp(ocls - ocls.max(-1, keepdims=True))
        p = e / e.sum(-1, keepdims=True)
        score = p[..., 1]
        ys, xs = np.where(score > scale_threshold)
        for y, x in zip(ys, xs):
            s = score[y, x]
            axc, ayc = stride / 2 + x * stride, stride / 2 + y * stride
            aww = ahh = stride * 4
            loc = oreg[y, x]
            # SSD-style variance decode
            cx = axc + loc[0] * 0.1 * aww
            cy = ayc + loc[1] * 0.1 * ahh
            w = aww * np.exp(loc[2] * 0.2)
            hgt = ahh * np.exp(loc[3] * 0.2)
            boxes.append([s, cx - w / 2, cy - hgt / 2, cx + w / 2, cy + hgt / 2])
    if not boxes:
        return np.zeros((0, 5), np.float32)
    return np.asarray(boxes, np.float32)


def nms(dets: np.ndarray, thresh: float = 0.3) -> np.ndarray:
    """Standard IoU NMS over (N, 5) [score, x1, y1, x2, y2]."""
    if len(dets) == 0:
        return dets
    scores, x1, y1, x2, y2 = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        iou = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][iou <= thresh]
    return dets[keep]


# ---------------------------------------------------------------------------
# BiSeNet face parsing (ResNet18 backbone)
# ---------------------------------------------------------------------------


class ConvBNReLU(nn.Module):
    ci: int
    co: int
    k: int = 3
    s: int = 1
    p: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Conv2dTorch(self.ci, self.co, (self.k, self.k), (self.s, self.s),
                        (self.p, self.p), use_bias=False, dtype=self.dtype,
                        name="conv")(x)
        h = BatchNorm(self.co, dtype=self.dtype, name="bn")(h)
        return jax.nn.relu(h)


class BasicBlockR18(nn.Module):
    ci: int
    co: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Conv2dTorch(self.ci, self.co, (3, 3), (self.stride, self.stride), (1, 1),
                        use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = BatchNorm(self.co, dtype=self.dtype, name="bn1")(h)
        h = jax.nn.relu(h)
        h = Conv2dTorch(self.co, self.co, (3, 3), padding=(1, 1), use_bias=False,
                        dtype=self.dtype, name="conv2")(h)
        h = BatchNorm(self.co, dtype=self.dtype, name="bn2")(h)
        if self.stride != 1 or self.ci != self.co:
            x = Conv2dTorch(self.ci, self.co, (1, 1), (self.stride, self.stride),
                            use_bias=False, dtype=self.dtype, name="downsample_0")(x)
            x = BatchNorm(self.co, dtype=self.dtype, name="downsample_1")(x)
        return jax.nn.relu(x + h)


class Resnet18(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Conv2dTorch(3, 64, (7, 7), (2, 2), (3, 3), use_bias=False,
                        dtype=self.dtype, name="conv1")(x)
        h = BatchNorm(64, dtype=self.dtype, name="bn1")(h)
        h = jax.nn.relu(h)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        B, H, W, C = h.shape
        h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                  (1, 2, 2, 1), "VALID")
        feats = {}
        cin = 64
        for li, (co, s) in enumerate([(64, 1), (128, 2), (256, 2), (512, 2)], start=1):
            h = BasicBlockR18(cin, co, s, dtype=self.dtype, name=f"layer{li}_0")(h)
            h = BasicBlockR18(co, co, 1, dtype=self.dtype, name=f"layer{li}_1")(h)
            cin = co
            feats[f"feat{li}"] = h
        return feats["feat2"], feats["feat3"], feats["feat4"]  # 1/8, 1/16, 1/32


class AttentionRefinement(nn.Module):
    ci: int
    co: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = ConvBNReLU(self.ci, self.co, 3, 1, 1, dtype=self.dtype, name="conv")(x)
        atten = feat.mean(axis=(1, 2), keepdims=True)
        atten = Conv2dTorch(self.co, self.co, (1, 1), use_bias=False,
                            dtype=self.dtype, name="conv_atten")(atten)
        atten = BatchNorm(self.co, dtype=self.dtype, name="bn_atten")(atten)
        return feat * jax.nn.sigmoid(atten)


class FeatureFusion(nn.Module):
    ci: int
    co: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sp, cp):
        fcat = jnp.concatenate([sp, cp], axis=-1)
        feat = ConvBNReLU(self.ci, self.co, 1, 1, 0, dtype=self.dtype, name="convblk")(fcat)
        atten = feat.mean(axis=(1, 2), keepdims=True)
        atten = Conv2dTorch(self.co, self.co // 4, (1, 1), use_bias=False,
                            dtype=self.dtype, name="conv1")(atten)
        atten = jax.nn.relu(atten)
        atten = Conv2dTorch(self.co // 4, self.co, (1, 1), use_bias=False,
                            dtype=self.dtype, name="conv2")(atten)
        atten = jax.nn.sigmoid(atten)
        return feat + feat * atten


class BiSeNetOutput(nn.Module):
    ci: int
    mid: int
    n_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ConvBNReLU(self.ci, self.mid, 3, 1, 1, dtype=self.dtype, name="conv")(x)
        return Conv2dTorch(self.mid, self.n_classes, (1, 1), use_bias=False,
                           dtype=self.dtype, name="conv_out")(h)


class BiSeNet(nn.Module):
    """Face parser (reference face_parsing/model.py): 19 classes at input res."""

    n_classes: int = 19
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        feat8, feat16, feat32 = Resnet18(dtype=self.dtype, name="cp_resnet")(x)
        avg = feat32.mean(axis=(1, 2), keepdims=True)
        avg = ConvBNReLU(512, 128, 1, 1, 0, dtype=self.dtype, name="cp_conv_avg")(avg)
        avg_up = jnp.broadcast_to(avg, (B, feat32.shape[1], feat32.shape[2], 128))
        f32 = AttentionRefinement(512, 128, dtype=self.dtype, name="cp_arm32")(feat32)
        f32 = f32 + avg_up
        f32 = jax.image.resize(f32, (B, feat16.shape[1], feat16.shape[2], 128), "nearest")
        f32 = ConvBNReLU(128, 128, 3, 1, 1, dtype=self.dtype, name="cp_conv_head32")(f32)
        f16 = AttentionRefinement(256, 128, dtype=self.dtype, name="cp_arm16")(feat16)
        f16 = f16 + f32
        f16 = jax.image.resize(f16, (B, feat8.shape[1], feat8.shape[2], 128), "nearest")
        f16 = ConvBNReLU(128, 128, 3, 1, 1, dtype=self.dtype, name="cp_conv_head16")(f16)
        fused = FeatureFusion(128 + 128, 256, dtype=self.dtype, name="ffm")(feat8, f16)
        out = BiSeNetOutput(256, 256, self.n_classes, dtype=self.dtype, name="conv_out")(fused)
        return jax.image.resize(out, (B, H, W, self.n_classes), "bilinear")


_BISENET_RENAMES = [
    (r"^cp\.resnet\.", r"cp_resnet."),
    (r"^cp\.conv_avg\.", r"cp_conv_avg."),
    (r"^cp\.arm16\.", r"cp_arm16."),
    (r"^cp\.arm32\.", r"cp_arm32."),
    (r"^cp\.conv_head16\.", r"cp_conv_head16."),
    (r"^cp\.conv_head32\.", r"cp_conv_head32."),
    (r"layer(\d)\.(\d)\.", r"layer\1_\2."),
    (r"\.downsample\.(\d)\.", r".downsample_\1."),
]


def bisenet_params_from_state_dict(state_dict) -> dict:
    from ...compat.torch_import import build_tree

    return {"params": build_tree(state_dict, renames=_BISENET_RENAMES,
                                 skip=(r"num_batches_tracked", r"^conv_out16", r"^conv_out32"))}


def s3fd_params_from_state_dict(state_dict) -> dict:
    from ...compat.torch_import import build_tree

    return {"params": build_tree(state_dict, skip=(r"num_batches_tracked",))}
