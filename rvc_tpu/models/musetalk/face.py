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


# ---------------------------------------------------------------------------
# FAN facial landmarks (stacked hourglass, 68 heatmaps)
# ---------------------------------------------------------------------------
# Reference: lib/musetalk/utils/face_detection/models.py:13-202 (ConvBlock /
# HourGlass / FAN) + api.py. TPU-first notes: NHWC activations throughout,
# the hourglass recursion is unrolled at trace time (depth is static), and
# heatmap→coordinate decode is a vectorized soft-argmax-style jnp op rather
# than the reference's host-side loop over 68 points per image.


class FANConvBlock(nn.Module):
    """Pre-activation residual block with a 1/2 + 1/4 + 1/4 channel split
    (models.py:13-56). Param names mirror the torch module tree."""

    in_planes: int
    out_planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.out_planes
        conv3 = lambda ci, co, name: Conv2dTorch(  # noqa: E731
            ci, co, (3, 3), (1, 1), (1, 1), use_bias=False,
            dtype=self.dtype, name=name)
        o1 = conv3(self.in_planes, c // 2, "conv1")(
            jax.nn.relu(BatchNorm(self.in_planes, name="bn1")(x)))
        o2 = conv3(c // 2, c // 4, "conv2")(
            jax.nn.relu(BatchNorm(c // 2, name="bn2")(o1)))
        o3 = conv3(c // 4, c // 4, "conv3")(
            jax.nn.relu(BatchNorm(c // 4, name="bn3")(o2)))
        out = jnp.concatenate([o1, o2, o3], axis=-1)
        if self.in_planes != self.out_planes:
            # torch Sequential keys downsample.{0,2} → path rule downsample_{0,2}
            x = Conv2dTorch(self.in_planes, c, (1, 1), use_bias=False,
                            dtype=self.dtype, name="downsample_2")(
                jax.nn.relu(BatchNorm(self.in_planes, name="downsample_0")(x)))
        return out + x


def _avg_pool_2x2(x):
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))


def _upsample_2x_nearest(x):
    B, H, W, C = x.shape
    return jnp.broadcast_to(x[:, :, None, :, None, :],
                            (B, H, 2, W, 2, C)).reshape(B, 2 * H, 2 * W, C)


class HourGlassFAN(nn.Module):
    """Recursive hourglass (models.py:98-142), unrolled statically."""

    depth: int
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        blk = lambda name: FANConvBlock(  # noqa: E731
            self.features, self.features, dtype=self.dtype, name=name)

        def level(lv, inp):
            up1 = blk(f"b1_{lv}")(inp)
            low1 = blk(f"b2_{lv}")(_avg_pool_2x2(inp))
            if lv > 1:
                low2 = level(lv - 1, low1)
            else:
                low2 = blk(f"b2_plus_{lv}")(low1)
            low3 = blk(f"b3_{lv}")(low2)
            return up1 + _upsample_2x_nearest(low3)

        return level(self.depth, x)


class FAN(nn.Module):
    """Face Alignment Network (models.py:145-202): base trunk + stacked
    hourglasses, each emitting 68 landmark heatmaps at 1/4 resolution."""

    num_modules: int = 4  # public 2DFAN4 checkpoints
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) RGB in [0, 1]. Returns (B, H/4, W/4, 68) — the
        last module's heatmaps (api.py uses out[-1])."""
        h = jax.nn.relu(BatchNorm(64, name="bn1")(
            Conv2dTorch(3, 64, (7, 7), (2, 2), (3, 3),
                        dtype=self.dtype, name="conv1")(x)))
        h = _avg_pool_2x2(FANConvBlock(64, 128, dtype=self.dtype, name="conv2")(h))
        h = FANConvBlock(128, 128, dtype=self.dtype, name="conv3")(h)
        h = FANConvBlock(128, 256, dtype=self.dtype, name="conv4")(h)

        previous = h
        out = None
        for i in range(self.num_modules):
            hg = HourGlassFAN(4, 256, dtype=self.dtype, name=f"m{i}")(previous)
            ll = FANConvBlock(256, 256, dtype=self.dtype, name=f"top_m_{i}")(hg)
            ll = jax.nn.relu(BatchNorm(256, name=f"bn_end{i}")(
                Conv2dTorch(256, 256, (1, 1), dtype=self.dtype,
                            name=f"conv_last{i}")(ll)))
            out = Conv2dTorch(256, 68, (1, 1), dtype=self.dtype, name=f"l{i}")(ll)
            if i < self.num_modules - 1:
                previous = previous \
                    + Conv2dTorch(256, 256, (1, 1), dtype=self.dtype,
                                  name=f"bl{i}")(ll) \
                    + Conv2dTorch(68, 256, (1, 1), dtype=self.dtype,
                                  name=f"al{i}")(out)
        return out


def heatmaps_to_landmarks(heatmaps: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 68) heatmaps → (B, 68, 2) xy in input-pixel coordinates.

    Matches the reference decode (face_alignment get_preds_fromhm, used by
    api.py): argmax per map, then a ±0.25-pixel shift along the local
    gradient sign — vectorized over all 68 maps instead of a Python loop.
    Output is scaled ×4 back to the (H·4, W·4) network input frame.
    """
    B, H, W, K = heatmaps.shape
    hm = jnp.transpose(heatmaps, (0, 3, 1, 2)).reshape(B, K, H * W)
    idx = jnp.argmax(hm, axis=-1)
    y = idx // W
    x = idx % W
    # local gradient sign at the peak (clamped neighborhood)
    xm, xp = jnp.clip(x - 1, 0, W - 1), jnp.clip(x + 1, 0, W - 1)
    ym, yp = jnp.clip(y - 1, 0, H - 1), jnp.clip(y + 1, 0, H - 1)
    take = lambda yy, xx: jnp.take_along_axis(  # noqa: E731
        hm, (yy * W + xx)[..., None], axis=-1)[..., 0]
    dx = jnp.sign(take(y, xp) - take(y, xm)) * 0.25
    dy = jnp.sign(take(yp, x) - take(ym, x)) * 0.25
    pts = jnp.stack([x + dx, y + dy], axis=-1)
    return (pts + 0.5) * 4.0


def fan_params_from_state_dict(state_dict) -> dict:
    """Import a torch 2DFAN checkpoint (keys conv1.*, m0.b1_4.*, l3.*, ...);
    names map 1:1 onto the Flax module tree above."""
    from ...compat.torch_import import build_tree

    return {"params": build_tree(state_dict, skip=(r"num_batches_tracked",))}
