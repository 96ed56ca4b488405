"""RetinaFace (resnet50 backbone) face detector, NHWC flax.

Behavioral parity target: the facexlib ``retinaface_resnet50`` detector the
reference uses for unaligned BFR (/root/reference/diffbir/utils/face.py:7,
:113-117, via ``init_detection_model``). The architecture is the public
biubug6/Pytorch_Retinaface network: torchvision ResNet-50 C3/C4/C5 features
-> 3-level FPN (256ch) -> SSH context modules -> 1x1 class/bbox/landmark
heads with 2 anchors per location.

TPU-first notes:
- inference-only: BatchNorm is a frozen affine (params scale/bias/
  running_mean/running_var — torch key names, so ``fill_flax_params``
  converts facexlib checkpoints mechanically);
- the network is one jittable NHWC forward; anchor generation, box/landmark
  decoding, and NMS are host-side numpy (tiny, data-dependent control flow).

Module names equal the facexlib/torch key fragments (``body.layer2.0.conv1``
etc.) so a flax path joined with '.' is the torch key.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


# --------------------------------------------------------------------------- #
# building blocks
# --------------------------------------------------------------------------- #
class FrozenBN(nn.Module):
    """Inference-mode BatchNorm2d: y = (x - mean) / sqrt(var+eps) * w + b."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("running_var", nn.initializers.ones, (self.features,), jnp.float32)
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return x * inv + (bias - mean * inv)


def _conv(features, kernel, stride=1, padding=None, use_bias=True, name=None):
    if padding is None:
        padding = kernel // 2
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        use_bias=use_bias, param_dtype=jnp.float32, name=name,
    )


class ConvBN(nn.Module):
    """torch conv_bn / conv_bn1X1 / conv_bn_no_relu: Sequential(conv, bn[, lrelu]).

    Children named "0" (conv, no bias) and "1" (bn) to match Sequential keys.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    leaky: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = _conv(self.features, self.kernel, self.stride, use_bias=False, name="0")(x)
        x = FrozenBN(self.features, name="1")(x)
        if self.relu:
            x = nn.leaky_relu(x, self.leaky) if self.leaky > 0 else nn.relu(x)
        return x


class Bottleneck(nn.Module):
    """torchvision resnet Bottleneck (1x1 -> 3x3(stride) -> 1x1*4)."""

    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out_ch = self.planes * 4
        identity = x
        h = _conv(self.planes, 1, padding=0, use_bias=False, name="conv1")(x)
        h = nn.relu(FrozenBN(self.planes, name="bn1")(h))
        h = _conv(self.planes, 3, self.stride, use_bias=False, name="conv2")(h)
        h = nn.relu(FrozenBN(self.planes, name="bn2")(h))
        h = _conv(out_ch, 1, padding=0, use_bias=False, name="conv3")(h)
        h = FrozenBN(out_ch, name="bn3")(h)
        if self.downsample:
            identity = _conv(out_ch, 1, self.stride, padding=0, use_bias=False,
                             name="downsample.0")(x)
            identity = FrozenBN(out_ch, name="downsample.1")(identity)
        return nn.relu(h + identity)


class ResNet50Body(nn.Module):
    """torchvision resnet50 through layer4; returns (C3, C4, C5) NHWC."""

    @nn.compact
    def __call__(self, x: jax.Array):
        h = _conv(64, 7, 2, padding=3, use_bias=False, name="conv1")(x)
        h = nn.relu(FrozenBN(64, name="bn1")(h))
        # maxpool 3x3 stride 2 pad 1
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        feats = []
        for li, (planes, blocks, stride) in enumerate(
            [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)], start=1
        ):
            for bi in range(blocks):
                h = Bottleneck(
                    planes,
                    stride=stride if bi == 0 else 1,
                    downsample=(bi == 0),
                    name=f"layer{li}.{bi}",
                )(h)
            if li >= 2:
                feats.append(h)
        return tuple(feats)  # C3 (512), C4 (1024), C5 (2048)


class SSH(nn.Module):
    """Context module: 3x3 + 5x5(2x3x3) + 7x7(3x3x3) branches, concat, relu."""

    out: int = 256

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c3 = ConvBN(self.out // 2, 3, relu=False, name="conv3X3")(x)
        c5_1 = ConvBN(self.out // 4, 3, name="conv5X5_1")(x)
        c5 = ConvBN(self.out // 4, 3, relu=False, name="conv5X5_2")(c5_1)
        c7_2 = ConvBN(self.out // 4, 3, name="conv7X7_2")(c5_1)
        c7 = ConvBN(self.out // 4, 3, relu=False, name="conv7x7_3")(c7_2)
        return nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


class FPN(nn.Module):
    out: int = 256

    @nn.compact
    def __call__(self, feats):
        c3, c4, c5 = feats
        o1 = ConvBN(self.out, 1, name="output1")(c3)
        o2 = ConvBN(self.out, 1, name="output2")(c4)
        o3 = ConvBN(self.out, 1, name="output3")(c5)
        up3 = jax.image.resize(o3, (o3.shape[0], o2.shape[1], o2.shape[2], o3.shape[3]), "nearest")
        o2 = ConvBN(self.out, 3, name="merge2")(o2 + up3)
        up2 = jax.image.resize(o2, (o2.shape[0], o1.shape[1], o1.shape[2], o2.shape[3]), "nearest")
        o1 = ConvBN(self.out, 3, name="merge1")(o1 + up2)
        return o1, o2, o3


class _Head(nn.Module):
    """1x1 conv head; output reshaped to [B, n_anchors_total, per]."""

    per: int
    anchors: int = 2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = _conv(self.anchors * self.per, 1, padding=0, name="conv1x1")(x)
        b = h.shape[0]
        return h.reshape(b, -1, self.per)


class RetinaFace(nn.Module):
    """Full detector forward: BGR-mean-subtracted NHWC -> (loc, conf, landms).

    conf is raw logits [B, A, 2] (softmax on host), loc [B, A, 4],
    landms [B, A, 10].
    """

    out_channels: int = 256

    @nn.compact
    def __call__(self, x: jax.Array):
        feats = ResNet50Body(name="body")(x)
        f1, f2, f3 = FPN(self.out_channels, name="fpn")(feats)
        features = [
            SSH(self.out_channels, name="ssh1")(f1),
            SSH(self.out_channels, name="ssh2")(f2),
            SSH(self.out_channels, name="ssh3")(f3),
        ]
        loc = jnp.concatenate(
            [_Head(4, name=f"BboxHead.{i}")(f) for i, f in enumerate(features)], axis=1
        )
        conf = jnp.concatenate(
            [_Head(2, name=f"ClassHead.{i}")(f) for i, f in enumerate(features)], axis=1
        )
        landms = jnp.concatenate(
            [_Head(10, name=f"LandmarkHead.{i}")(f) for i, f in enumerate(features)], axis=1
        )
        return loc, conf, landms


# --------------------------------------------------------------------------- #
# host-side anchors / decode / NMS (tiny, data-dependent)
# --------------------------------------------------------------------------- #
MIN_SIZES = [[16, 32], [64, 128], [256, 512]]
STEPS = [8, 16, 32]
VARIANCE = (0.1, 0.2)


def prior_boxes(h: int, w: int) -> np.ndarray:
    """Anchor centers/sizes normalized to [0,1]; order matches the heads'
    (level, row, col, anchor) flattening."""
    anchors = []
    for k, step in enumerate(STEPS):
        fh = int(np.ceil(h / step))
        fw = int(np.ceil(w / step))
        for i in range(fh):
            for j in range(fw):
                for ms in MIN_SIZES[k]:
                    cx = (j + 0.5) * step / w
                    cy = (i + 0.5) * step / h
                    anchors.append([cx, cy, ms / w, ms / h])
    return np.asarray(anchors, np.float32)


def decode_boxes(loc: np.ndarray, priors: np.ndarray) -> np.ndarray:
    boxes = np.concatenate(
        [
            priors[:, :2] + loc[:, :2] * VARIANCE[0] * priors[:, 2:],
            priors[:, 2:] * np.exp(loc[:, 2:] * VARIANCE[1]),
        ],
        axis=1,
    )
    boxes[:, :2] -= boxes[:, 2:] / 2
    boxes[:, 2:] += boxes[:, :2]
    return boxes


def decode_landms(pre: np.ndarray, priors: np.ndarray) -> np.ndarray:
    out = [
        priors[:, :2] + pre[:, 2 * i: 2 * i + 2] * VARIANCE[0] * priors[:, 2:]
        for i in range(5)
    ]
    return np.concatenate(out, axis=1)


def nms(dets: np.ndarray, thresh: float) -> List[int]:
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(0.0, xx2 - xx1 + 1) * np.maximum(0.0, yy2 - yy1 + 1)
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][ovr <= thresh]
    return keep


class RetinaFaceDetector:
    """Host wrapper: jitted forward + numpy decode/NMS.

    ``detect_faces(img_bgr, conf_threshold)`` returns [N, 15]:
    x1,y1,x2,y2,score, then 5 (x,y) landmarks — the facexlib output layout
    consumed by FaceRestoreHelper (reference face.py:188-309).
    """

    RGB_MEAN_BGR = np.array([104.0, 117.0, 123.0], np.float32)

    def __init__(self, params, nms_threshold: float = 0.4):
        self.model = RetinaFace()
        self.params = params
        self.nms_threshold = nms_threshold
        self._fwd = jax.jit(lambda p, x: self.model.apply(p, x))

    def detect_faces(self, img_bgr: np.ndarray, conf_threshold: float = 0.8) -> np.ndarray:
        h, w = img_bgr.shape[:2]
        # pad to step-32 multiples so anchor grids match conv output shapes
        ph, pw = (-h) % 32, (-w) % 32
        img = np.pad(img_bgr.astype(np.float32), ((0, ph), (0, pw), (0, 0)))
        img -= self.RGB_MEAN_BGR
        loc, conf, landms = self._fwd(self.params, jnp.asarray(img[None]))
        loc = np.asarray(loc[0])
        scores = np.asarray(jax.nn.softmax(conf[0], axis=-1))[:, 1]
        landms = np.asarray(landms[0])
        priors = prior_boxes(h + ph, w + pw)
        scale = np.array([w + pw, h + ph], np.float32)
        boxes = decode_boxes(loc, priors) * np.tile(scale, 2)
        lms = decode_landms(landms, priors) * np.tile(scale, 5)
        keep = scores > conf_threshold
        boxes, lms, scores = boxes[keep], lms[keep], scores[keep]
        if len(scores) == 0:
            return np.zeros((0, 15), np.float32)
        order = scores.argsort()[::-1][:5000]
        boxes, lms, scores = boxes[order], lms[order], scores[order]
        dets = np.concatenate([boxes, scores[:, None]], axis=1).astype(np.float32)
        keep_idx = nms(dets, self.nms_threshold)
        dets, lms = dets[keep_idx], lms[keep_idx]
        return np.concatenate([dets, lms], axis=1)
