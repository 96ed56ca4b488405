"""ParseNet face-parsing network (19-class segmentation), NHWC flax.

Behavioral parity target: the facexlib ``parsenet`` model the reference uses
for the soft-mask paste-back in unaligned BFR
(/root/reference/diffbir/utils/face.py:117, :364-509). Architecture is the
public facexlib/GFPGAN ParseNet: reflection-pad convs with frozen BN +
LeakyReLU, a down/res/up residual hourglass at 512->32->512 with channels
clipped to [32, 256], and two output heads (parsing logits + image).

Inference-only (frozen BN); module names follow the facexlib torch keys
(``encoder.0.conv2d`` etc. — Sequential indices) so ``fill_flax_params``
converts the published checkpoint mechanically.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import nearest_upsample_2x
from .retinaface import FrozenBN


class ConvLayer(nn.Module):
    """facexlib ConvLayer: [2x nearest up] -> reflect pad -> conv(stride) ->
    [bn] -> [leaky relu 0.2]."""

    features: int
    kernel: int = 3
    scale: str = "none"  # none | down | up
    norm: bool = False
    relu: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.scale == "up":
            x = nearest_upsample_2x(x)
        pad = self.kernel // 2
        if pad:
            x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
        stride = 2 if self.scale == "down" else 1
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), strides=(stride, stride),
            padding="VALID", use_bias=not self.norm, param_dtype=jnp.float32,
            name="conv2d",
        )(x)
        if self.norm:
            x = FrozenBN(self.features, name="norm.norm")(x)
        if self.relu:
            x = nn.leaky_relu(x, 0.2)
        return x


class ResidualBlock(nn.Module):
    """conv1(scale phase A) -> conv2(scale phase B) + shortcut."""

    c_in: int
    c_out: int
    scale: str = "none"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale_conf = {"none": ("none", "none"), "down": ("none", "down"),
                      "up": ("up", "none")}[self.scale]
        if self.c_in == self.c_out and self.scale == "none":
            identity = x
        else:
            identity = ConvLayer(
                self.c_out, 3, scale=self.scale, name="shortcut_func"
            )(x)
        h = ConvLayer(self.c_out, 3, scale=scale_conf[0], norm=True, relu=True,
                      name="conv1")(x)
        h = ConvLayer(self.c_out, 3, scale=scale_conf[1], norm=True, relu=False,
                      name="conv2")(h)
        return identity + h


class ParseNet(nn.Module):
    in_size: int = 512
    out_size: int = 512
    min_feat_size: int = 32
    base_ch: int = 64
    parsing_ch: int = 19
    res_depth: int = 10
    ch_range: Tuple[int, int] = (32, 256)

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """x: NHWC in [-1,1] at in_size. Returns (parsing logits [N,H,W,19],
        out_img [N,H,W,3])."""
        lo, hi = self.ch_range
        clip = lambda c: max(lo, min(c, hi))  # noqa: E731
        min_feat = min(self.in_size, self.min_feat_size)
        down_steps = int(math.log2(self.in_size // min_feat))
        up_steps = int(math.log2(self.out_size // min_feat))

        # encoder (Sequential indices 0..down_steps). The first facexlib
        # layer is ConvLayer(3, base_ch, 3, 1): norm_type/relu_type default
        # to 'none', so it is a BARE biased conv (no BN, no LeakyReLU) —
        # the published checkpoint has encoder.0.conv2d.bias and no norm keys.
        h = ConvLayer(self.base_ch, 3, name="encoder.0")(x)
        head_ch = self.base_ch
        for i in range(down_steps):
            c_in, c_out = clip(head_ch), clip(head_ch * 2)
            h = ResidualBlock(c_in, c_out, scale="down", name=f"encoder.{i + 1}")(h)
            head_ch *= 2
        feat = h
        # body
        for i in range(self.res_depth):
            h = ResidualBlock(clip(head_ch), clip(head_ch), name=f"body.{i}")(h)
        h = h + feat
        # decoder
        for i in range(up_steps):
            c_in, c_out = clip(head_ch), clip(head_ch // 2)
            h = ResidualBlock(c_in, c_out, scale="up", name=f"decoder.{i}")(h)
            head_ch //= 2
        out_img = ConvLayer(3, 3, name="out_img_conv")(h)
        out_mask = ConvLayer(self.parsing_ch, 3, name="out_mask_conv")(h)
        return out_mask, out_img


class FaceParser:
    """Host wrapper matching the reference's parse-net call pattern
    (face.py:476-509): 512x512 RGB [0,1] normalized to [-1,1] -> argmax map."""

    def __init__(self, params, model: ParseNet = None):
        self.model = model if model is not None else ParseNet()
        self.params = params
        self._fwd = jax.jit(lambda p, x: self.model.apply(p, x)[0])

    def parse(self, face_rgb01) -> jnp.ndarray:
        """face_rgb01: [H, W, 3] float in [0,1] (any H=W=512). Returns
        [H, W] int32 class map."""
        import numpy as np

        x = jnp.asarray(face_rgb01, jnp.float32)[None] * 2.0 - 1.0
        logits = self._fwd(self.params, x)
        return np.asarray(jnp.argmax(logits[0], axis=-1), dtype=np.int32)
