"""Classification Swin Transformer (RAM++'s swin-L image encoder), NHWC flax.

Behavioral parity target: /root/reference/ram/models/swin_transformer.py
(patch-embed conv k4s4 + LN, 4 stages with PatchMerging downsampling, final
LN + avgpool 'cls' token prepended to the patch tokens, :562-576).
Reuses the SwinIR window-attention blocks (same torch key fragments).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.layers import Dtype, LayerNormFp32, dense
from ..models.swinir import SwinBlock


class PatchMerging(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, hw) -> jax.Array:
        h, w = hw
        b, l, c = x.shape
        img = x.reshape(b, h, w, c)
        x0 = img[:, 0::2, 0::2, :]
        x1 = img[:, 1::2, 0::2, :]
        x2 = img[:, 0::2, 1::2, :]
        x3 = img[:, 1::2, 1::2, :]
        merged = jnp.concatenate([x0, x1, x2, x3], axis=-1).reshape(b, l // 4, 4 * c)
        merged = LayerNormFp32(name="norm")(merged)
        return dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction")(merged)


class SwinClassifier(nn.Module):
    """Returns [B, 1 + L, C]: avgpool token + final patch tokens."""

    img_size: int = 384
    patch_size: int = 4
    embed_dim: int = 192
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (6, 12, 24, 48)
    window_size: int = 12
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b = x.shape[0]
        # patch embed: conv k4s4 named proj + LN
        x = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            dtype=self.dtype, param_dtype=jnp.float32, name="patch_embed.proj",
        )(x.astype(self.dtype))
        h, w = x.shape[1:3]
        x = x.reshape(b, h * w, self.embed_dim)
        x = LayerNormFp32(name="patch_embed.norm")(x)

        dim = self.embed_dim
        for i, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            for j in range(depth):
                x = SwinBlock(
                    dim, heads, self.window_size,
                    shift=0 if j % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                    name=f"layers.{i}.blocks.{j}",
                )(x, (h, w))
            if i != len(self.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype, name=f"layers.{i}.downsample")(x, (h, w))
                h, w = h // 2, w // 2
                dim *= 2

        x = LayerNormFp32(name="norm")(x)  # [B, L, C]
        cls = jnp.mean(x, axis=1, keepdims=True)  # avgpool token
        return jnp.concatenate([cls, x], axis=1)
