"""BERT-style tagging head (RAM++'s query2label alignment decoder), flax.

Behavioral parity target: /root/reference/ram/models/bert.py BertLayer in
'tagging' mode (self-attention deleted, ram_plus.py:196-199): each layer is
cross-attention (label queries -> image embeds) + BertOutput residual LN,
then intermediate GELU MLP + output residual LN. q2l_config: hidden 768,
heads 4, 2 layers, eps 1e-12 (configs/q2l_config.json).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.layers import Dtype, LayerNormFp32, dense
from ..ops.attention import xla_attention


class _CrossAttention(nn.Module):
    hidden: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, enc: jax.Array) -> jax.Array:
        dh = self.hidden // self.heads
        q = dense(self.hidden, dtype=self.dtype, name="self.query")(x)
        k = dense(self.hidden, dtype=self.dtype, name="self.key")(enc)
        v = dense(self.hidden, dtype=self.dtype, name="self.value")(enc)
        b, sq, _ = q.shape
        skv = k.shape[1]
        out = xla_attention(
            q.reshape(b, sq, self.heads, dh),
            k.reshape(b, skv, self.heads, dh),
            v.reshape(b, skv, self.heads, dh),
        ).reshape(b, sq, self.hidden)
        out = dense(self.hidden, dtype=self.dtype, name="output.dense")(out)
        return LayerNormFp32(eps=1e-12, name="output.LayerNorm")(out + x)


class TaggingLayer(nn.Module):
    hidden: int
    heads: int
    intermediate: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, enc: jax.Array) -> jax.Array:
        x = _CrossAttention(self.hidden, self.heads, dtype=self.dtype, name="crossattention")(x, enc)
        h = dense(self.intermediate, dtype=self.dtype, name="intermediate.dense")(x)
        h = nn.gelu(h, approximate=False)
        h = dense(self.hidden, dtype=self.dtype, name="output.dense")(h)
        return LayerNormFp32(eps=1e-12, name="output.LayerNorm")(h + x)


class TaggingHead(nn.Module):
    """tagging_head.encoder.layer.{i} — BertEncoder in 'tagging' mode."""

    hidden: int = 768
    heads: int = 4
    layers: int = 2
    intermediate: int = 3072
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, queries: jax.Array, enc: jax.Array) -> jax.Array:
        x = queries
        for i in range(self.layers):
            x = TaggingLayer(
                self.hidden, self.heads, self.intermediate, dtype=self.dtype,
                name=f"encoder.layer.{i}",
            )(x, enc)
        return x
