"""OpenCLIP ViT-H/14 text tower (frozen prompt encoder), NHWC-free (B,S,D).

Behavioral parity targets:
- FrozenOpenCLIPEmbedder: /root/reference/diffbir/model/clip.py:8-61
  (penultimate-layer features: run layers-1 blocks, then ln_final).
- Text transformer: /root/reference/diffbir/model/open_clip/transformer.py
  (pre-LN blocks, packed-qkv MultiheadAttention, exact GELU MLP, causal mask).

Param layout mirrors the torch checkpoint keys of the SD2.1
``cond_stage_model`` subtree: ``model.transformer.resblocks.{i}.attn.in_proj_weight``
→ ``transformer/resblocks_{i}/attn/in_proj_weight`` (the leading ``model.`` is
stripped by the converter).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import attention
from .layers import Dtype, LayerNormFp32, dense


class _MHA(nn.Module):
    """Packed-qkv multi-head self-attention (torch nn.MultiheadAttention layout)."""

    width: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, causal_mask: jax.Array) -> jax.Array:
        d = self.width
        w = self.param("in_proj_weight", nn.initializers.lecun_normal(), (d, 3 * d), jnp.float32)
        b = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,), jnp.float32)
        qkv = x @ w.astype(x.dtype) + b.astype(x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        bsz, s, _ = q.shape
        dh = d // self.heads
        q = q.reshape(bsz, s, self.heads, dh)
        k = k.reshape(bsz, s, self.heads, dh)
        v = v.reshape(bsz, s, self.heads, dh)
        out = attention(q, k, v, mask=causal_mask).reshape(bsz, s, d)
        return dense(d, dtype=self.dtype, name="out_proj")(out)


class _ResBlock(nn.Module):
    width: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, causal_mask: jax.Array) -> jax.Array:
        x = x + _MHA(self.width, self.heads, dtype=self.dtype, name="attn")(
            LayerNormFp32(name="ln_1")(x), causal_mask
        )
        h = LayerNormFp32(name="ln_2")(x)
        h = dense(self.width * 4, dtype=self.dtype, name="mlp.c_fc")(h)
        h = nn.gelu(h, approximate=False)
        h = dense(self.width, dtype=self.dtype, name="mlp.c_proj")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    """Returns per-token features for cross-attention conditioning.

    ``layer='penultimate'`` (DiffBIR default) runs ``layers - 1`` blocks then
    applies ``ln_final``; ``'last'`` runs all blocks.
    """

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 1024
    heads: int = 16
    layers: int = 24
    layer: str = "penultimate"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        assert tokens.shape[-1] == self.context_length
        tok_emb = nn.Embed(
            self.vocab_size, self.width, param_dtype=jnp.float32,
            dtype=self.dtype, name="token_embedding",
        )(tokens)
        pos = self.param(
            "positional_embedding", nn.initializers.zeros,
            (self.context_length, self.width), jnp.float32,
        )
        x = tok_emb + pos.astype(tok_emb.dtype)
        s = self.context_length
        causal = jnp.tril(jnp.ones((s, s), dtype=bool))[None, None]
        n_run = self.layers - (1 if self.layer == "penultimate" else 0)
        for i in range(n_run):
            x = _ResBlock(
                self.width, self.heads, dtype=self.dtype,
                name=f"transformer.resblocks.{i}",
            )(x, causal)
        return LayerNormFp32(name="ln_final")(x)
