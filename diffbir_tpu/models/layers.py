"""Shared NN layers (NHWC, mixed precision) for all diffbir_tpu models.

Precision policy (mirrors the reference's autocast semantics,
/root/reference/diffbir/model/cldm.py:174-210 + util.py:191-193):
- parameters stored fp32 (``param_dtype``), compute in ``dtype`` (bf16 on TPU)
- GroupNorm / LayerNorm statistics in fp32, output cast back to compute dtype
- softmax/QK products fp32 (see ops/attention.py)

Naming: modules are given explicit ``name=`` values equal to the torch
checkpoint key fragments (``input_blocks.1.0`` etc.), so a flax param path
joined with '.' IS the torch key prefix. See weights/convert.py.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal timestep embedding, [cos, sin] order (ADM/SD convention).

    Parity: /root/reference/diffbir/model/util.py:128-148.
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class GroupNorm32(nn.Module):
    """GroupNorm computed in fp32 regardless of input dtype.

    Parity: GroupNorm32 (/root/reference/diffbir/model/util.py:191-193);
    eps=1e-5 for UNet ``normalization()``, 1e-6 for VAE/SpatialTransformer
    ``Normalize`` variants.
    """

    num_groups: int = 32
    eps: float = 1e-5
    # cross_batch=True also reduces over axis 0: used by the seam-free tiled
    # VAE where non-overlapping tiles of ONE image ride the batch axis and
    # GroupNorm statistics must be global (SURVEY.md §5.7, tilevae GN sync).
    cross_batch: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        g = self.num_groups
        assert c % g == 0, f"channels {c} not divisible by groups {g}"
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        shape = xf.shape
        xg = xf.reshape(shape[:-1] + (g, c // g))
        start = 0 if self.cross_batch else 1
        axes = tuple(range(start, xf.ndim - 1)) + (xf.ndim,)
        mean = jnp.mean(xg, axis=axes, keepdims=True)
        var = jnp.var(xg, axis=axes, keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.eps)
        out = xg.reshape(shape) * scale + bias
        return out.astype(orig_dtype)


class LayerNormFp32(nn.Module):
    """LayerNorm with fp32 statistics, output in input dtype."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return out.astype(orig_dtype)


def conv(
    features: int,
    kernel: int = 3,
    stride: int = 1,
    padding: Optional[int] = None,
    zero_init: bool = False,
    use_bias: bool = True,
    dtype: Dtype = jnp.float32,
    name: Optional[str] = None,
) -> nn.Conv:
    """NHWC conv with torch-compatible explicit padding."""
    if padding is None:
        padding = kernel // 2
    init = nn.initializers.zeros_init() if zero_init else nn.initializers.lecun_normal()
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        kernel_init=init,
        bias_init=nn.initializers.zeros,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def dense(
    features: int,
    use_bias: bool = True,
    zero_init: bool = False,
    dtype: Dtype = jnp.float32,
    name: Optional[str] = None,
) -> nn.Dense:
    init = nn.initializers.zeros_init() if zero_init else nn.initializers.lecun_normal()
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=init,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def nearest_upsample_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x spatial upsample, NHWC."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
