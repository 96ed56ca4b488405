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


def gn_fold_moments(
    s1: jax.Array, v_c: jax.Array, scale: jax.Array, bias: jax.Array,
    num_groups: int, eps: float,
) -> tuple[jax.Array, jax.Array]:
    """Per-channel fp32 moments -> per-channel GN affine (a, b): y = x*a + b.

    ``s1``/``v_c`` are per-channel mean / two-pass variance of shape [.., C].
    Folds them to per-group via the parallel-variance identity
    ``var_g = mean_c(var_c + (mu_c - mu_g)^2)`` on tiny [.., C] stats
    (shared by GroupNorm32 and the Pallas fused-ResBlock kernel)."""
    c = s1.shape[-1]
    g = num_groups
    cg = c // g
    m_g = jnp.mean(s1.reshape(s1.shape[:-1] + (g, cg)), axis=-1)
    dm = s1.reshape(s1.shape[:-1] + (g, cg)) - m_g[..., None]
    var_g = jnp.mean(v_c.reshape(v_c.shape[:-1] + (g, cg)) + dm * dm, axis=-1)
    mean = jnp.repeat(m_g, cg, axis=-1)  # [.., C]
    inv = jnp.repeat(jax.lax.rsqrt(var_g + eps), cg, axis=-1)
    a = inv * scale
    b = bias - mean * a
    return a, b


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
        # Group statistics WITHOUT reshaping x to (.., g, c//g): that layout
        # has a c//g-wide minor dim (20 for SD channels), which TPU pads to
        # 128 lanes — every GN site materialized a ~6x-padded fp32 copy
        # (measured: the single largest latency bucket of the UNet step).
        # Instead reduce per-channel moments over the well-aligned layout,
        # fold them to per-group on the tiny [.., C] stats, and apply the
        # norm as one per-channel affine that XLA fuses into consumers.
        start = 0 if self.cross_batch else 1
        axes = tuple(range(start, xf.ndim - 1))
        s1 = jnp.mean(xf, axis=axes)  # [B?, C]
        # Two-pass per-channel variance (E[(x-mu_c)^2], not E[x^2]-E[x]^2 —
        # the one-pass form cancels catastrophically when mean^2 >> var).
        bshape = s1.shape[:1 if not self.cross_batch else 0] + (1,) * len(axes) + (c,)
        d = xf - s1.reshape(bshape)
        v_c = jnp.mean(d * d, axis=axes)  # [B?, C]
        a, b = gn_fold_moments(s1, v_c, scale, bias, g, self.eps)
        if not self.cross_batch:  # broadcast [B, C] over the spatial dims
            bshape = (x.shape[0],) + (1,) * (xf.ndim - 2) + (c,)
            a = a.reshape(bshape)
            b = b.reshape(bshape)
        # apply the affine in the input dtype: the stats are fp32-exact, and
        # a bf16 multiply here only re-rounds the (fp32-computed) scale/bias
        # — vs materializing a second fp32 copy of x (measured ~2 ms/step)
        return x * a.astype(orig_dtype) + b.astype(orig_dtype)


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


class QuantDense(nn.Module):
    """Weight-only int8 Dense for the inference serving mode.

    Param tree at this scope is ``{kernel_q: int8 [in, out], scale: f32
    [out]}`` (+ ``bias`` f32 [out]) — produced from a float checkpoint by
    ``models.cldm.quantize_dense_params`` (symmetric per-output-channel,
    exact scale-after-dot). Never trained. Compute goes through
    ``ops.quant_matmul`` (Pallas dequant-in-VMEM kernel on TPU for aligned
    shapes, XLA dequant-into-dot elsewhere). Halves the HBM weight traffic
    of the denoise step's dense sites vs bf16 — the step is HBM-bound
    (CLAUDE.md cost analysis), so weight bytes are latency."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops.quant_matmul import quant_matmul

        in_dim = x.shape[-1]
        kq = self.param(
            "kernel_q", nn.initializers.zeros_init(), (in_dim, self.features),
            jnp.int8,
        )
        scale = self.param(
            "scale", nn.initializers.ones_init(), (self.features,), jnp.float32
        )
        y = quant_matmul(x.astype(self.dtype), kq, scale)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


def nearest_upsample_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x spatial upsample, NHWC."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
