"""AutoencoderKL (SD f8 KL-VAE), NHWC flax.

Behavioral parity target: /root/reference/diffbir/model/vae.py:24-591
(Encoder/Decoder with GN(32, eps=1e-6) ResnetBlocks, single-head mid
attention, asymmetric-pad downsample, double_z moments) and
/root/reference/diffbir/model/distributions.py:24-92.

Module names equal the torch key fragments (encoder.down.0.block.0.norm1 →
encoder/down.0/block.0/norm1) so checkpoint conversion is mechanical.
The mid-attention uses the shared attention op (fp32 softmax; Pallas flash
kernel on TPU when shapes qualify).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import attention
from .layers import Dtype, GroupNorm32, conv, nearest_upsample_2x

def Norm(name, cross=False):
    return GroupNorm32(num_groups=32, eps=1e-6, cross_batch=cross, name=name)


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32
    gn_cross: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = Norm("norm1", self.gn_cross)(x)
        h = nn.silu(h)
        h = conv(self.out_channels, 3, dtype=self.dtype, name="conv1")(h)
        h = Norm("norm2", self.gn_cross)(h)
        h = nn.silu(h)
        h = conv(self.out_channels, 3, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = conv(self.out_channels, 1, padding=0, dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head self-attention over (h*w) tokens, 1x1-conv projections."""

    channels: int
    dtype: Dtype = jnp.float32
    gn_cross: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        hn = Norm("norm", self.gn_cross)(x)
        q = conv(c, 1, padding=0, dtype=self.dtype, name="q")(hn)
        k = conv(c, 1, padding=0, dtype=self.dtype, name="k")(hn)
        v = conv(c, 1, padding=0, dtype=self.dtype, name="v")(hn)
        # single head of width c; fp32 softmax inside the op
        q = q.reshape(b, h * w, 1, c)
        k = k.reshape(b, h * w, 1, c)
        v = v.reshape(b, h * w, 1, c)
        out = attention(q, k, v).reshape(b, h, w, c)
        out = conv(c, 1, padding=0, dtype=self.dtype, name="proj_out")(out)
        return x + out


class VAEDownsample(nn.Module):
    """Conv stride-2 with torch's asymmetric (0,1,0,1) pad (vae.py:50-54)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return conv(self.channels, 3, stride=2, padding=0, dtype=self.dtype, name="conv")(x)


class VAEUpsample(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return conv(self.channels, 3, dtype=self.dtype, name="conv")(nearest_upsample_2x(x))


class _Down(nn.Module):
    block_out: int
    num_res_blocks: int
    with_downsample: bool
    dtype: Dtype = jnp.float32
    gn_cross: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for j in range(self.num_res_blocks):
            x = ResnetBlock(self.block_out, dtype=self.dtype, gn_cross=self.gn_cross, name=f"block.{j}")(x)
        if self.with_downsample:
            x = VAEDownsample(x.shape[-1], dtype=self.dtype, name="downsample")(x)
        return x


class _Up(nn.Module):
    block_out: int
    num_res_blocks: int  # decoder runs num_res_blocks + 1
    with_upsample: bool
    dtype: Dtype = jnp.float32
    gn_cross: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for j in range(self.num_res_blocks + 1):
            x = ResnetBlock(self.block_out, dtype=self.dtype, gn_cross=self.gn_cross, name=f"block.{j}")(x)
        if self.with_upsample:
            x = VAEUpsample(x.shape[-1], dtype=self.dtype, name="upsample")(x)
        return x


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True
    dtype: Dtype = jnp.float32
    gn_cross: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n = len(self.ch_mult)
        h = conv(self.ch, 3, dtype=self.dtype, name="conv_in")(x.astype(self.dtype))
        for i in range(n):
            h = _Down(
                self.ch * self.ch_mult[i],
                self.num_res_blocks,
                with_downsample=(i != n - 1),
                dtype=self.dtype,
                gn_cross=self.gn_cross,
                name=f"down.{i}",
            )(h)
        c = self.ch * self.ch_mult[-1]
        h = ResnetBlock(c, dtype=self.dtype, gn_cross=self.gn_cross, name="mid.block_1")(h)
        h = AttnBlock(c, dtype=self.dtype, gn_cross=self.gn_cross, name="mid.attn_1")(h)
        h = ResnetBlock(c, dtype=self.dtype, gn_cross=self.gn_cross, name="mid.block_2")(h)
        h = Norm("norm_out", self.gn_cross)(h)
        h = nn.silu(h)
        out_c = 2 * self.z_channels if self.double_z else self.z_channels
        return conv(out_c, 3, dtype=jnp.float32, name="conv_out")(h.astype(jnp.float32))


class Decoder(nn.Module):
    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    dtype: Dtype = jnp.float32
    gn_cross: bool = False

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        n = len(self.ch_mult)
        c = self.ch * self.ch_mult[-1]
        h = conv(c, 3, dtype=self.dtype, name="conv_in")(z.astype(self.dtype))
        h = ResnetBlock(c, dtype=self.dtype, gn_cross=self.gn_cross, name="mid.block_1")(h)
        h = AttnBlock(c, dtype=self.dtype, gn_cross=self.gn_cross, name="mid.attn_1")(h)
        h = ResnetBlock(c, dtype=self.dtype, gn_cross=self.gn_cross, name="mid.block_2")(h)
        for i in reversed(range(n)):
            h = _Up(
                self.ch * self.ch_mult[i],
                self.num_res_blocks,
                with_upsample=(i != 0),
                dtype=self.dtype,
                gn_cross=self.gn_cross,
                name=f"up.{i}",
            )(h)
        h = Norm("norm_out", self.gn_cross)(h)
        h = nn.silu(h)
        return conv(self.out_ch, 3, dtype=jnp.float32, name="conv_out")(h.astype(jnp.float32))


class AutoencoderKL(nn.Module):
    """f8 KL VAE. encode() returns (mean, logvar); use sample()/mode()."""

    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    embed_dim: int = 4
    out_ch: int = 3
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            z_channels=self.z_channels, dtype=self.dtype,
        )
        self.decoder = Decoder(
            ch=self.ch, out_ch=self.out_ch, ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks, z_channels=self.z_channels,
            dtype=self.dtype,
        )
        self.quant_conv = conv(2 * self.embed_dim, 1, padding=0, dtype=jnp.float32)
        self.post_quant_conv = conv(self.z_channels, 1, padding=0, dtype=jnp.float32)

    def encode_moments(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """x in [-1,1] NHWC -> (mean, logvar), logvar clamped to [-30, 20]."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jax.Array, rng: Optional[jax.Array] = None):
        mean, logvar = self.encode_moments(x)
        if rng is not None:
            z = gaussian_sample(mean, logvar, rng)
        else:
            z = mean
        return self.decode(z), (mean, logvar)


def gaussian_sample(mean: jax.Array, logvar: jax.Array, rng: jax.Array) -> jax.Array:
    """DiagonalGaussianDistribution.sample (distributions.py:36-42)."""
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)


def gaussian_kl(
    mean: jax.Array,
    logvar: jax.Array,
    other_mean: Optional[jax.Array] = None,
    other_logvar: Optional[jax.Array] = None,
) -> jax.Array:
    """KL(q || N(0,1)) or KL(q || other), summed over non-batch dims
    (distributions.py:47-60)."""
    axes = tuple(range(1, mean.ndim))
    var = jnp.exp(logvar)
    if other_mean is None:
        return 0.5 * jnp.sum(mean**2 + var - 1.0 - logvar, axis=axes)
    other_var = jnp.exp(other_logvar)
    return 0.5 * jnp.sum(
        (mean - other_mean) ** 2 / other_var + var / other_var
        - 1.0 - logvar + other_logvar,
        axis=axes,
    )


def gaussian_nll(sample: jax.Array, mean: jax.Array, logvar: jax.Array) -> jax.Array:
    """Negative log likelihood, summed over non-batch dims (distributions.py:62-74)."""
    log2pi = 1.8378770664093453  # log(2*pi)
    var = jnp.exp(logvar)
    return 0.5 * jnp.sum(
        log2pi + logvar + (sample - mean) ** 2 / var,
        axis=tuple(range(1, sample.ndim)),
    )


def normal_kl(mean1, logvar1, mean2, logvar2):
    """Elementwise KL between two diagonal gaussians (distributions.py:77-92)."""
    return 0.5 * (
        -1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
        + (mean1 - mean2) ** 2 * jnp.exp(-logvar2)
    )
