"""SCUNet (Swin-Conv UNet blind denoiser), NHWC flax.

Behavioral parity target: /root/reference/diffbir/model/scunet.py:9-243
(WMSA window attention with learnable relative embedding, parallel
conv+transformer ConvTransBlock, 7-level encoder/decoder with k2s2
conv/conv-transpose resampling, replicate pad to x64).

Module names equal torch key fragments (m_down1.0.trans_block.msa...).
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import xla_attention
from .layers import Dtype, LayerNormFp32, conv, dense
from .swinir import shift_attn_mask, window_partition, window_reverse


@functools.lru_cache(maxsize=16)
def _relative_indices(window: int) -> np.ndarray:
    """(N, N, 2) indices into the (2w-1, 2w-1) table (scunet.py:88-92)."""
    cord = np.array([[i, j] for i in range(window) for j in range(window)])
    rel = cord[:, None, :] - cord[None, :, :] + window - 1
    return rel


class WMSA(nn.Module):
    dim: int
    head_dim: int
    window: int
    shifted: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, H, W, C) -> (B, H, W, C)."""
        b, h, w, c = x.shape
        heads = self.dim // self.head_dim
        p = self.window
        table = self.param(
            "relative_position_params",
            nn.initializers.truncated_normal(0.02),
            (heads, 2 * p - 1, 2 * p - 1),
            jnp.float32,
        )
        if self.shifted:
            x = jnp.roll(x, (-(p // 2), -(p // 2)), axis=(1, 2))
        win = window_partition(x, p).reshape(-1, p * p, c)  # (B*nW, N, C)
        qkv = dense(3 * self.dim, dtype=self.dtype, name="embedding_layer")(win)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        bnw, n, _ = q.shape
        q = q.reshape(bnw, n, heads, self.head_dim)
        k = k.reshape(bnw, n, heads, self.head_dim)
        v = v.reshape(bnw, n, heads, self.head_dim)

        rel = _relative_indices(p)
        bias = table[:, rel[:, :, 0], rel[:, :, 1]][None]  # (1, heads, N, N)
        if self.shifted:
            m = shift_attn_mask(h, w, p, p // 2)  # (nW, N, N) additive 0/-100
            # scunet masks with -inf; -100 after softmax is numerically identical
            mask_full = jnp.tile(jnp.asarray(m), (bnw // m.shape[0], 1, 1))
            bias = bias + mask_full[:, None, :, :]  # (B*nW, 1, N, N)
        out = xla_attention(q, k, v, bias=bias).reshape(bnw, n, c)
        out = dense(self.dim, dtype=self.dtype, name="linear")(out)
        out = window_reverse(out.reshape(-1, p, p, c), p, h, w)
        if self.shifted:
            out = jnp.roll(out, (p // 2, p // 2), axis=(1, 2))
        return out


class TransBlock(nn.Module):
    dim: int
    head_dim: int
    window: int
    shifted: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = LayerNormFp32(name="ln1")(x)
        x = x + WMSA(self.dim, self.head_dim, self.window, self.shifted,
                     dtype=self.dtype, name="msa")(h)
        h = LayerNormFp32(name="ln2")(x)
        h = dense(4 * self.dim, dtype=self.dtype, name="mlp.0")(h)
        h = nn.gelu(h, approximate=False)
        h = dense(self.dim, dtype=self.dtype, name="mlp.2")(h)
        return x + h


class ConvTransBlock(nn.Module):
    conv_dim: int
    trans_dim: int
    head_dim: int
    window: int
    shifted: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        total = self.conv_dim + self.trans_dim
        h = conv(total, 1, padding=0, dtype=self.dtype, name="conv1_1")(x)
        conv_x, trans_x = jnp.split(h, [self.conv_dim], axis=-1)
        cb = conv(self.conv_dim, 3, use_bias=False, dtype=self.dtype, name="conv_block.0")(conv_x)
        cb = nn.relu(cb)
        cb = conv(self.conv_dim, 3, use_bias=False, dtype=self.dtype, name="conv_block.2")(cb)
        conv_x = conv_x + cb
        trans_x = TransBlock(
            self.trans_dim, self.head_dim, self.window, self.shifted,
            dtype=self.dtype, name="trans_block",
        )(trans_x)
        res = conv(total, 1, padding=0, dtype=self.dtype, name="conv1_2")(
            jnp.concatenate([conv_x, trans_x], axis=-1)
        )
        return x + res


def _conv_nobias(features, kernel, stride, name, dtype):
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride), padding="VALID"
        if kernel == stride else [(1, 1), (1, 1)],
        use_bias=False, dtype=dtype, param_dtype=jnp.float32, name=name,
    )


class SCUNet(nn.Module):
    in_nc: int = 3
    config: Sequence[int] = (4, 4, 4, 4, 4, 4, 4)
    dim: int = 64
    head_dim: int = 32
    window: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x0: jax.Array) -> jax.Array:
        b, h, w, _ = x0.shape
        ph = (64 - h % 64) % 64
        pw = (64 - w % 64) % 64
        if ph or pw:
            x0 = jnp.pad(x0, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        x0 = x0.astype(self.dtype)
        d = self.dim

        def ctb_stack(x, n, cdim, tdim, prefix, start_idx):
            for i in range(n):
                x = ConvTransBlock(
                    cdim, tdim, self.head_dim, self.window, shifted=bool(i % 2),
                    dtype=self.dtype, name=f"{prefix}.{start_idx + i}",
                )(x)
            return x

        x1 = _conv_nobias(d, 3, 1, "m_head.0", self.dtype)(x0)
        x2 = ctb_stack(x1, self.config[0], d // 2, d // 2, "m_down1", 0)
        x2 = _conv_nobias(2 * d, 2, 2, f"m_down1.{self.config[0]}", self.dtype)(x2)
        x3 = ctb_stack(x2, self.config[1], d, d, "m_down2", 0)
        x3 = _conv_nobias(4 * d, 2, 2, f"m_down2.{self.config[1]}", self.dtype)(x3)
        x4 = ctb_stack(x3, self.config[2], 2 * d, 2 * d, "m_down3", 0)
        x4 = _conv_nobias(8 * d, 2, 2, f"m_down3.{self.config[2]}", self.dtype)(x4)
        xb = ctb_stack(x4, self.config[3], 4 * d, 4 * d, "m_body", 0)

        up = nn.ConvTranspose(
            4 * d, (2, 2), strides=(2, 2), use_bias=False, transpose_kernel=True, dtype=self.dtype,
            param_dtype=jnp.float32, name="m_up3.0",
        )(xb + x4)
        up = ctb_stack(up, self.config[4], 2 * d, 2 * d, "m_up3", 1)
        up = nn.ConvTranspose(
            2 * d, (2, 2), strides=(2, 2), use_bias=False, transpose_kernel=True, dtype=self.dtype,
            param_dtype=jnp.float32, name="m_up2.0",
        )(up + x3)
        up = ctb_stack(up, self.config[5], d, d, "m_up2", 1)
        up = nn.ConvTranspose(
            d, (2, 2), strides=(2, 2), use_bias=False, transpose_kernel=True, dtype=self.dtype,
            param_dtype=jnp.float32, name="m_up1.0",
        )(up + x2)
        up = ctb_stack(up, self.config[6], d // 2, d // 2, "m_up1", 1)
        out = _conv_nobias(self.in_nc, 3, 1, "m_tail.0", jnp.float32)(
            (up + x1).astype(jnp.float32)
        )
        return out[:, :h, :w, :]
