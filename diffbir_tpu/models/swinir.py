"""SwinIR restoration transformer (stage-1 cleaner), NHWC flax.

Behavioral parity target: /root/reference/diffbir/model/swinir.py:37-905.
DiffBIR config (configs/inference/swinir.yaml): embed 180, 8 RSTBs x depth 6,
heads 6, window 8, mlp_ratio 2, PixelUnshuffle(8) input + nearest+conv x8
upsampler => net x1 on a pre-upscaled input.

TPU-first notes:
- window partition/reverse are pure reshapes on NHWC (lane-dim = channels);
  attention over (B*nW, 64, 180) runs as batched MXU matmuls with the
  relative-position bias + shift mask folded into one additive bias.
- shifted-window masks are host-precomputed per static input size (the
  reference recomputes them per forward when sizes differ, swinir.py:264-268).
- module names equal torch key fragments for mechanical weight conversion
  (layers.0.residual_group.blocks.0.attn.qkv etc.).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import xla_attention
from .layers import Dtype, LayerNormFp32, conv, dense, nearest_upsample_2x

RGB_MEAN = (0.4488, 0.4371, 0.4040)


# --------------------------------------------------------------------------- #
# host-side static geometry
# --------------------------------------------------------------------------- #
@functools.lru_cache(maxsize=64)
def relative_position_index(window: int) -> np.ndarray:
    """(N, N) indices into the (2w-1)^2 bias table (swinir.py:96-109)."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # 2, N, N
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)


@functools.lru_cache(maxsize=64)
def shift_attn_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """(nW, N, N) additive mask (0 / -100) for SW-MSA (swinir.py:222-243)."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = (
        img.reshape(h // window, window, w // window, window)
        .transpose(0, 2, 1, 3)
        .reshape(-1, window * window)
    )
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jax.Array, window: int) -> jax.Array:
    """(B,H,W,C) -> (B*nW, window, window, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)


def window_reverse(win: jax.Array, window: int, h: int, w: int) -> jax.Array:
    b = win.shape[0] // (h * w // window // window)
    x = win.reshape(b, h // window, w // window, window, window, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


# --------------------------------------------------------------------------- #
class WindowAttention(nn.Module):
    dim: int
    window: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[np.ndarray]) -> jax.Array:
        """x: (B*nW, N, C); mask: host (nW, N, N) or None."""
        bnw, n, c = x.shape
        dh = c // self.num_heads
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, self.num_heads),
            jnp.float32,
        )
        qkv = dense(3 * c, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(bnw, n, self.num_heads, dh)
        k = k.reshape(bnw, n, self.num_heads, dh)
        v = v.reshape(bnw, n, self.num_heads, dh)

        idx = relative_position_index(self.window).reshape(-1)
        bias = table[idx].reshape(n, n, self.num_heads).transpose(2, 0, 1)  # (H, N, N)
        bias = bias[None]  # (1, H, N, N)
        if mask is not None:
            nw = mask.shape[0]
            m = jnp.asarray(mask)[:, None, :, :]  # (nW, 1, N, N)
            bias = (bias + jnp.tile(m, (bnw // nw, 1, 1, 1)))
        out = xla_attention(q, k, v, bias=bias)
        out = out.reshape(bnw, n, c)
        return dense(c, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 2.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32

    def _drop_path(self, res: jax.Array, deterministic: bool) -> jax.Array:
        """Stochastic depth (per-sample residual drop, timm DropPath)."""
        if deterministic or self.drop_path == 0.0:
            return res
        keep = 1.0 - self.drop_path
        mask = jax.random.bernoulli(
            self.make_rng("drop_path"), keep, (res.shape[0],) + (1,) * (res.ndim - 1)
        )
        return res * mask.astype(res.dtype) / keep

    @nn.compact
    def __call__(
        self, x: jax.Array, x_size: Tuple[int, int], deterministic: bool = True
    ) -> jax.Array:
        h, w = x_size
        b, l, c = x.shape
        window, shift = self.window, self.shift
        if min(h, w) <= window:
            window, shift = min(h, w), 0

        shortcut = x
        x = LayerNormFp32(name="norm1")(x).reshape(b, h, w, c)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        win = window_partition(x, window).reshape(-1, window * window, c)
        mask = shift_attn_mask(h, w, window, shift) if shift > 0 else None
        win = WindowAttention(
            self.dim, window, self.num_heads, dtype=self.dtype, name="attn"
        )(win, mask)
        x = window_reverse(win.reshape(-1, window, window, c), window, h, w)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = shortcut + self._drop_path(x.reshape(b, l, c), deterministic)

        y = LayerNormFp32(name="norm2")(x)
        hid = int(self.dim * self.mlp_ratio)
        y = dense(hid, dtype=self.dtype, name="mlp.fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = dense(self.dim, dtype=self.dtype, name="mlp.fc2")(y)
        return x + self._drop_path(y, deterministic)


class RSTB(nn.Module):
    """Residual Swin Transformer Block: blocks -> conv -> +residual."""

    dim: int
    depth: int
    num_heads: int
    window: int
    mlp_ratio: float = 2.0
    resi_connection: str = "1conv"
    drop_path: Tuple[float, ...] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, x_size: Tuple[int, int], deterministic: bool = True
    ) -> jax.Array:
        h, w = x_size
        res = x
        for j in range(self.depth):
            x = SwinBlock(
                self.dim, self.num_heads, self.window,
                shift=0 if j % 2 == 0 else self.window // 2,
                mlp_ratio=self.mlp_ratio,
                drop_path=self.drop_path[j] if self.drop_path else 0.0,
                dtype=self.dtype,
                name=f"residual_group.blocks.{j}",
            )(x, x_size, deterministic)
        b, l, c = x.shape
        img = x.reshape(b, h, w, c)
        if self.resi_connection == "1conv":
            img = conv(self.dim, 3, dtype=self.dtype, name="conv")(img)
        else:
            img = conv(self.dim // 4, 3, dtype=self.dtype, name="conv.0")(img)
            img = nn.leaky_relu(img, 0.2)
            img = conv(self.dim // 4, 1, padding=0, dtype=self.dtype, name="conv.2")(img)
            img = nn.leaky_relu(img, 0.2)
            img = conv(self.dim, 3, dtype=self.dtype, name="conv.4")(img)
        return img.reshape(b, l, c) + res


def pixel_unshuffle(x: jax.Array, r: int) -> jax.Array:
    """NHWC space-to-depth with torch PixelUnshuffle channel order (c, ri, rj)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, H, W, c, ri, rj
    return x.reshape(b, h // r, w // r, c * r * r)


class SwinIR(nn.Module):
    img_size: int = 64  # unused at runtime (static shapes come from inputs)
    in_chans: int = 3
    embed_dim: int = 180
    depths: Sequence[int] = (6, 6, 6, 6, 6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6, 6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 2.0
    sf: int = 8
    img_range: float = 1.0
    upsampler: str = "nearest+conv"
    resi_connection: str = "1conv"
    unshuffle: bool = True
    unshuffle_scale: int = 8
    drop_path_rate: float = 0.0  # stochastic depth during training (ref default 0.1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        """x: [0,1] NHWC. Output crop follows the reference (swinir.py:856-894)."""
        b, h_in, w_in, _ = x.shape
        # pad so the post-unshuffle feature map tiles into windows
        mult = self.window_size * (self.unshuffle_scale if self.unshuffle else 1)
        ph = (mult - h_in % mult) % mult
        pw = (mult - w_in % mult) % mult
        if ph or pw:
            # reflect requires pad < dim; tiny inputs (smaller than the
            # 64-multiple pad) fall back to edge replication instead of
            # crashing (the reference never hits this: it reflect-pads to
            # window=8 only and relies on the pipeline's x64 zero pad)
            mode = "reflect" if ph < h_in and pw < w_in else "edge"
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode=mode)

        mean = jnp.asarray(RGB_MEAN, x.dtype) if self.in_chans == 3 else 0.0
        x = (x - mean) * self.img_range
        x = x.astype(self.dtype)

        if self.unshuffle:
            feat = pixel_unshuffle(x, self.unshuffle_scale)
            feat = conv(self.embed_dim, 3, dtype=self.dtype, name="conv_first.1")(feat)
        else:
            feat = conv(self.embed_dim, 3, dtype=self.dtype, name="conv_first")(x)

        # deep features
        bb, hh, ww, cc = feat.shape
        seq = feat.reshape(bb, hh * ww, cc)
        seq = LayerNormFp32(name="patch_embed.norm")(seq)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        off = 0
        for i, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            seq = RSTB(
                self.embed_dim, depth, heads, self.window_size,
                mlp_ratio=self.mlp_ratio, resi_connection=self.resi_connection,
                drop_path=tuple(dpr[off: off + depth]),
                dtype=self.dtype, name=f"layers.{i}",
            )(seq, (hh, ww), deterministic)
            off += depth
        seq = LayerNormFp32(name="norm")(seq)
        deep = seq.reshape(bb, hh, ww, cc)
        feat = conv(self.embed_dim, 3, dtype=self.dtype, name="conv_after_body")(deep) + feat

        if self.upsampler == "nearest+conv":
            y = conv(64, 3, dtype=self.dtype, name="conv_before_upsample.0")(feat)
            y = nn.leaky_relu(y, 0.01)
            y = nn.leaky_relu(conv(64, 3, dtype=self.dtype, name="conv_up1")(nearest_upsample_2x(y)), 0.2)
            if self.sf >= 4:
                y = nn.leaky_relu(conv(64, 3, dtype=self.dtype, name="conv_up2")(nearest_upsample_2x(y)), 0.2)
            if self.sf == 8:
                y = nn.leaky_relu(conv(64, 3, dtype=self.dtype, name="conv_up3")(nearest_upsample_2x(y)), 0.2)
            y = nn.leaky_relu(conv(64, 3, dtype=self.dtype, name="conv_hr")(y), 0.2)
            out = conv(self.in_chans, 3, dtype=jnp.float32, name="conv_last")(y.astype(jnp.float32))
        elif self.upsampler == "":
            # denoise / artifact-removal head: x + conv_last(res) (swinir.py:886-890)
            res = conv(self.in_chans, 3, dtype=jnp.float32, name="conv_last")(
                feat.astype(jnp.float32)
            )
            out = x.astype(jnp.float32) + res
        else:
            raise NotImplementedError(self.upsampler)

        out = out / self.img_range + mean
        eff = self.sf // (self.unshuffle_scale if self.unshuffle else 1)
        eff = max(eff, 1)
        return out[:, : h_in * eff, : w_in * eff, :]
