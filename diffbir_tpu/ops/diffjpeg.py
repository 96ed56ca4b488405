"""Differentiable JPEG in JAX (for the on-device Real-ESRGAN batch transform).

Behavioral parity target: /root/reference/diffbir/dataset/diffjpeg.py:27-492
(RGB->YCbCr, 2x2 chroma subsampling, 8x8 DCT/iDCT as tensor contractions,
quality-factor-scaled quantization with the differentiable rounding
``round(x) + (x - round(x))^3``).

TPU notes: the 8x8 DCT is expressed as two 8x8 matmuls per block (MXU
friendly); block splitting is pure reshapes on NHWC.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# standard JPEG base quantization tables (ITU T.81 Annex K)
Y_TABLE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    np.float32,
)
C_TABLE = np.full((8, 8), 99, np.float32)
C_TABLE[:4, :4] = np.array(
    [[17, 18, 24, 47], [18, 21, 26, 66], [24, 26, 56, 99], [47, 66, 99, 99]]
)

# orthonormal-ish DCT-II basis as used by JPEG
_alpha = np.array([1.0 / np.sqrt(2)] + [1.0] * 7)
_DCT = np.zeros((8, 8), np.float32)
for k in range(8):
    for n in range(8):
        _DCT[k, n] = 0.25 * _alpha[k] * np.cos((2 * n + 1) * k * np.pi / 16)


def quality_to_factor(quality: float) -> float:
    """JPEG quality in (0,100] -> quant scale factor (diffjpeg.py:33-47)."""
    if quality < 50:
        return 5000.0 / quality / 100.0
    return (200.0 - quality * 2) / 100.0


def _rgb_to_ycbcr(x: jax.Array) -> jax.Array:
    m = jnp.asarray(
        [
            [0.299, 0.587, 0.114],
            [-0.168736, -0.331264, 0.5],
            [0.5, -0.418688, -0.081312],
        ],
        x.dtype,
    ).T
    shift = jnp.asarray([0.0, 128.0, 128.0], x.dtype)
    return x @ m + shift


def _ycbcr_to_rgb(x: jax.Array) -> jax.Array:
    m = jnp.asarray(
        [[1.0, 0.0, 1.402], [1.0, -0.344136, -0.714136], [1.0, 1.772, 0.0]], x.dtype
    ).T
    shift = jnp.asarray([0.0, -128.0, -128.0], x.dtype)
    return (x + shift) @ m


def _blocks(x: jax.Array) -> jax.Array:
    """[B,H,W] -> [B, H/8*W/8, 8, 8]."""
    b, h, w = x.shape
    x = x.reshape(b, h // 8, 8, w // 8, 8)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, -1, 8, 8)


def _unblocks(x: jax.Array, h: int, w: int) -> jax.Array:
    b = x.shape[0]
    x = x.reshape(b, h // 8, w // 8, 8, 8)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, h, w)


def _dct8x8(x: jax.Array) -> jax.Array:
    d = jnp.asarray(_DCT, x.dtype)
    return jnp.einsum("ki,...ij,lj->...kl", d, x - 128.0, d)


def _idct8x8(x: jax.Array) -> jax.Array:
    d = jnp.asarray(_DCT, x.dtype)
    return jnp.einsum("ik,...kl,jl->...ij", d, x, d) + 128.0


def _diff_round(x: jax.Array) -> jax.Array:
    r = jnp.round(x)
    return r + (x - r) ** 3


def diff_jpeg(x: jax.Array, quality: jax.Array,
              differentiable: bool = True) -> jax.Array:
    """JPEG round-trip; cubic soft rounding when ``differentiable`` else the
    reference training pipeline's hard round (DiffJPEG(differentiable=False),
    reference batch_transform usage — hard quantization for degradation
    synthesis, soft for gradient paths).

    x: [B,H,W,3] in [0,1] (H, W multiples of 16); quality: [B] in (0, 100].
    """
    b, h, w, _ = x.shape
    factor = jnp.where(
        quality < 50, 5000.0 / quality / 100.0, (200.0 - quality * 2) / 100.0
    )[:, None, None, None]
    ycc = _rgb_to_ycbcr(x * 255.0)
    y = ycc[..., 0]
    # 2x2 average-pool chroma subsampling
    cb = ycc[..., 1].reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    cr = ycc[..., 2].reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

    yt = jnp.asarray(Y_TABLE)
    ct = jnp.asarray(C_TABLE)

    rnd = _diff_round if differentiable else jnp.round

    def comp(ch, table):
        blocks = _dct8x8(_blocks(ch))
        q = table[None, None] * factor
        return rnd(blocks / q), q

    yq, yqt = comp(y, yt)
    cbq, cqt = comp(cb, ct)
    crq, _ = comp(cr, ct)

    y_rec = _unblocks(_idct8x8(yq * yqt), h, w)
    cb_rec = _unblocks(_idct8x8(cbq * cqt), h // 2, w // 2)
    cr_rec = _unblocks(_idct8x8(crq * cqt), h // 2, w // 2)
    # nearest chroma upsampling (diffjpeg.py:349-377 uses repeat)
    cb_up = jnp.repeat(jnp.repeat(cb_rec, 2, axis=1), 2, axis=2)
    cr_up = jnp.repeat(jnp.repeat(cr_rec, 2, axis=1), 2, axis=2)
    rgb = _ycbcr_to_rgb(jnp.stack([y_rec, cb_up, cr_up], axis=-1))
    return jnp.clip(rgb / 255.0, 0.0, 1.0)
