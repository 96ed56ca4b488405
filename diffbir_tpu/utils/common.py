"""Image-space utilities: wavelet color fix, resize/pad, metrics.

Behavioral parity targets in /root/reference/diffbir/utils/common.py:
- wavelet_blur/decomposition/reconstruction (:29-77): 5-level dilated conv
  pyramid; output = generated high-freq + condition low-freq.
- resize_short_edge_to / pad_to_multiples_of (pipeline.py:25-42).
- PSNR / rgb2ycbcr (:323-390).

All functions are NHWC, pure, jittable.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

_WAVELET_KERNEL = np.array(
    [[0.0625, 0.125, 0.0625], [0.125, 0.25, 0.125], [0.0625, 0.125, 0.0625]],
    np.float32,
)


def wavelet_blur(image: jax.Array, radius: int) -> jax.Array:
    """Depthwise 3x3 dilated blur with replicate padding. NHWC."""
    c = image.shape[-1]
    kernel = jnp.asarray(_WAVELET_KERNEL, image.dtype)
    # depthwise: HWIO with I=1, O=C, feature_group_count=C
    kernel = jnp.tile(kernel[:, :, None, None], (1, 1, 1, c))
    x = jnp.pad(
        image, ((0, 0), (radius, radius), (radius, radius), (0, 0)), mode="edge"
    )
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding="VALID",
        rhs_dilation=(radius, radius),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def wavelet_decomposition(image: jax.Array, levels: int = 5):
    high = jnp.zeros_like(image)
    low = image
    for i in range(levels):
        blurred = wavelet_blur(low, 2**i)
        high = high + (low - blurred)
        low = blurred
    return high, low


def wavelet_reconstruction(content: jax.Array, style: jax.Array) -> jax.Array:
    """content's high frequencies + style's low frequencies (color fix)."""
    content_high, _ = wavelet_decomposition(content)
    _, style_low = wavelet_decomposition(style)
    return content_high + style_low


# --------------------------------------------------------------------------- #
def bicubic_resize(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Bicubic resize, NHWC. jax.image 'cubic' scales its kernel on
    downsampling, matching torch's antialias=True behavior closely."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, out_hw[0], out_hw[1], c), method="cubic")


def resize_short_edge_to(x: jax.Array, size: int) -> jax.Array:
    _, h, w, _ = x.shape
    if h == w:
        out = (size, size)
    elif h < w:
        out = (size, int(w * (size / h)))
    else:
        out = (int(h * (size / w)), size)
    return bicubic_resize(x, out)


def pad_to_multiples_of(x: jax.Array, multiple: int) -> jax.Array:
    _, h, w, _ = x.shape
    ph = (h + multiple - 1) // multiple * multiple - h
    pw = (w + multiple - 1) // multiple * multiple - w
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))


# --------------------------------------------------------------------------- #
def rgb2ycbcr_y(x: jax.Array) -> jax.Array:
    """BT.601 Y channel of an RGB image in [0,1] (common.py:323-355)."""
    w = jnp.asarray([65.481, 128.553, 24.966], x.dtype) / 255.0
    return jnp.tensordot(x, w, axes=[[-1], [0]]) + 16.0 / 255.0


def ssim(a: jax.Array, b: jax.Array) -> jax.Array:
    """Mean SSIM per batch item between [0,1] NHWC batches.

    Standard Wang et al. settings: 11x11 gaussian window (sigma 1.5),
    K1=0.01 / K2=0.03, valid padding, averaged over space and channels.
    (The reference repo has no SSIM; this backs the turbo-drift accounting.)
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    r = jnp.arange(11, dtype=jnp.float32) - 5.0
    g = jnp.exp(-(r**2) / (2.0 * 1.5**2))
    g = g / jnp.sum(g)
    c = a.shape[-1]

    def blur(x):
        # separable depthwise gaussian, valid padding
        kh = jnp.tile(g.reshape(11, 1, 1, 1), (1, 1, 1, c))
        kw = jnp.tile(g.reshape(1, 11, 1, 1), (1, 1, 1, c))
        dn = jax.lax.conv_dimension_numbers(x.shape, (11, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
        x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID", dimension_numbers=dn,
                                         feature_group_count=c)
        return jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID", dimension_numbers=dn,
                                            feature_group_count=c)

    c1, c2 = 0.01**2, 0.03**2
    mu_a, mu_b = blur(a), blur(b)
    # fp32 E[x^2]-E[x]^2 can go slightly negative on near-identical inputs,
    # reporting SSIM marginally > 1 (seen at 1.0005 on the trained-tiny
    # quant accounting) — clamp the variance estimates at 0
    var_a = jnp.maximum(blur(a * a) - mu_a**2, 0.0)
    var_b = jnp.maximum(blur(b * b) - mu_b**2, 0.0)
    cov = blur(a * b) - mu_a * mu_b
    # Cauchy-Schwarz bound, also broken only by float error
    bound = jnp.sqrt(var_a * var_b)
    cov = jnp.clip(cov, -bound, bound)
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    )
    return jnp.mean(s, axis=(1, 2, 3))


def psnr(a: jax.Array, b: jax.Array, crop_border: int = 0, test_y: bool = False):
    """PSNR between [0,1] NHWC batches (common.py:359-390)."""
    if crop_border:
        a = a[:, crop_border:-crop_border, crop_border:-crop_border]
        b = b[:, crop_border:-crop_border, crop_border:-crop_border]
    if test_y:
        a, b = rgb2ycbcr_y(a)[..., None], rgb2ycbcr_y(b)[..., None]
    mse = jnp.mean((a.astype(jnp.float64) - b.astype(jnp.float64)) ** 2, axis=(1, 2, 3))
    return 10.0 * jnp.log10(1.0 / (mse + 1e-12))
