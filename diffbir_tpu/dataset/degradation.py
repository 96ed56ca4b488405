"""Degradation synthesis (BasicSR/Real-ESRGAN lineage).

Behavioral parity target: /root/reference/diffbir/dataset/degradation.py
(bivariate (generalized/plateau) Gaussian kernels :85-175, random mixed
kernels :325-388, circular sinc low-pass :390-418, gaussian/poisson noise
:420-730, cv2 JPEG :732-765).

Split of responsibilities (TPU-first):
- kernel synthesis + cv2 JPEG run on HOST numpy inside data workers (cheap,
  per-sample, control-flow heavy);
- batched noise injection + filtering run ON DEVICE in jax (see
  batch_transform.py), replacing the reference's *_pt torch variants.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import cv2
import numpy as np

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------- #
# host-side kernel synthesis
# --------------------------------------------------------------------------- #
def _mesh_grid(kernel_size: int):
    ax = np.arange(-kernel_size // 2 + 1.0, kernel_size // 2 + 1.0)
    xx, yy = np.meshgrid(ax, ax)
    xy = np.hstack(
        [xx.reshape(kernel_size * kernel_size, 1), yy.reshape(kernel_size * kernel_size, 1)]
    ).reshape(kernel_size, kernel_size, 2)
    return xy, xx, yy


def _sigma_matrix(sig_x: float, sig_y: float, theta: float) -> np.ndarray:
    d = np.array([[sig_x**2, 0], [0, sig_y**2]])
    u = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    return u @ d @ u.T


def bivariate_gaussian(
    kernel_size: int, sig_x: float, sig_y: float = None, theta: float = 0.0,
    isotropic: bool = True,
) -> np.ndarray:
    xy, _, _ = _mesh_grid(kernel_size)
    if isotropic:
        sigma = np.array([[sig_x**2, 0], [0, sig_x**2]])
    else:
        sigma = _sigma_matrix(sig_x, sig_y, theta)
    inv = np.linalg.inv(sigma)
    kernel = np.exp(-0.5 * np.einsum("hwi,ij,hwj->hw", xy, inv, xy))
    return kernel / kernel.sum()


def bivariate_generalized_gaussian(
    kernel_size: int, sig_x: float, sig_y: float, theta: float, beta: float,
    isotropic: bool = True,
) -> np.ndarray:
    xy, _, _ = _mesh_grid(kernel_size)
    if isotropic:
        sigma = np.array([[sig_x**2, 0], [0, sig_x**2]])
    else:
        sigma = _sigma_matrix(sig_x, sig_y, theta)
    inv = np.linalg.inv(sigma)
    quad = np.einsum("hwi,ij,hwj->hw", xy, inv, xy)
    kernel = np.exp(-0.5 * np.power(quad, beta))
    return kernel / kernel.sum()


def bivariate_plateau(
    kernel_size: int, sig_x: float, sig_y: float, theta: float, beta: float,
    isotropic: bool = True,
) -> np.ndarray:
    xy, _, _ = _mesh_grid(kernel_size)
    if isotropic:
        sigma = np.array([[sig_x**2, 0], [0, sig_x**2]])
    else:
        sigma = _sigma_matrix(sig_x, sig_y, theta)
    inv = np.linalg.inv(sigma)
    quad = np.einsum("hwi,ij,hwj->hw", xy, inv, xy)
    kernel = 1.0 / (np.power(quad, beta) + 1)
    return kernel / kernel.sum()


def _rand(rng: np.random.Generator, lo: float, hi: float) -> float:
    return float(rng.uniform(lo, hi))


def random_mixed_kernels(
    rng: np.random.Generator,
    kernel_list: Sequence[str],
    kernel_prob: Sequence[float],
    kernel_size: int = 21,
    sigma_x_range: Tuple[float, float] = (0.6, 5),
    sigma_y_range: Tuple[float, float] = (0.6, 5),
    rotation_range: Tuple[float, float] = (-np.pi, np.pi),
    betag_range: Tuple[float, float] = (0.5, 8),
    betap_range: Tuple[float, float] = (0.5, 8),
) -> np.ndarray:
    """Sample one kernel from the Real-ESRGAN kernel mixture (:325-388)."""
    kind = rng.choice(kernel_list, p=kernel_prob)
    sx = _rand(rng, *sigma_x_range)
    sy = _rand(rng, *sigma_y_range)
    th = _rand(rng, *rotation_range)
    if kind == "iso":
        return bivariate_gaussian(kernel_size, sx, isotropic=True)
    if kind == "aniso":
        return bivariate_gaussian(kernel_size, sx, sy, th, isotropic=False)
    if kind == "generalized_iso":
        bg = _rand(rng, *betag_range)
        return bivariate_generalized_gaussian(kernel_size, sx, sx, 0, bg, True)
    if kind == "generalized_aniso":
        bg = _rand(rng, *betag_range)
        return bivariate_generalized_gaussian(kernel_size, sx, sy, th, bg, False)
    if kind == "plateau_iso":
        bp = _rand(rng, *betap_range)
        return bivariate_plateau(kernel_size, sx, sx, 0, bp, True)
    if kind == "plateau_aniso":
        bp = _rand(rng, *betap_range)
        return bivariate_plateau(kernel_size, sx, sy, th, bp, False)
    raise ValueError(kind)


def circular_lowpass_kernel(cutoff: float, kernel_size: int, pad_to: int = 0) -> np.ndarray:
    """2D sinc filter (:390-418). kernel_size must be odd."""
    from scipy import special

    assert kernel_size % 2 == 1
    r = kernel_size // 2
    yy, xx = np.mgrid[-r: r + 1, -r: r + 1].astype(np.float64)
    dist = np.sqrt(xx**2 + yy**2)
    with np.errstate(divide="ignore", invalid="ignore"):
        kernel = cutoff * special.j1(cutoff * dist) / (2 * np.pi * dist)
    kernel[r, r] = cutoff**2 / (4 * np.pi)
    kernel = kernel / kernel.sum()
    if pad_to > kernel_size:
        pad = (pad_to - kernel_size) // 2
        kernel = np.pad(kernel, ((pad, pad), (pad, pad)))
    return kernel


# --------------------------------------------------------------------------- #
# host-side degradations (per-sample, CodeformerDataset style)
# --------------------------------------------------------------------------- #
def add_gaussian_noise_np(
    rng: np.random.Generator, img: np.ndarray, sigma: float, gray: bool = False
) -> np.ndarray:
    """img float [0,1] HWC; sigma in [0,255] scale (:420-459)."""
    if gray:
        noise = rng.standard_normal(img.shape[:2])[..., None] * sigma / 255.0
    else:
        noise = rng.standard_normal(img.shape) * sigma / 255.0
    return np.clip(img + noise, 0, 1).astype(np.float32)


def jpeg_compress_np(img: np.ndarray, quality: int) -> np.ndarray:
    """cv2 JPEG round-trip on float [0,1] RGB HWC (:732-765).

    cv2 assumes BGR channel order and JPEG is NOT channel-symmetric
    (Y = .299R+.587G+.114B + 2x2 chroma subsampling), so the RGB input is
    flipped to BGR around the round-trip — matching the reference, which
    runs cv2 on true BGR data."""
    bgr = (img[..., ::-1] * 255.0).round().astype(np.uint8)
    enc = cv2.imencode(
        ".jpg", bgr, [int(cv2.IMWRITE_JPEG_QUALITY), int(quality)]
    )[1]
    out = cv2.imdecode(enc, cv2.IMREAD_UNCHANGED).astype(np.float32) / 255.0
    return out[..., ::-1]


# --------------------------------------------------------------------------- #
# device-side batched noise (replaces the *_pt torch variants)
# --------------------------------------------------------------------------- #
def add_gaussian_noise_batch(
    rng: jax.Array, img: jax.Array, sigma: jax.Array, gray_mask: jax.Array
) -> jax.Array:
    """img [B,H,W,C] in [0,1]; sigma [B] in [0,1] units; gray_mask [B] bool."""
    b, h, w, c = img.shape
    k1, k2 = jax.random.split(rng)
    noise_rgb = jax.random.normal(k1, img.shape) * sigma[:, None, None, None]
    noise_g = jax.random.normal(k2, (b, h, w, 1)) * sigma[:, None, None, None]
    noise = jnp.where(gray_mask[:, None, None, None], noise_g, noise_rgb)
    return jnp.clip(img + noise, 0.0, 1.0)


def add_poisson_noise_batch(
    rng: jax.Array, img: jax.Array, scale: jax.Array, gray_mask: jax.Array
) -> jax.Array:
    """Poisson shot noise via the reference's 2^ceil(log2(#levels)) vals trick
    (:610-656), batched. scale [B]."""
    def one(img_i, key, gray):
        kg, kc = jax.random.split(key)
        gray_img = jnp.mean(img_i, -1, keepdims=True)
        src = jnp.where(gray, gray_img, img_i)  # [h,w,c]
        rounded = jnp.round(src * 255.0) / 255.0
        # per-image unique-level count (reference len(unique) -> 2^ceil(log2))
        ints = jnp.round(src * 255.0).astype(jnp.int32).reshape(-1)
        nlevels = jnp.sum(jnp.bincount(ints, length=256) > 0).astype(jnp.float32)
        vals = 2.0 ** jnp.ceil(jnp.log2(jnp.maximum(nlevels, 2.0)))
        noise_rgb = jax.random.poisson(kc, rounded * vals) / vals - rounded
        # gray: ONE [h,w,1] draw broadcast to channels (averaging three
        # independent draws would shrink the std by sqrt(3))
        rounded_g = jnp.round(gray_img * 255.0) / 255.0
        noise_g = jax.random.poisson(kg, rounded_g * vals) / vals - rounded_g
        return jnp.where(
            gray, jnp.broadcast_to(noise_g, img_i.shape), noise_rgb
        )

    keys = jax.random.split(rng, img.shape[0])
    noise = jax.vmap(one)(img, keys, gray_mask)
    return jnp.clip(img + noise * scale[:, None, None, None], 0.0, 1.0)


def filter2d_batch(img: jax.Array, kernels: jax.Array) -> jax.Array:
    """Per-sample 2D filtering, img [B,H,W,C], kernels [B,k,k] (utils.py:162-188)."""
    k = kernels.shape[-1]
    pad = k // 2

    def one(im, ker):
        im = jnp.pad(im, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")
        ker4 = jnp.tile(ker[:, :, None, None], (1, 1, 1, im.shape[-1]))
        return jax.lax.conv_general_dilated(
            im[None], ker4, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=im.shape[-1],
        )[0]

    return jax.vmap(one)(img, kernels)


def usm_sharp_batch(img: jax.Array, weight: float = 0.5, radius: int = 50, threshold: float = 10.0) -> jax.Array:
    """Unsharp masking (utils.py:190-210), batched NHWC [0,1]."""
    if radius % 2 == 0:
        radius += 1
    sigma = 0.3 * ((radius - 1) * 0.5 - 1) + 0.8  # cv2.getGaussianKernel default
    ax = jnp.arange(radius) - radius // 2
    g = jnp.exp(-(ax**2) / (2 * sigma**2))
    g = g / g.sum()
    kernel = jnp.outer(g, g)
    b = img.shape[0]
    kernels = jnp.tile(kernel[None], (b, 1, 1))
    blur = filter2d_batch(img, kernels)
    residual = img - blur
    mask = (jnp.abs(residual) * 255.0 > threshold).astype(img.dtype)
    soft_mask = filter2d_batch(mask, kernels)
    sharp = jnp.clip(img + weight * residual, 0.0, 1.0)
    return soft_mask * sharp + (1 - soft_mask) * img
