"""Restoration guidance (GDP-style gradient guidance on pred_x0).

Behavioral parity target: /root/reference/diffbir/utils/cond_fn.py:6-111
(MSEGuidance / WeightedMSEGuidance with sobel-magnitude 2x2-block weights,
scale x3000, t_start/t_stop window). NOTE: in the reference snapshot no
sampler ever *invokes* cond_fn (SURVEY.md §2.7 — dead path); here it is wired
into SpacedSampler.sample(..., cond_fn=...) and actually applied:
``pred_x0 <- pred_x0 + g`` for ``repeat`` rounds while t in [t_stop, t_start],
per the GDP formulation. Gradients come from ``jax.grad`` (no autograd tape).

Inputs are NHWC in [-1, 1]; the guidance target is set via ``load_target``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


class Guidance:
    def __init__(
        self, scale: float, t_start: int, t_stop: int, space: str, repeat: int
    ):
        self.scale = scale * 3000.0
        self.t_start = t_start
        self.t_stop = t_stop
        self.space = space  # "latent" or "rgb"
        self.repeat = repeat
        self.target: Optional[jax.Array] = None

    def load_target(self, target: jax.Array) -> None:
        self.target = target

    def loss(self, pred_x0: jax.Array, target_x0: jax.Array) -> jax.Array:
        raise NotImplementedError

    def __call__(self, target_x0, pred_x0) -> Tuple[jax.Array, jax.Array]:
        """Returns (gradient step g, scalar loss)."""
        loss, grad = jax.value_and_grad(lambda p: self.loss(p, target_x0))(pred_x0)
        return -grad * self.scale, loss


class RGBSpaceGuidance:
    """Adapter: compute an rgb-space guidance loss on a *latent* pred_x0.

    ``--g_space rgb`` semantics (reference cond_fn.py:20-45 + GDP): the loss
    compares the VAE-decoded pred_x0 (RGB, [-1,1]) against the RGB target;
    the gradient flows through the decoder back to the latent. The decoded
    image is cropped to the target's spatial size (latent may carry UNet
    padding).
    """

    def __init__(self, inner: Guidance, decode_fn):
        self.inner = inner
        self.decode_fn = decode_fn
        self.t_start = inner.t_start
        self.t_stop = inner.t_stop
        self.repeat = inner.repeat
        self.scale = inner.scale
        self.space = "rgb"

    def __call__(self, target_rgb, pred_z0):
        h, w = target_rgb.shape[1:3]

        def loss_fn(z):
            img = self.decode_fn(z)[:, :h, :w, :].astype(jnp.float32)
            return self.inner.loss(img, target_rgb)

        loss, grad = jax.value_and_grad(loss_fn)(pred_z0)
        return -grad * self.scale, loss


class MSEGuidance(Guidance):
    def loss(self, pred_x0, target_x0):
        return jnp.sum(jnp.mean((pred_x0 - target_x0) ** 2, axis=(1, 2, 3)))


class WeightedMSEGuidance(Guidance):
    def _weight(self, target01: jax.Array) -> jax.Array:
        """1 - tanh(2x2-block-summed sobel magnitude), NHWC in [0,1]."""
        gray = jnp.tensordot(
            target01, jnp.asarray([0.2989, 0.5870, 0.1140], target01.dtype),
            axes=[[-1], [0]],
        )[..., None]
        gx = jnp.asarray([[1, 0, -1], [2, 0, -2], [1, 0, -1]], target01.dtype)
        gy = jnp.asarray([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], target01.dtype)
        kernel = jnp.stack([gx, gy], axis=-1)[:, :, None, :]  # HWIO, O=2
        padded = jnp.pad(gray, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        grad = jax.lax.conv_general_dilated(
            padded, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        mag = jnp.sqrt(jnp.sum(grad**2, axis=-1, keepdims=True))
        n, h, w, c = mag.shape
        b = 2
        blocks = mag.reshape(n, h // b, b, w // b, b, c)
        block_sum = jnp.tanh(jnp.sum(blocks, axis=(2, 4), keepdims=True))
        block_mean = jnp.broadcast_to(block_sum, blocks.shape).reshape(n, h, w, c)
        return 1.0 - block_mean

    def loss(self, pred_x0, target_x0):
        w = jax.lax.stop_gradient(self._weight((target_x0 + 1) / 2))
        return jnp.sum(jnp.mean((pred_x0 - target_x0) ** 2 * w, axis=(1, 2, 3)))
