"""Two-stage Real-ESRGAN batch degradation + training-pair queue.

Behavioral parity target:
/root/reference/diffbir/dataset/batch_transform.py:27-285:
USM-sharpen GT -> [blur -> random up/down/keep resize -> gaussian|poisson
noise -> JPEG] -> [optional second blur -> resize toward gt/stage2_scale ->
noise -> (sinc+resize | JPEG) order shuffle] -> resize back -> round;
plus the shuffled training-pair pool (queue_size) for intra-batch diversity.

Execution placement: random-scale resizes produce data-dependent shapes, so
running the whole transform under one jit would recompile per batch. The
transform therefore runs on HOST numpy/cv2 (async with TPU steps, like any
input pipeline), with semantics identical to the reference's GPU version.
The jax building blocks (ops/diffjpeg.diff_jpeg, degradation.*_batch) exist
for a bucketed on-device variant.
"""

from __future__ import annotations

import random
from typing import Dict, Sequence, Union

import cv2
import numpy as np

from ..config import register
from .degradation import jpeg_compress_np

_CV2_MODES = {
    "area": cv2.INTER_AREA,
    "bilinear": cv2.INTER_LINEAR,
    "bicubic": cv2.INTER_CUBIC,
}


def _filter2d(imgs: np.ndarray, kernels: np.ndarray) -> np.ndarray:
    return np.stack(
        [cv2.filter2D(im, -1, k) for im, k in zip(imgs, kernels)], axis=0
    )


def _usm_sharp(img: np.ndarray, weight=0.5, radius=50, threshold=10) -> np.ndarray:
    if radius % 2 == 0:
        radius += 1
    blur = cv2.GaussianBlur(img, (radius, radius), 0)
    residual = img - blur
    mask = (np.abs(residual) * 255 > threshold).astype(np.float32)
    soft_mask = cv2.GaussianBlur(mask, (radius, radius), 0)
    sharp = np.clip(img + weight * residual, 0, 1)
    return soft_mask * sharp + (1 - soft_mask) * img


def _add_noise(rng, img, sigma_range, poisson_range, gaussian_prob, gray_prob):
    """Per-image gaussian-or-poisson noise with gray option ([0,1] HWC)."""
    out = np.empty_like(img)
    for i in range(img.shape[0]):
        gray = rng.uniform() < gray_prob
        if rng.uniform() < gaussian_prob:
            sigma = rng.uniform(*sigma_range) / 255.0
            shape = img.shape[1:3] + ((1,) if gray else (3,))
            noise = rng.standard_normal(shape).astype(np.float32) * sigma
            out[i] = img[i] + noise
        else:
            scale = rng.uniform(*poisson_range)
            src = img[i].mean(-1, keepdims=True) if gray else img[i]
            rounded = np.round(np.clip(src, 0, 1) * 255.0) / 255.0
            vals = 2 ** np.ceil(np.log2(len(np.unique((rounded * 255).astype(np.uint8)))))
            noisy = rng.poisson(rounded * vals).astype(np.float32) / vals
            out[i] = img[i] + (noisy - rounded) * scale
    return np.clip(out, 0, 1)


@register("realesrgan_batch_transform")
class RealESRGANBatchTransform:
    def __init__(
        self,
        use_sharpener: bool,
        queue_size: int,
        resize_prob: Sequence[float],
        resize_range: Sequence[float],
        gray_noise_prob: float,
        gaussian_noise_prob: float,
        noise_range: Sequence[float],
        poisson_scale_range: Sequence[float],
        jpeg_range: Sequence[int],
        second_blur_prob: float,
        stage2_scale: Union[float, Sequence[float]],
        resize_prob2: Sequence[float],
        resize_range2: Sequence[float],
        gray_noise_prob2: float,
        gaussian_noise_prob2: float,
        noise_range2: Sequence[float],
        poisson_scale_range2: Sequence[float],
        jpeg_range2: Sequence[int],
    ):
        self.__dict__.update(locals())
        del self.self
        self._queue = None
        self._rng = np.random.default_rng()

    # ------------------------------------------------------------------ #
    def _resize(self, img: np.ndarray, out_hw, mode: str) -> np.ndarray:
        return np.stack(
            [cv2.resize(im, (out_hw[1], out_hw[0]), interpolation=_CV2_MODES[mode]) for im in img]
        )

    def _jpeg(self, img: np.ndarray, q_range) -> np.ndarray:
        rng = self._rng
        return np.stack(
            [jpeg_compress_np(im, int(rng.uniform(*q_range))) for im in img]
        )

    def _dequeue_and_enqueue(self, gt, lq, txt):
        """Shuffled training-pair pool (batch_transform.py:89-140)."""
        b = lq.shape[0]
        if self._queue is None:
            assert self.queue_size % b == 0
            self._queue = {
                "lq": np.zeros((self.queue_size,) + lq.shape[1:], np.float32),
                "gt": np.zeros((self.queue_size,) + gt.shape[1:], np.float32),
                "txt": [""] * self.queue_size,
                "ptr": 0,
            }
        q = self._queue
        if q["ptr"] == self.queue_size:
            idx = self._rng.permutation(self.queue_size)
            q["lq"], q["gt"] = q["lq"][idx], q["gt"][idx]
            q["txt"] = [q["txt"][j] for j in idx]
            lq_out, gt_out = q["lq"][:b].copy(), q["gt"][:b].copy()
            txt_out = q["txt"][:b]
            q["lq"][:b], q["gt"][:b] = lq, gt
            q["txt"][:b] = list(txt)
            return gt_out, lq_out, txt_out
        q["lq"][q["ptr"]: q["ptr"] + b] = lq
        q["gt"][q["ptr"]: q["ptr"] + b] = gt
        q["txt"][q["ptr"]: q["ptr"] + b] = list(txt)
        q["ptr"] += b
        return gt, lq, txt

    # ------------------------------------------------------------------ #
    def __call__(self, batch: Dict) -> Dict:
        rng = self._rng
        hq = np.asarray(batch["hq"], np.float32)  # [B,H,W,3] in [0,1]
        if self.use_sharpener:
            hq = np.stack([_usm_sharp(im) for im in hq])
        ori_h, ori_w = hq.shape[1:3]

        # ---- first degradation ----
        out = _filter2d(hq, batch["kernel1"])
        updown = random.choices(["up", "down", "keep"], self.resize_prob)[0]
        scale = (
            rng.uniform(1, self.resize_range[1]) if updown == "up"
            else rng.uniform(self.resize_range[0], 1) if updown == "down" else 1.0
        )
        if scale != 1.0:
            mode = random.choice(list(_CV2_MODES))
            out = self._resize(out, (int(ori_h * scale), int(ori_w * scale)), mode)
        out = _add_noise(
            rng, out, self.noise_range, self.poisson_scale_range,
            self.gaussian_noise_prob, self.gray_noise_prob,
        )
        out = self._jpeg(np.clip(out, 0, 1), self.jpeg_range)

        # ---- second degradation ----
        if rng.uniform() < self.second_blur_prob:
            out = _filter2d(out, batch["kernel2"])
        if isinstance(self.stage2_scale, (list, tuple)):
            stage2_scale = rng.uniform(*self.stage2_scale)
        else:
            stage2_scale = float(self.stage2_scale)
        s2h, s2w = int(ori_h / stage2_scale), int(ori_w / stage2_scale)
        updown = random.choices(["up", "down", "keep"], self.resize_prob2)[0]
        scale = (
            rng.uniform(1, self.resize_range2[1]) if updown == "up"
            else rng.uniform(self.resize_range2[0], 1) if updown == "down" else 1.0
        )
        mode = random.choice(list(_CV2_MODES))
        out = self._resize(out, (int(s2h * scale), int(s2w * scale)), mode)
        out = _add_noise(
            rng, out, self.noise_range2, self.poisson_scale_range2,
            self.gaussian_noise_prob2, self.gray_noise_prob2,
        )
        # [resize+sinc] and JPEG in random order (anti-twisted-lines trick)
        if rng.uniform() < 0.5:
            mode = random.choice(list(_CV2_MODES))
            out = self._resize(out, (s2h, s2w), mode)
            out = _filter2d(out, batch["sinc_kernel"])
            out = self._jpeg(np.clip(out, 0, 1), self.jpeg_range2)
        else:
            out = self._jpeg(np.clip(out, 0, 1), self.jpeg_range2)
            mode = random.choice(list(_CV2_MODES))
            out = self._resize(out, (s2h, s2w), mode)
            out = _filter2d(out, batch["sinc_kernel"])
        if stage2_scale != 1:
            out = self._resize(out, (ori_h, ori_w), "bicubic")
        lq = np.clip(np.round(np.clip(out, 0, 1) * 255.0), 0, 255) / 255.0

        gt, lq, txt = self._dequeue_and_enqueue(hq, lq.astype(np.float32), batch["txt"])
        return {
            "gt": (gt * 2 - 1).astype(np.float32),  # [-1,1]
            "lq": lq.astype(np.float32),            # [0,1]
            "txt": txt,
        }


@register("identity_batch_transform")
class IdentityBatchTransform:
    """Pass-through for datasets that degrade on the host (codeformer)."""

    def __call__(self, batch):
        return batch
