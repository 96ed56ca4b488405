"""CodeFormer-style face degradation dataset (stage-1 training).

Behavioral parity target: /root/reference/diffbir/dataset/codeformer.py:21-133:
blur (mixed iso/aniso kernels) -> random downsample [1,12] -> gaussian noise
-> cv2 JPEG -> resize back; 50% prompt dropout; returns (gt [-1,1], lq [0,1],
prompt) HWC float32. Retries + index resampling on decode failure
(micro-resilience, SURVEY.md §5.3).

Pure-Python host dataset: iterate with any loader; ``as_iterator(batch)``
yields numpy batches ready for ``jax.device_put``.
"""

from __future__ import annotations

import io
import math
import random
import time
from typing import Any, Dict, Mapping, Optional, Sequence

import cv2
import numpy as np
from PIL import Image

from .. import config as cfglib
from ..config import register
from .degradation import add_gaussian_noise_np, jpeg_compress_np, random_mixed_kernels
from .utils import center_crop_arr, load_file_list, random_crop_arr


@register("codeformer_dataset")
class CodeformerDataset:
    def __init__(
        self,
        file_list: str,
        file_backend_cfg: Mapping[str, Any],
        out_size: int,
        crop_type: str,
        blur_kernel_size: int,
        kernel_list: Sequence[str],
        kernel_prob: Sequence[float],
        blur_sigma: Sequence[float],
        downsample_range: Sequence[float],
        noise_range: Optional[Sequence[float]],
        jpeg_range: Optional[Sequence[int]],
        p_empty_prompt: float = 0.5,
    ):
        self.image_files = load_file_list(file_list)
        self.file_backend = cfglib.instantiate(file_backend_cfg)
        self.out_size = out_size
        assert crop_type in ("none", "center", "random")
        self.crop_type = crop_type
        self.blur_kernel_size = blur_kernel_size
        self.kernel_list = kernel_list
        self.kernel_prob = kernel_prob
        self.blur_sigma = blur_sigma
        self.downsample_range = downsample_range
        self.noise_range = noise_range
        self.jpeg_range = jpeg_range
        self.p_empty_prompt = p_empty_prompt
        self._rng = np.random.default_rng()

    def __len__(self) -> int:
        return len(self.image_files)

    def _load_gt(self, path: str, max_retry: int = 5) -> Optional[np.ndarray]:
        import os

        from .file_backend import HardDiskBackend

        data = None
        while data is None:
            if max_retry == 0:
                return None
            # Missing local file: resample immediately (retries are for
            # transient errors). Non-local backends (Petrel s3://) never
            # exist on the local filesystem, so only check HardDisk paths.
            if isinstance(self.file_backend, HardDiskBackend) and not os.path.exists(path):
                return None
            data = self.file_backend.get(path)
            max_retry -= 1
            if data is None:
                time.sleep(0.5)
        try:
            img = Image.open(io.BytesIO(data)).convert("RGB")
        except Exception:  # corrupt image: resample (reference returns None)
            return None
        if self.crop_type == "none":
            if img.height != self.out_size or img.width != self.out_size:
                return None
            return np.array(img)
        if img.height == self.out_size and img.width == self.out_size:
            return np.array(img)
        if self.crop_type == "center":
            return center_crop_arr(img, self.out_size)
        return random_crop_arr(img, self.out_size, min_crop_frac=0.7)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        img_gt = None
        while img_gt is None:
            meta = self.image_files[index]
            img_gt = self._load_gt(meta["image_path"])
            if img_gt is None:
                index = random.randint(0, len(self) - 1)
        prompt = meta.get("prompt", "")
        if self._rng.uniform() < self.p_empty_prompt:
            prompt = ""
        return {**self._degrade(img_gt), "prompt": prompt}

    def as_iterator(self, batch_size: int, shuffle: bool = True, seed: int = 0,
                    native: bool = False, num_threads: int = 4):
        """``native=True`` moves decode+crop into the C++ worker pool
        (native/dataloader; only for on-disk files with center/random crop);
        the degradation synthesis stays in numpy/cv2 on the host."""
        if native:
            yield from self._as_native_iterator(batch_size, seed, num_threads, shuffle)
            return
        if len(self) < batch_size:
            # the drop-last epoch loop below would otherwise spin forever
            # yielding nothing
            raise ValueError(
                f"dataset has {len(self)} items < batch_size={batch_size}"
            )
        order_rng = np.random.default_rng(seed)
        # reproducibility: degradation/prompt sampling shares the seed too
        self._rng = np.random.default_rng(seed + 1)
        random.seed(seed + 2)
        while True:
            idx = np.arange(len(self))
            if shuffle:
                order_rng.shuffle(idx)
            for i in range(0, len(idx) - batch_size + 1, batch_size):
                items = [self[int(j)] for j in idx[i: i + batch_size]]
                yield {
                    "gt": np.stack([it["gt"] for it in items]),
                    "lq": np.stack([it["lq"] for it in items]),
                    "prompt": [it["prompt"] for it in items],
                }

    def _degrade(self, img_gt: np.ndarray) -> Dict[str, np.ndarray]:
        """Two-stage synthetic degradation on one decoded uint8 RGB image."""
        gt = (img_gt / 255.0).astype(np.float32)
        h, w, _ = gt.shape
        rng = self._rng
        kernel = random_mixed_kernels(
            rng, self.kernel_list, self.kernel_prob, self.blur_kernel_size,
            tuple(self.blur_sigma), tuple(self.blur_sigma), (-math.pi, math.pi),
        )
        lq = cv2.filter2D(gt, -1, kernel)
        scale = rng.uniform(*self.downsample_range)
        lq = cv2.resize(lq, (int(w // scale), int(h // scale)),
                        interpolation=cv2.INTER_LINEAR)
        if self.noise_range is not None:
            sigma = rng.uniform(*self.noise_range)
            lq = add_gaussian_noise_np(rng, lq, sigma)
        if self.jpeg_range is not None:
            q = rng.integers(self.jpeg_range[0], self.jpeg_range[1])
            lq = jpeg_compress_np(lq, int(q))
        lq = cv2.resize(lq, (w, h), interpolation=cv2.INTER_LINEAR)
        return {
            "gt": (gt * 2 - 1).astype(np.float32),
            "lq": np.clip(lq, 0, 1).astype(np.float32),
        }

    def _as_native_iterator(self, batch_size: int, seed: int, num_threads: int,
                             shuffle: bool = True):
        from .native_loader import NativeImageLoader

        if self.crop_type == "none":
            raise ValueError("native loader needs center/random crop_type")
        paths = [m["image_path"] for m in self.image_files]
        loader = NativeImageLoader(
            paths, batch_size, self.out_size,
            crop="center" if self.crop_type == "center" else "random_zoom",
            hflip=False, rot90=False, num_threads=num_threads, seed=seed, shuffle=shuffle,
        )
        while True:
            imgs, idx = loader.next_with_idx()
            items = [self._degrade(img) for img in imgs]
            prompts = [
                ""
                if self._rng.uniform() < self.p_empty_prompt
                else self.image_files[int(j)].get("prompt", "")
                for j in idx
            ]
            yield {
                "gt": np.stack([it["gt"] for it in items]),
                "lq": np.stack([it["lq"] for it in items]),
                "prompt": prompts,
            }
