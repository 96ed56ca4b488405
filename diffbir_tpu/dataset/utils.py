"""Dataset utilities: file lists, crops, augmentation.

Behavioral parity target: /root/reference/diffbir/dataset/utils.py:16-160
(file-list/parquet loaders, guided-diffusion center/random crop, paired
hflip/rot augment). Device-side filter2D/USMSharp live in
dataset/degradation.py (batched jax).
"""

from __future__ import annotations

import random
from typing import Dict, List

import numpy as np
from PIL import Image


def load_file_list(path: str) -> List[Dict[str, str]]:
    """One image path per line, optionally 'path<TAB>prompt'."""
    files = []
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if "\t" in line:
                p, prompt = line.split("\t", 1)
            else:
                p, prompt = line, ""
            files.append({"image_path": p, "prompt": prompt})
    return files


def load_parquet_file_list(path: str, short_prompt_key="short_prompt",
                           long_prompt_key="long_prompt") -> List[Dict[str, str]]:
    """Parquet file lists with short/long captions (utils.py:26-46 analog)."""
    import pandas as pd

    df = pd.read_parquet(path)
    out = []
    for _, row in df.iterrows():
        out.append(
            {
                "image_path": row["image_path"],
                "short_prompt": row.get(short_prompt_key, ""),
                "long_prompt": row.get(long_prompt_key, ""),
            }
        )
    return out


def center_crop_arr(pil_image: Image.Image, image_size: int) -> np.ndarray:
    """Guided-diffusion center crop (utils.py:48-67)."""
    while min(*pil_image.size) >= 2 * image_size:
        pil_image = pil_image.resize(
            tuple(x // 2 for x in pil_image.size), resample=Image.BOX
        )
    scale = image_size / min(*pil_image.size)
    pil_image = pil_image.resize(
        tuple(round(x * scale) for x in pil_image.size), resample=Image.BICUBIC
    )
    arr = np.array(pil_image)
    cy = (arr.shape[0] - image_size) // 2
    cx = (arr.shape[1] - image_size) // 2
    return arr[cy: cy + image_size, cx: cx + image_size]


def random_crop_arr(
    pil_image: Image.Image, image_size: int,
    min_crop_frac: float = 0.8, max_crop_frac: float = 1.0,
) -> np.ndarray:
    """Guided-diffusion random crop (utils.py:69-92)."""
    min_smaller = int(np.ceil(image_size / max_crop_frac))
    max_smaller = int(np.ceil(image_size / min_crop_frac))  # ref uses ceil
    smaller = random.randrange(min_smaller, max_smaller + 1)
    while min(*pil_image.size) >= 2 * smaller:
        pil_image = pil_image.resize(
            tuple(x // 2 for x in pil_image.size), resample=Image.BOX
        )
    scale = smaller / min(*pil_image.size)
    pil_image = pil_image.resize(
        tuple(round(x * scale) for x in pil_image.size), resample=Image.BICUBIC
    )
    arr = np.array(pil_image)
    cy = random.randrange(arr.shape[0] - image_size + 1)
    cx = random.randrange(arr.shape[1] - image_size + 1)
    return arr[cy: cy + image_size, cx: cx + image_size]


def augment(imgs, hflip: bool = True, rotation: bool = True, return_status: bool = False):
    """hflip (h) + vflip/rot90 augmentation (utils.py:94-160)."""
    single = not isinstance(imgs, list)
    if single:
        imgs = [imgs]
    do_hflip = hflip and random.random() < 0.5
    do_vflip = rotation and random.random() < 0.5
    do_rot90 = rotation and random.random() < 0.5

    def _aug(img):
        if do_hflip:
            img = img[:, ::-1, :].copy()
        if do_vflip:
            img = img[::-1, :, :].copy()
        if do_rot90:
            img = img.transpose(1, 0, 2).copy()
        return img

    imgs = [_aug(i) for i in imgs]
    if single:
        imgs = imgs[0]
    if return_status:
        return imgs, (do_hflip, do_vflip, do_rot90)
    return imgs
