"""Validation metrics + prompt rendering for logging.

Reference equivalents: PSNR (utils/common.py:359-390 — see utils.common.psnr),
LPIPS(alex) used in stage-1 val (train_stage1.py:91-95; optional here, gated
on the lpips package), prompt-to-image grids (utils/common.py:283-307).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
from PIL import Image, ImageDraw

from .common import psnr  # noqa: F401  (canonical PSNR lives in common)

_LPIPS = None


def lpips_available() -> bool:
    try:
        import lpips  # noqa: F401

        return True
    except ImportError:
        return False


def lpips_alex(a: np.ndarray, b: np.ndarray) -> Optional[np.ndarray]:
    """LPIPS(alex) on [0,1] NHWC batches; None if the package is missing."""
    global _LPIPS
    try:
        import lpips
        import torch
    except ImportError:
        return None
    if _LPIPS is None:
        _LPIPS = lpips.LPIPS(net="alex")
    ta = torch.from_numpy(np.transpose(a, (0, 3, 1, 2))).float() * 2 - 1
    tb = torch.from_numpy(np.transpose(b, (0, 3, 1, 2))).float() * 2 - 1
    with torch.no_grad():
        return _LPIPS(ta, tb).numpy().reshape(-1)


def log_txt_as_img(wh, prompts: List[str]) -> np.ndarray:
    """Render prompts onto white canvases for TB image grids ([B,H,W,3] u8)."""
    w, h = wh
    out = []
    for text in prompts:
        img = Image.new("RGB", (w, h), "white")
        draw = ImageDraw.Draw(img)
        nc = max(1, int(40 * (w / 256)))
        lines = "\n".join(text[i: i + nc] for i in range(0, len(text), nc))
        draw.text((0, 0), lines, fill="black")
        out.append(np.array(img))
    return np.stack(out)
