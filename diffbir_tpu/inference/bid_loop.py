"""Blind image denoising task loop.

Parity: /root/reference/diffbir/inference/bid_loop.py:18-52 — v1 SwinIR
(general), v2 SCUNet-PSNR, v2.1 SwinIR (realesrgan).
"""

from __future__ import annotations

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from ..models.scunet import SCUNet
from ..models.swinir import SwinIR
from ..pipeline import SCUNetPipeline, SwinIRPipeline
from .bsr_loop import load_cleaner_params
from .loop import InferenceLoop


class BIDInferenceLoop(InferenceLoop):
    def load_cleaner(self) -> None:
        dtype = self._dtype()
        if self.args.version == "v2":
            self.cleaner = SCUNet(dtype=dtype)
            ckpt = "scunet_psnr"
        else:
            self.cleaner = SwinIR(dtype=dtype)
            ckpt = "swinir_general" if self.args.version == "v1" else "swinir_realesrgan"
        self.cleaner_params = load_cleaner_params(self.cleaner, ckpt, (1, 64, 64, 3), dtype)
        self.cleaner_apply = jax.jit(
            lambda x: jnp.clip(self.cleaner.apply(self.cleaner_params, x), 0.0, 1.0)
        )

    def load_pipeline(self) -> None:
        tok = self._tokenizer()
        cls = SwinIRPipeline if self.args.version in ("v1", "v2.1") else SCUNetPipeline
        self.pipeline = cls(
            cleaner_apply=self.cleaner_apply, cldm=self.cldm, params=self.params,
            schedule=self.schedule, tokenizer=tok, cond_fn=self.cond_fn,
        )

    def after_load_lq(self, lq: Image.Image) -> np.ndarray:
        lq = lq.resize(
            tuple(int(x * self.args.upscale) for x in lq.size), Image.BICUBIC
        )
        return super().after_load_lq(lq)
