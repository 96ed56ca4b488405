"""Blind face restoration (aligned) task loop.

Parity: /root/reference/diffbir/inference/bfr_loop.py:15-34 — face SwinIR
cleaner for every version; bicubic pre-upscale.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from ..models.swinir import SwinIR
from ..pipeline import SwinIRPipeline
from .bsr_loop import load_cleaner_params
from .loop import InferenceLoop


class BFRInferenceLoop(InferenceLoop):
    def load_cleaner(self) -> None:
        dtype = self._dtype()
        self.cleaner = SwinIR(dtype=dtype)
        self.cleaner_params = load_cleaner_params(
            self.cleaner, "swinir_face", (1, 64, 64, 3), dtype
        )
        self.cleaner_apply = jax.jit(
            lambda x: jnp.clip(self.cleaner.apply(self.cleaner_params, x), 0.0, 1.0)
        )

    def load_pipeline(self) -> None:
        tok = self._tokenizer()
        self.pipeline = SwinIRPipeline(
            cleaner_apply=self.cleaner_apply, cldm=self.cldm, params=self.params,
            schedule=self.schedule, tokenizer=tok, cond_fn=self.cond_fn,
        )

    def after_load_lq(self, lq: Image.Image) -> np.ndarray:
        lq = lq.resize(
            tuple(int(x * self.args.upscale) for x in lq.size), Image.BICUBIC
        )
        return super().after_load_lq(lq)
