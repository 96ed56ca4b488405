"""Blind SR task loop.

Parity: /root/reference/diffbir/inference/bsr_loop.py:18-59 — v1 SwinIR
(general), v2 BSRNet, v2.1 SwinIR (realesrgan); SwinIR paths pre-upscale the
LQ by bicubic before the x1 cleaner.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from ..models.bsrnet import RRDBNet
from ..models.swinir import SwinIR
from ..pipeline import BSRNetPipeline, SwinIRPipeline
from ..weights.convert import fill_flax_params, load_torch_state_dict
from .loop import InferenceLoop, random_init_requested
from .pretrained_models import resolve_model


def load_cleaner_params(model, ckpt_name, example_shape, dtype=jnp.bfloat16):
    if random_init_requested():
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros(example_shape, jnp.float32)
        )
    else:
        sd = load_torch_state_dict(resolve_model(ckpt_name))
        shapes = jax.eval_shape(
            model.init, jax.random.PRNGKey(0), jnp.zeros(example_shape, jnp.float32)
        )
        params, missing, _ = fill_flax_params(shapes, sd, strict=True)
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, dtype) if np.asarray(x).dtype == np.float32 else jnp.asarray(x),
        params,
    )


class BSRInferenceLoop(InferenceLoop):
    def load_cleaner(self) -> None:
        dtype = self._dtype()
        if self.args.version == "v2":
            self.cleaner = RRDBNet(dtype=dtype)
            ckpt = "bsrnet"
        else:
            self.cleaner = SwinIR(dtype=dtype)
            ckpt = "swinir_general" if self.args.version == "v1" else "swinir_realesrgan"
        self.cleaner_params = load_cleaner_params(
            self.cleaner, ckpt, (1, 64, 64, 3), dtype
        )
        self.cleaner_apply = jax.jit(
            lambda x: jnp.clip(self.cleaner.apply(self.cleaner_params, x), 0.0, 1.0)
        )

    def load_pipeline(self) -> None:
        common = dict(
            cleaner_apply=self.cleaner_apply, cldm=self.cldm, params=self.params,
            schedule=self.schedule, tokenizer=self._tokenizer(), cond_fn=self.cond_fn,
        )
        if self.args.version in ("v1", "v2.1"):
            self.pipeline = SwinIRPipeline(**common)
        else:
            self.pipeline = BSRNetPipeline(upscale=self.args.upscale, **common)

    def after_load_lq(self, lq: Image.Image) -> np.ndarray:
        if self.args.version in ("v1", "v2.1"):
            lq = lq.resize(
                tuple(int(x * self.args.upscale) for x in lq.size), Image.BICUBIC
            )
        return super().after_load_lq(lq)
