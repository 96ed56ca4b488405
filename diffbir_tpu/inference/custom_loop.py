"""Custom-model inference loop: user train-config + checkpoint.

Behavioral parity target: /root/reference/diffbir/inference/custom_loop.py:20-93
— instead of the version registry, load the cleaner/cldm settings from a
training YAML and the ControlNet weights from a user checkpoint (orbax dir or
torch file).
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from .. import config as cfglib
from ..models.cldm import ControlLDM
from ..pipeline import SwinIRPipeline
from ..weights.convert import load_torch_state_dict
from .loop import InferenceLoop
from .pretrained_models import resolve_model


class CustomInferenceLoop(InferenceLoop):
    def __init__(self, args):
        self.train_cfg = cfglib.load_yaml(args.train_cfg)
        super().__init__(args)

    def load_cleaner(self) -> None:
        dtype = self._dtype()
        cleaner_cfg = self.train_cfg["model"]["swinir"]
        self.cleaner = cfglib.instantiate(cleaner_cfg, dtype=dtype)
        from .bsr_loop import load_cleaner_params

        ckpt = self.train_cfg["train"].get("swinir_path") or cleaner_cfg.get("ckpt")
        self.cleaner_params = load_cleaner_params(self.cleaner, ckpt, (1, 64, 64, 3), dtype)
        self.cleaner_apply = jax.jit(
            lambda x: jnp.clip(self.cleaner.apply(self.cleaner_params, x), 0.0, 1.0)
        )

    def load_cldm(self) -> None:
        dtype = self._dtype()
        quant = bool(getattr(self.args, "quant_dense", False))
        fused = bool(getattr(self.args, "fused_resblock", False))
        qconv = bool(getattr(self.args, "quant_conv", False))
        if qconv and not fused:
            raise ValueError("--quant_conv requires --fused_resblock")
        self.cldm = ControlLDM.sd21(dtype=dtype, quant_dense=quant,
                                    fused_resblock=fused, quant_conv=qconv)
        # checkpoints load through the float layout (see loop.py)
        load_cldm = (ControlLDM.sd21(dtype=dtype) if quant or qconv
                     else self.cldm)
        shapes = load_cldm.eval_shapes((64, 64))
        sd = load_torch_state_dict(resolve_model(self.train_cfg["train"]["sd_path"]))
        params = load_cldm.load_pretrained_sd(shapes, sd)

        ckpt = self.args.ckpt
        if os.path.isdir(ckpt):  # orbax checkpoint from train_stage2.py
            import orbax.checkpoint as ocp

            restored = ocp.StandardCheckpointer().restore(os.path.abspath(ckpt))
            params = {**params, "controlnet": restored["controlnet"]}
        else:
            cn_sd = load_torch_state_dict(ckpt)
            params = load_cldm.load_controlnet_from_ckpt(params, cn_sd)
        if dtype == jnp.bfloat16:
            params = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, jnp.bfloat16)
                if np.asarray(x).dtype == np.float32 else jnp.asarray(x),
                params,
            )
        if quant:
            from ..models.cldm import quantize_dense_params

            params = quantize_dense_params(params)
        if qconv:
            from ..models.cldm import quantize_conv_params

            params = quantize_conv_params(params)
        self.params = params
        # honor the train config's EXPLICIT keys — inferring from zero_snr
        # alone mis-decodes e.g. (parameterization=v, zero_snr=false)
        from ..schedule import Schedule

        mcfg = self.train_cfg["model"]
        self.schedule = Schedule.create(
            timesteps=1000, beta_schedule="linear",
            linear_start=0.00085, linear_end=0.0120,
            parameterization=mcfg.get("parameterization", "eps"),
            zero_snr=bool(mcfg.get("zero_snr", False)),
        )

    def load_pipeline(self) -> None:
        self.pipeline = SwinIRPipeline(
            cleaner_apply=self.cleaner_apply, cldm=self.cldm, params=self.params,
            schedule=self.schedule, tokenizer=self._tokenizer(),
            cond_fn=self.cond_fn,
        )

    def after_load_lq(self, lq):
        # SwinIRPipeline is x1 — pre-upscale like the reference custom loop
        # (custom_loop.py:88-93), otherwise --upscale is silently ignored
        from PIL import Image as PILImage

        lq = lq.resize(
            tuple(int(x * self.args.upscale) for x in lq.size), PILImage.BICUBIC
        )
        return super().after_load_lq(lq)
