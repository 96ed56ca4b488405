"""Base inference loop: model loading -> per-image restoration -> save.

Behavioral parity target: /root/reference/diffbir/inference/loop.py:30-235
(cleaner -> cldm -> cond_fn -> pipeline -> captioner load order; directory
scan; caption + user prompt concatenation; n_samples batching; PNG output +
prompt.csv audit log). Model routing per version follows loop.py:48-96.
"""

from __future__ import annotations

import csv
import os
from argparse import Namespace
from typing import Generator, List

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from ..models.cldm import ControlLDM
from ..schedule import Schedule
from ..utils.caption import build_captioner
from ..utils.cond_fn import MSEGuidance, WeightedMSEGuidance
from ..weights.convert import load_torch_state_dict
from .pretrained_models import resolve_model


def random_init_requested() -> bool:
    """DIFFBIR_TPU_RANDOM_INIT=1 runs the REAL CLI path (loops -> pipeline ->
    sampler -> PNG/prompt.csv) with random-init weights instead of
    checkpoints. Purpose: exercising the full harness (e.g. the real47
    fidelity gate, scripts/fidelity_gate.py --dryrun) in environments where
    the reference checkpoints haven't landed yet — outputs are garbage, the
    code path is the production one."""
    return os.environ.get("DIFFBIR_TPU_RANDOM_INIT") == "1"


def make_schedule_for_version(version: str) -> Schedule:
    """diffusion.yaml (v1/v2: eps) vs diffusion_v2.1.yaml (zsnr + v)."""
    if version in ("v1", "v2"):
        return Schedule.create(
            timesteps=1000, beta_schedule="linear", linear_start=0.00085,
            linear_end=0.0120, parameterization="eps", zero_snr=False,
        )
    return Schedule.create(
        timesteps=1000, beta_schedule="linear", linear_start=0.00085,
        linear_end=0.0120, parameterization="v", zero_snr=True,
    )


class InferenceLoop:
    def __init__(self, args: Namespace):
        self.args = args
        self.loop_ctx = {}
        self.pipeline = None
        self.load_cleaner()
        self.load_cldm()
        self.load_cond_fn()
        self.load_pipeline()
        self.load_captioner()

    # ------------------------------------------------------------------ #
    def load_cleaner(self) -> None:  # pragma: no cover - overridden
        raise NotImplementedError

    def load_cldm(self) -> None:
        dtype = {"fp32": jnp.float32, "bf16": jnp.bfloat16, "fp16": jnp.bfloat16}[
            getattr(self.args, "precision", "bf16")
        ]
        quant = bool(getattr(self.args, "quant_dense", False))
        fused = bool(getattr(self.args, "fused_resblock", False))
        qconv = bool(getattr(self.args, "quant_conv", False))
        if qconv and not fused:
            raise ValueError("--quant_conv requires --fused_resblock")
        self.cldm = ControlLDM.sd21(dtype=dtype, quant_dense=quant,
                                    fused_resblock=fused, quant_conv=qconv)
        # checkpoints always load through the float layout; the int8 serving
        # transforms (quantize_dense_params / quantize_conv_params) run
        # after surgery + casting
        load_cldm = (ControlLDM.sd21(dtype=dtype) if quant or qconv
                     else self.cldm)
        if random_init_requested():
            params = jax.jit(load_cldm.init_params, static_argnums=1)(
                jax.random.PRNGKey(getattr(self.args, "seed", 0)), (64, 64)
            )
        else:
            shapes = load_cldm.eval_shapes((64, 64))
            sd_key = "sd_v2.1_zsnr" if self.args.version == "v2.1" else "sd_v2.1"
            sd = load_torch_state_dict(resolve_model(sd_key))
            params = load_cldm.load_pretrained_sd(shapes, sd)
            if self.args.version == "v1":
                cn_key = {"face": "v1_face", "sr": "v1_general", "denoise": "v1_general"}.get(
                    self.args.task
                )
                if cn_key is None:
                    raise ValueError(f"DiffBIR v1 doesn't support task: {self.args.task}")
            elif self.args.version == "v2":
                cn_key = "v2"
            else:
                cn_key = "v2.1"
            cn_sd = load_torch_state_dict(resolve_model(cn_key))
            params = load_cldm.load_controlnet_from_ckpt(params, cn_sd)
        # cast to compute dtype (bf16 in production) and ship to device
        if dtype == jnp.bfloat16:
            params = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, jnp.bfloat16)
                if np.asarray(x).dtype == np.float32
                else jnp.asarray(x),
                params,
            )
        else:
            params = jax.tree_util.tree_map(jnp.asarray, params)
        if quant:
            from ..models.cldm import quantize_dense_params

            params = quantize_dense_params(params)
        if qconv:
            from ..models.cldm import quantize_conv_params

            params = quantize_conv_params(params)
        self.params = params
        self.schedule = make_schedule_for_version(self.args.version)

    def load_cond_fn(self) -> None:
        if not getattr(self.args, "guidance", False):
            self.cond_fn = None
            return
        cls = {"mse": MSEGuidance, "w_mse": WeightedMSEGuidance}[self.args.g_loss]
        self.cond_fn = cls(
            self.args.g_scale, self.args.g_start, self.args.g_stop,
            self.args.g_space, self.args.g_repeat,
        )

    def load_pipeline(self) -> None:  # pragma: no cover - overridden
        raise NotImplementedError

    def load_captioner(self) -> None:
        self.captioner = build_captioner(
            getattr(self.args, "captioner", "none"),
            llava_bit=str(getattr(self.args, "llava_bit", "4")),
        )

    # ------------------------------------------------------------------ #
    def load_lq(self) -> Generator[Image.Image, None, None]:
        img_exts = (".png", ".jpg", ".jpeg", ".bmp", ".webp")
        inp = self.args.input
        files = (
            [inp]
            if os.path.isfile(inp)
            else sorted(
                os.path.join(inp, f)
                for f in os.listdir(inp)
                if f.lower().endswith(img_exts)
            )
        )
        skip = getattr(self.args, "skip_existing", False)
        for path in files:
            stem = os.path.splitext(os.path.basename(path))[0]
            if skip and self.args.n_samples == 1 and os.path.exists(
                os.path.join(self.save_dir, f"{stem}.png")
            ):
                print(f"[loop] skip {stem} (exists)", flush=True)
                continue
            self.loop_ctx["file_stem"] = stem
            yield Image.open(path).convert("RGB")

    def after_load_lq(self, lq: Image.Image) -> np.ndarray:
        return np.array(lq)

    def _tokenizer(self):
        from ..models.tokenizer import get_tokenizer

        try:
            return get_tokenizer()
        except FileNotFoundError:
            return None

    def _dtype(self):
        import jax.numpy as jnp

        return (jnp.bfloat16
                if getattr(self.args, "precision", "bf16") != "fp32"
                else jnp.float32)

    def setup(self) -> None:
        self.save_dir = self.args.output
        os.makedirs(self.save_dir, exist_ok=True)
        self._prompts: List[tuple] = []

    def run(self) -> None:
        import time

        self.setup()
        idx = 0
        for lq in self.load_lq():
            caption = self.captioner(lq)
            pos_prompt = ", ".join(
                p for p in (caption, self.args.pos_prompt) if p
            )
            lq_arr = self.after_load_lq(lq)
            self.loop_ctx["prompt"] = pos_prompt
            n = self.args.n_samples
            bs = max(1, int(getattr(self.args, "batch_size", n) or n))
            # flushed per-image progress line BEFORE compute: a mid-run TPU
            # worker crash (r4b fidelity dry-run, 4100 s in, never attributed)
            # then names the image and its compiled-program shape
            idx += 1
            print(f"[loop] #{idx} {self.loop_ctx['file_stem']} "
                  f"lq={lq_arr.shape[0]}x{lq_arr.shape[1]}", flush=True)
            t0 = time.time()
            chunks = []
            for off in range(0, n, bs):
                chunk = np.stack([lq_arr] * min(bs, n - off))
                chunks.append(self._run_pipeline(chunk, pos_prompt, off))
            samples = np.concatenate(chunks, axis=0)
            print(f"[loop] #{idx} {self.loop_ctx['file_stem']} done "
                  f"out={samples.shape[1]}x{samples.shape[2]} "
                  f"{time.time() - t0:.1f}s", flush=True)
            for i in range(samples.shape[0]):
                self.save(Image.fromarray(samples[i]), i)
        self.write_prompt_log()

    def _run_pipeline(self, batch, pos_prompt, seed_offset=0):
        return self.pipeline.run(
                batch,
                steps=self.args.steps,
                strength=self.args.strength,
                pos_prompt=pos_prompt,
                neg_prompt=self.args.neg_prompt,
                cfg_scale=self.args.cfg_scale,
                start_point_type=self.args.start_point_type,
                sampler_type=self.args.sampler,
                noise_aug=self.args.noise_aug,
                rescale_cfg=self.args.rescale_cfg,
                cleaner_tiled=self.args.cleaner_tiled,
                cleaner_tile_size=self.args.cleaner_tile_size,
                cleaner_tile_stride=self.args.cleaner_tile_stride,
                vae_encoder_tiled=getattr(self.args, "vae_encoder_tiled", False),
                vae_encoder_tile_size=getattr(self.args, "vae_encoder_tile_size", 256),
                vae_decoder_tiled=getattr(self.args, "vae_decoder_tiled", False),
                vae_decoder_tile_size=getattr(self.args, "vae_decoder_tile_size", 256),
                vae_tile_mode=getattr(self.args, "vae_tile_mode", "blend"),
                cldm_tiled=getattr(self.args, "cldm_tiled", False),
                cldm_tile_size=getattr(self.args, "cldm_tile_size", 512),
                cldm_tile_stride=getattr(self.args, "cldm_tile_stride", 256),
                cldm_tiles_per_batch=getattr(self.args, "cldm_tiles_per_batch", 1),
                control_interval=getattr(self.args, "control_interval", 1),
                turbo_encoder=getattr(self.args, "turbo_encoder", False),
                size_bucket=getattr(self.args, "size_bucket", 0),
                # advance the seed per chunk so n_samples > batch_size yields
                # distinct samples (torch's global RNG advances implicitly)
                seed=self.args.seed + seed_offset,
                eta=getattr(self.args, "eta", 0.0),
                s_churn=getattr(self.args, "s_churn", 0.0),
                s_tmin=getattr(self.args, "s_tmin", 0.0),
                s_tmax=getattr(self.args, "s_tmax", 300.0),
                s_noise=getattr(self.args, "s_noise", 1.0),
                order=getattr(self.args, "order", 1),
            )

    def save(self, img: Image.Image, sample_idx: int) -> None:
        stem = self.loop_ctx["file_stem"]
        name = f"{stem}_{sample_idx}.png" if self.args.n_samples > 1 else f"{stem}.png"
        img.save(os.path.join(self.save_dir, name))
        self._prompts.append((name, self.loop_ctx.get("prompt", "")))
        self.write_prompt_log()  # incremental: a mid-run crash keeps the log

    def write_prompt_log(self) -> None:
        """(file_name, pos_prompt, neg_prompt) per saved sample — the
        reference appends per image (loop.py:215-235); rewritten on every
        save so partial runs keep an audit log."""
        neg = getattr(self.args, "neg_prompt", "")
        with open(os.path.join(self.save_dir, "prompt.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["file_name", "prompt", "neg_prompt"])
            w.writerows([(n, p, neg) for n, p in self._prompts])
