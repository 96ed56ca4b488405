"""Unaligned blind face restoration: detect -> per-face restore -> paste back.

Behavioral parity target:
/root/reference/diffbir/inference/unaligned_bfr_loop.py:23-199 — upscale the
whole image, detect + align each face to a 512^2 crop, restore faces with the
face pipeline and the background with the background pipeline, then inverse
affine + soft-mask paste-back.
"""

from __future__ import annotations

import os
from typing import Generator

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from ..models.bsrnet import RRDBNet
from ..models.swinir import SwinIR
from ..pipeline import BSRNetPipeline, SwinIRPipeline
from ..utils.face import FaceRestoreHelper
from .bsr_loop import load_cleaner_params
from .loop import InferenceLoop


class UnAlignedBFRInferenceLoop(InferenceLoop):
    def load_cleaner(self) -> None:
        dtype = self._dtype()
        # background cleaner (per version) + face cleaner (always face SwinIR)
        if self.args.version == "v2":
            self.bg_cleaner = RRDBNet(dtype=dtype)
            bg_ckpt = "bsrnet"
        else:
            self.bg_cleaner = SwinIR(dtype=dtype)
            bg_ckpt = "swinir_general" if self.args.version == "v1" else "swinir_realesrgan"
        self.face_cleaner = SwinIR(dtype=dtype)
        self.bg_params = load_cleaner_params(self.bg_cleaner, bg_ckpt, (1, 64, 64, 3), dtype)
        self.face_params = load_cleaner_params(self.face_cleaner, "swinir_face", (1, 64, 64, 3), dtype)
        self.bg_apply = jax.jit(
            lambda x: jnp.clip(self.bg_cleaner.apply(self.bg_params, x), 0.0, 1.0)
        )
        self.face_apply = jax.jit(
            lambda x: jnp.clip(self.face_cleaner.apply(self.face_params, x), 0.0, 1.0)
        )

    def load_pipeline(self) -> None:
        from ..models.tokenizer import get_tokenizer

        try:
            tok = get_tokenizer()
        except FileNotFoundError:
            tok = None
        common = dict(cldm=self.cldm, params=self.params, schedule=self.schedule,
                      tokenizer=tok, cond_fn=self.cond_fn)
        face_pipe = SwinIRPipeline(cleaner_apply=self.face_apply, **common)
        if self.args.version == "v2":
            bg_pipe = BSRNetPipeline(
                cleaner_apply=self.bg_apply, upscale=self.args.upscale, **common
            )
        else:
            bg_pipe = SwinIRPipeline(cleaner_apply=self.bg_apply, **common)
        self.pipeline_dict = {"face": face_pipe, "background": bg_pipe}
        self.pipeline = face_pipe

    def setup(self) -> None:
        super().setup()
        self.cropped_face_dir = os.path.join(self.save_dir, "cropped_faces")
        self.restored_face_dir = os.path.join(self.save_dir, "restored_faces")
        self.restored_bg_dir = os.path.join(self.save_dir, "restored_backgrounds")
        for d in (self.cropped_face_dir, self.restored_face_dir, self.restored_bg_dir):
            os.makedirs(d, exist_ok=True)

    def load_lq(self) -> Generator[Image.Image, None, None]:
        # for each input image: yield every aligned face crop then the background
        for lq in super().load_lq():
            file_stem = self.loop_ctx["file_stem"]
            upscaled = lq.resize(
                tuple(int(s * self.args.upscale) for s in lq.size), Image.BICUBIC
            )
            if not hasattr(self, "_face_parser"):
                from ..utils.face import load_jax_parser

                self._face_parser = load_jax_parser()  # None when no weights
            helper = FaceRestoreHelper(
                upscale_factor=1.0, face_size=512, face_parser=self._face_parser
            )
            helper.read_image(np.array(upscaled))
            n = helper.get_face_landmarks_5(resize=640)
            helper.align_warp_face()
            print(f"detected {n} faces in {file_stem}")
            self._helper = helper
            # face_samples[face_idx][sample_idx] — paired per sample at paste
            # time (reference unaligned_bfr_loop.py:177-199 transposes)
            self._face_samples = {}
            for i, face in enumerate(helper.cropped_faces):
                Image.fromarray(face).save(
                    os.path.join(self.cropped_face_dir, f"{file_stem}_face{i}.png")
                )
                self.loop_ctx.update(is_face=True, face_idx=i, file_stem=file_stem)
                yield Image.fromarray(face)
            self.loop_ctx.update(is_face=False, file_stem=file_stem)
            # v2's BSRNetPipeline upscales internally (bg_requires_upscale is
            # False in the reference) — feed the ORIGINAL lq to avoid running
            # the cleaner+diffusion at upscale^2 the pixel count
            yield lq if self.args.version == "v2" else upscaled

    def after_load_lq(self, lq: Image.Image) -> np.ndarray:
        self.pipeline = (
            self.pipeline_dict["face"]
            if self.loop_ctx["is_face"]
            else self.pipeline_dict["background"]
        )
        return np.array(lq)

    def save(self, img: Image.Image, sample_idx: int) -> None:
        stem = self.loop_ctx["file_stem"]
        if self.loop_ctx["is_face"]:
            idx = self.loop_ctx["face_idx"]
            name = f"{stem}_face{idx}_{sample_idx}.png"
            img.save(os.path.join(self.restored_face_dir, name))
            self._face_samples.setdefault(idx, {})[sample_idx] = np.array(img)
            self._prompts.append((name, self.loop_ctx.get("prompt", "")))
        else:
            img.save(os.path.join(self.restored_bg_dir, f"{stem}_{sample_idx}.png"))
            helper = self._helper
            if not helper.inverse_affine_matrices:
                helper.get_inverse_affine()
            # pair THIS background sample with the same-index face samples
            helper.restored_faces = [
                self._face_samples[f][sample_idx]
                for f in sorted(self._face_samples)
            ]
            merged = helper.paste_faces_to_input_image(np.array(img))
            out = Image.fromarray(merged)
            name = f"{stem}_{sample_idx}.png" if self.args.n_samples > 1 else f"{stem}.png"
            out.save(os.path.join(self.save_dir, name))
            self._prompts.append((name, self.loop_ctx.get("prompt", "")))
