"""TPU-native LLaVA-1.5 captioner (flax/JAX forward, int8 Pallas matmuls).

Behavioral parity target: /root/reference/diffbir/utils/caption.py:84-149
(llava-v1.5-7b, the llava_v1 conversation template around the question
"Please give me a very short description of this image.", greedy
generation) and the vendored llava/ stack it drives. The reference
quantizes with bitsandbytes (llava/model/builder.py:26-80); here the LM's
linears run int8 weight-only through ops/quant_matmul.py and the whole
caption (vision tower -> projector -> prefill -> lax.scan greedy decode with
a KV cache) is ONE jitted program per (prompt, max_new_tokens) config.

Host side: the llama tokenizer (HF ``transformers``, CPU-only use) and CLIP
image preprocessing (resize + center-crop + normalize).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import numpy as np
from PIL import Image

# reference caption.py:84 question + llava_v1 template (llava/conversation.py
# conv_llava_v1: system preamble, sep " ", roles USER/ASSISTANT)
QUESTION = "Please give me a very short description of this image."
SYSTEM = (
    "A chat between a curious human and an artificial intelligence assistant. "
    "The assistant gives helpful, detailed, and polite answers to the human's "
    "questions."
)
PROMPT = QUESTION  # retained name for back-compat imports
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_preprocess(image: Image.Image, size: int) -> np.ndarray:
    """HF CLIPImageProcessor: bicubic resize (short edge) + center crop +
    normalize. Returns [size, size, 3] float32."""
    w, h = image.size
    scale = size / min(w, h)
    image = image.convert("RGB").resize(
        (max(size, round(w * scale)), max(size, round(h * scale))), Image.BICUBIC
    )
    w, h = image.size
    left, top = (w - size) // 2, (h - size) // 2
    image = image.crop((left, top, left + size, top + size))
    x = np.asarray(image, np.float32) / 255.0
    return (x - CLIP_MEAN) / CLIP_STD


class LLaVATPUCaptioner:
    def __init__(
        self,
        model_path: Optional[str] = None,
        max_new_tokens: int = 60,
        quantize=True,  # 4 / 8 / True(int8) / False(bf16)
    ):
        model_path = model_path or os.environ.get("DIFFBIR_TPU_LLAVA_PATH")
        if not model_path or not os.path.isdir(model_path):
            raise FileNotFoundError(
                "set DIFFBIR_TPU_LLAVA_PATH to a local llava-1.5-hf model dir "
                "(safetensors + tokenizer files)"
            )
        import jax
        import jax.numpy as jnp
        from transformers import AutoTokenizer

        from ..models import llava as L

        self.tokenizer = AutoTokenizer.from_pretrained(model_path)
        llama, vision, projector, (cfg, vcfg) = L.load_llava_params(
            model_path, quantize=quantize
        )
        self.cfg, self.vcfg = cfg, vcfg
        self.max_new_tokens = max_new_tokens
        self.eos_id = int(self.tokenizer.eos_token_id)

        # conv_llava_v1.get_prompt() with one USER turn containing <image>:
        # system + " " + "USER: <image>\n<question>" + " " + "ASSISTANT:"
        prompt = f"{SYSTEM} USER: <image>\n{QUESTION} ASSISTANT:"
        pre_txt, post_txt = prompt.split("<image>")
        pre_ids = self.tokenizer(pre_txt, return_tensors="np").input_ids[0]
        post_ids = self.tokenizer(
            post_txt, return_tensors="np", add_special_tokens=False
        ).input_ids[0]
        self._pre = jnp.asarray(pre_ids.astype(np.int32))[None]
        self._post = jnp.asarray(post_ids.astype(np.int32))[None]

        @functools.partial(jax.jit, static_argnums=())
        def caption_fn(image):
            feats = L.clip_vision_features(vision, vcfg, image[None])
            img_embeds = L.project_image_features(projector, feats)
            tok_embed = llama["embed_tokens"]["weight"]
            embeds = jnp.concatenate(
                [
                    jnp.take(tok_embed, self._pre[0], axis=0)[None],
                    img_embeds.astype(tok_embed.dtype),
                    jnp.take(tok_embed, self._post[0], axis=0)[None],
                ],
                axis=1,
            )
            return L.greedy_decode(
                llama, cfg, embeds, max_new_tokens, self.eos_id
            )

        self._caption_fn = caption_fn

    def __call__(self, image: Image.Image) -> str:
        import jax.numpy as jnp

        x = jnp.asarray(clip_preprocess(image, self.vcfg.image_size))
        tokens = np.asarray(self._caption_fn(x))[0]
        eos = np.nonzero(tokens == self.eos_id)[0]
        if len(eos):
            tokens = tokens[: eos[0]]
        return self.tokenizer.decode(tokens, skip_special_tokens=True).strip()
