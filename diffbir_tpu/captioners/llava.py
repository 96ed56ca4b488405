"""LLaVA captioner via HF transformers (host-side preprocessing stage).

Behavioral parity target: /root/reference/diffbir/utils/caption.py:122-149
(llava-v1.5-7b, fixed prompt "Provide a very short description of this
photo.", 4/8/16-bit loading via bitsandbytes).

TPU deployment note: the reference runs the 7B LM on the same GPU as the
diffusion stack; here captioning is a host/sidecar stage. This wrapper uses
``transformers`` (LlavaForConditionalGeneration) from a LOCAL model directory
(``DIFFBIR_TPU_LLAVA_PATH``) on CPU or any torch device — bitsandbytes
quantization applies when installed. A TPU-resident LLaVA port is future
work; the reference itself treats llava as optional (guarded imports).
"""

from __future__ import annotations

import os
from typing import Optional

from PIL import Image

PROMPT = "Provide a very short description of this photo."


class LLaVACaptioner:
    def __init__(
        self,
        model_path: Optional[str] = None,
        bit: str = "16",
        device: str = "cpu",
        max_new_tokens: int = 60,
    ):
        model_path = model_path or os.environ.get("DIFFBIR_TPU_LLAVA_PATH")
        if not model_path:
            raise FileNotFoundError(
                "set DIFFBIR_TPU_LLAVA_PATH to a local llava-1.5 model directory"
            )
        import torch
        from transformers import AutoProcessor, LlavaForConditionalGeneration

        kwargs = {}
        if bit in ("4", "8"):
            try:
                from transformers import BitsAndBytesConfig

                kwargs["quantization_config"] = BitsAndBytesConfig(
                    load_in_4bit=(bit == "4"), load_in_8bit=(bit == "8")
                )
            except Exception:
                print("bitsandbytes unavailable; loading fp16")
        self.processor = AutoProcessor.from_pretrained(model_path)
        self.model = LlavaForConditionalGeneration.from_pretrained(
            model_path, torch_dtype=torch.float16 if device != "cpu" else torch.float32,
            **kwargs,
        ).to(device)
        self.device = device
        self.max_new_tokens = max_new_tokens

    def __call__(self, image: Image.Image) -> str:
        prompt = f"USER: <image>\n{PROMPT} ASSISTANT:"
        inputs = self.processor(
            images=image.convert("RGB"), text=prompt, return_tensors="pt"
        ).to(self.device)
        import torch

        with torch.no_grad():
            out = self.model.generate(**inputs, max_new_tokens=self.max_new_tokens)
        text = self.processor.batch_decode(out, skip_special_tokens=True)[0]
        return text.split("ASSISTANT:")[-1].strip()
