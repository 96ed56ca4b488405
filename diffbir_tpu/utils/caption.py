"""Captioners feeding prompts into the text condition.

Behavioral parity target: /root/reference/diffbir/utils/caption.py:7-171:
- EmptyCaptioner -> ""
- LLaVACaptioner (llava-v1.5-7b, "very short description" prompt)
- RAMCaptioner (RAM++ swin-L tags -> comma-joined string)

Availability is probed the same way the reference guards its imports: LLaVA
and RAM are heavyweight vendored stacks; here they are optional plug-ins
loaded from ``diffbir_tpu.captioners`` when their dependencies exist.
EmptyCaptioner is always available and is the default.
"""

from __future__ import annotations

RAM_AVAILABLE = False

try:  # pragma: no cover - heavyweight optional dep
    from ..captioners.ram import RAMCaptioner  # noqa: F401

    RAM_AVAILABLE = True
except Exception:
    pass


class Captioner:
    def __call__(self, image) -> str:  # image: PIL.Image or HWC uint8 array
        raise NotImplementedError


class EmptyCaptioner(Captioner):
    def __call__(self, image) -> str:
        return ""


def build_captioner(name: str, llava_bit: str = "4") -> Captioner:
    """``llava_bit``: "4" | "8" | "16" — quantization for the LLaVA LM
    (reference inference.py --llava_bit; default 4, matching the reference).
    TPU port: 4/8 -> int8 weight-only Pallas matmul; 16 -> bf16."""
    if name == "none":
        return EmptyCaptioner()
    if name == "ram":
        assert RAM_AVAILABLE, (
            "RAM captioner unavailable: the RAM++ port (diffbir_tpu.captioners.ram) "
            "requires its swin-L weights; set DIFFBIR_TPU_RAM_CKPT"
        )
        return RAMCaptioner()
    if name == "llava":
        import glob
        import os

        # the TPU-native port when safetensors are present (and not
        # explicitly disabled); HF-transformers host wrapper otherwise
        path = os.environ.get("DIFFBIR_TPU_LLAVA_PATH", "")
        mode = os.environ.get("DIFFBIR_TPU_LLAVA_MODE", "tpu")
        if mode != "torch" and path and glob.glob(os.path.join(path, "*.safetensors")):
            from ..captioners.llava_tpu import LLaVATPUCaptioner

            # 4 -> packed-int4 Pallas matmul (the reference's default load),
            # 8 -> int8, 16 -> bf16
            return LLaVATPUCaptioner(
                quantize=int(llava_bit) if llava_bit in ("4", "8") else False
            )
        from ..captioners.llava import LLaVACaptioner

        return LLaVACaptioner(bit=llava_bit)
    raise ValueError(f"unsupported captioner: {name}")
