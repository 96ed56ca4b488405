from .loop import InferenceLoop
from .bsr_loop import BSRInferenceLoop
from .bfr_loop import BFRInferenceLoop
from .bid_loop import BIDInferenceLoop
from .unaligned_bfr_loop import UnAlignedBFRInferenceLoop
from .custom_loop import CustomInferenceLoop

__all__ = [
    "InferenceLoop", "BSRInferenceLoop", "BFRInferenceLoop",
    "BIDInferenceLoop", "UnAlignedBFRInferenceLoop", "CustomInferenceLoop",
]
