# import for registry side effects
from . import file_backend  # noqa: F401
from .batch_transform import IdentityBatchTransform, RealESRGANBatchTransform
from .codeformer import CodeformerDataset
from .realesrgan import RealESRGANDataset

__all__ = [
    "CodeformerDataset",
    "RealESRGANDataset",
    "RealESRGANBatchTransform",
    "IdentityBatchTransform",
]
