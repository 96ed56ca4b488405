from .base import Sampler, cfg_model_call
from .spaced import SpacedSampler
from .ddim import DDIMSampler

__all__ = ["Sampler", "cfg_model_call", "SpacedSampler", "DDIMSampler"]
