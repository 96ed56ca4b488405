"""Import the torch reference (read-only oracle for parity tests).

Stubs the missing optional deps (timm, ftfy, omegaconf) with minimal
equivalents so /root/reference/diffbir/model is importable with cpu torch.
Tests calling this must skip when the reference is not mounted.
"""

import os
import sys
import types


def reference_available() -> bool:
    return os.path.isdir("/root/reference/diffbir")


def load_reference_model_pkg():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    import typing

    import torch
    import torch.nn as nn

    # the reference annotates `x_size: torch.Tuple[int]` (edm_sampler.py:145);
    # modern torch has no Tuple alias — provide one for import-time eval
    if not hasattr(torch, "Tuple"):
        torch.Tuple = typing.Tuple

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")

        def to_2tuple(x):
            return x if isinstance(x, tuple) else (x, x)

        def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with __import__("torch").no_grad():
                tensor.normal_(mean, std).clamp_(a * std, b * std)
            return tensor

        class DropPath(nn.Module):
            def __init__(self, drop_prob=None):
                super().__init__()

            def forward(self, x):
                return x

        layers.to_2tuple = to_2tuple
        layers.trunc_normal_ = trunc_normal_
        layers.DropPath = DropPath
        models.layers = layers
        timm.models = models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers

    if "torchsde" not in sys.modules:
        torchsde = types.ModuleType("torchsde")

        class _BrownianTree:
            def __init__(self, *a, **k):
                raise RuntimeError("torchsde stub: SDE solvers unavailable")

        torchsde.BrownianTree = _BrownianTree
        sys.modules["torchsde"] = torchsde

    if "ftfy" not in sys.modules:
        ftfy = types.ModuleType("ftfy")
        ftfy.fix_text = lambda s: s
        sys.modules["ftfy"] = ftfy

    if "omegaconf" not in sys.modules:
        omegaconf = types.ModuleType("omegaconf")
        listconfig = types.ModuleType("omegaconf.listconfig")

        class ListConfig(list):
            pass

        listconfig.ListConfig = ListConfig
        omegaconf.listconfig = listconfig
        sys.modules["omegaconf"] = omegaconf
        sys.modules["omegaconf.listconfig"] = listconfig

    import diffbir.model as ref_model

    return ref_model


def torch_sd_to_numpy(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
