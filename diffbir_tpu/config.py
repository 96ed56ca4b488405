"""Config system: YAML + ``target:``/``params:`` reflective instantiation.

Mirrors the behavior of the reference config layer
(/root/reference/diffbir/utils/common.py:15-26 ``instantiate_from_config``;
configs under /root/reference/configs/) but uses PyYAML instead of omegaconf
and restricts ``target`` resolution to this package plus an explicit registry,
so configs cannot execute arbitrary imports.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Dict

import yaml

# Explicit short-name registry. Configs may use either a registered short name
# ("swinir") or a dotted path rooted in diffbir_tpu ("diffbir_tpu.models.swinir.SwinIR").
_REGISTRY: Dict[str, Any] = {}


def register(name: str) -> Callable[[Any], Any]:
    """Class/function decorator adding ``name`` to the config registry."""

    def deco(obj: Any) -> Any:
        if name in _REGISTRY and _REGISTRY[name] is not obj:
            raise ValueError(f"duplicate registry name: {name}")
        _REGISTRY[name] = obj
        return obj

    return deco


def resolve(target: str) -> Any:
    """Resolve a ``target`` string to a Python object."""
    if target in _REGISTRY:
        return _REGISTRY[target]
    module_name, _, attr = target.rpartition(".")
    if not module_name:
        raise KeyError(f"unknown registry name: {target!r}")
    root = module_name.split(".", 1)[0]
    if root not in ("diffbir_tpu",):
        raise ValueError(
            f"config target {target!r} must be a registered name or live under "
            f"diffbir_tpu.*"
        )
    module = importlib.import_module(module_name)
    return getattr(module, attr)


def instantiate(cfg: Dict[str, Any], **extra: Any) -> Any:
    """Instantiate ``{"target": ..., "params": {...}}``; extra kwargs override."""
    if "target" not in cfg:
        raise KeyError(f"config has no 'target' key: {list(cfg)}")
    cls = resolve(cfg["target"])
    params = dict(cfg.get("params") or {})
    params.update(extra)
    return cls(**params)


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path, "r") as f:
        cfg = yaml.safe_load(f)
    if not isinstance(cfg, dict):
        raise ValueError(f"{path}: expected a YAML mapping, got {type(cfg).__name__}")
    return cfg


def instantiate_from_file(path: str, **extra: Any) -> Any:
    return instantiate(load_yaml(path), **extra)
