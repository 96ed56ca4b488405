"""Torch checkpoint → flax param-tree conversion.

The reference loads Stable Diffusion weights by key-prefix surgery
(/root/reference/diffbir/model/cldm.py:33-62 ``module_map``: unet ←
``model.diffusion_model``, vae ← ``first_stage_model``, clip ←
``cond_stage_model``) and strips ``module.`` prefixes
(/root/reference/diffbir/utils/common.py:113-120). This module does the same
surgery into flax pytrees.

Because every flax module name equals its torch key fragment, a flax leaf
path joined with '.' is exactly the torch key prefix; only the leaf name and
the tensor layout change:

- ``kernel``  ← ``weight``: conv OIHW→HWIO, linear (O,I)→(I,O)
- ``scale``   ← ``weight`` (norm layers, rank 1)
- ``embedding`` ← ``weight`` (nn.Embed)
- raw params keep their name (``in_proj_weight`` is transposed (3d,d)→(d,3d))
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

# torch is CPU-only in this image and used solely for deserialization.


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.ckpt/.pt/.safetensors file into a numpy dict.

    Unwraps ``state_dict`` nesting and strips ``module.`` prefixes, matching
    reference utils/common.py:113-120.
    """
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = dict(load_file(path))
    else:
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=True)
        if "state_dict" in obj:
            obj = obj["state_dict"]
        sd = {}
        for k, v in obj.items():
            if isinstance(v, torch.Tensor):
                sd[k] = v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v
    return out


def _flax_leaf_to_torch_key(path: Tuple[str, ...]) -> Tuple[str, bool]:
    """(flax path) -> (torch key, needs_transpose_by_rank)."""
    *mods, leaf = path
    prefix = ".".join(mods)
    if leaf == "kernel":
        return (f"{prefix}.weight", True)
    if leaf == "scale":
        return (f"{prefix}.weight", False)
    if leaf == "embedding":
        return (f"{prefix}.weight", False)
    if leaf == "in_proj_weight":
        return (f"{prefix}.{leaf}" if prefix else leaf, True)
    return (f"{prefix}.{leaf}" if prefix else leaf, False)


def _convert_value(v: np.ndarray, transpose: bool, target_shape) -> np.ndarray:
    orig = v
    if transpose:
        if v.ndim == 4:  # conv OIHW -> HWIO
            v = v.transpose(2, 3, 1, 0)
            if tuple(v.shape) != tuple(target_shape):
                # ConvTranspose fallback for flax DEFAULT layout (no
                # transpose_kernel): torch (I,O,kh,kw) -> (kh,kw,I,O) WITH
                # the spatial flip torch's cross-correlation implies.
                # All current ConvTranspose sites (scunet) use
                # transpose_kernel=True and are handled by the first branch;
                # when in/out channels are equal both layouts shape-match,
                # so refuse the ambiguous silent fallback.
                if orig.shape[0] == orig.shape[1]:
                    raise ValueError(
                        "ambiguous ConvTranspose layout (in_ch == out_ch): "
                        "use transpose_kernel=True in the flax module"
                    )
                v = orig.transpose(2, 3, 0, 1)[::-1, ::-1]
        elif v.ndim == 2:  # linear (O,I) -> (I,O)
            v = v.T
    if tuple(v.shape) != tuple(target_shape):
        raise ValueError(f"shape mismatch: got {v.shape}, want {tuple(target_shape)}")
    return v


def fill_flax_params(
    flax_params: Any,
    torch_sd: Mapping[str, np.ndarray],
    prefix: str = "",
    strict: bool = True,
) -> Tuple[Any, set, set]:
    """Produce a param tree shaped like ``flax_params`` with torch values.

    ``prefix`` is prepended to every generated torch key (module_map surgery).
    Returns (params, missing_torch_keys, used_torch_keys).
    """
    import jax

    flat = jax.tree_util.tree_flatten_with_path(flax_params)
    leaves, treedef = flat
    missing, used = set(), set()
    new_leaves = []
    for path, leaf in leaves:
        keys = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        # drop the top-level 'params' collection key
        if keys and keys[0] == "params":
            keys = keys[1:]
        tkey, transpose = _flax_leaf_to_torch_key(keys)
        tkey = prefix + tkey
        if tkey in torch_sd:
            v = _convert_value(np.asarray(torch_sd[tkey]), transpose, leaf.shape)
            tgt_dtype = getattr(leaf, "dtype", None) or np.float32
            new_leaves.append(v.astype(tgt_dtype))
            used.add(tkey)
        else:
            missing.add(tkey)
            if strict:
                raise KeyError(f"torch key not found: {tkey}")
            # leaf may be an abstract eval_shape value — materialize zeros so
            # non-strict loads always yield concrete arrays
            if isinstance(leaf, jax.ShapeDtypeStruct):
                new_leaves.append(np.zeros(leaf.shape, leaf.dtype))
            else:
                new_leaves.append(leaf)
    params = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return params, missing, used


SD_MODULE_MAP = {
    "unet": "model.diffusion_model.",
    "vae": "first_stage_model.",
    # FrozenOpenCLIPEmbedder wraps open_clip.CLIP as ``self.model``
    "clip": "cond_stage_model.model.",
}


def flax_to_torch_state_dict(params: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    """Inverse conversion: flax param tree -> torch-layout state dict.

    Lets checkpoints trained here (e.g. the ControlNet subtree) be exported
    for users of the torch reference. Layout rules are the exact inverse of
    ``fill_flax_params``.
    """
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out: Dict[str, np.ndarray] = {}
    for path, leaf in flat:
        keys = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
        if keys and keys[0] == "params":
            keys = keys[1:]
        tkey, transpose = _flax_leaf_to_torch_key(keys)
        v = np.asarray(leaf, dtype=np.float32)
        if transpose:
            if v.ndim == 4:  # HWIO -> OIHW
                v = v.transpose(3, 2, 0, 1)
            elif v.ndim == 2:
                v = v.T
        out[prefix + tkey] = v
    return out


def save_torch_checkpoint(sd: Mapping[str, np.ndarray], path: str) -> None:
    import torch

    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path)
