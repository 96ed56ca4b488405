"""FSDP / ZeRO-style parameter+optimizer sharding over the ``data`` axis.

The reference trains with HF accelerate DDP: every rank holds a full replica
of the 1.2B-param ControlLDM plus AdamW moments (train_stage2.py:99). On a
16 GB v5e that replica (bf16 params + fp32 controlnet grads + 2x fp32 Adam
moments) is the memory ceiling. The TPU-native fix is GSPMD weight sharding:
each param leaf is sharded along the ``data`` mesh axis; XLA all-gathers a
layer's weights right before use and reduce-scatters its gradients — the
ZeRO-3 schedule — purely from sharding annotations, no runtime code.

Composition with tensor parallelism: ``fsdp_spec`` starts from the TP spec
(parallel/tp.py) and shards the largest still-unsharded dimension that is
divisible by the data-axis size. Leaves where no dimension divides stay as
their TP spec (replicated over ``data``) — correct for any model size.

Memory per chip (stage-2 recipe, n_data=8): params 2.4 GB -> 0.3 GB,
controlnet AdamW moments 2.9 GB -> 0.36 GB.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .tp import tp_spec


def fsdp_spec(path, leaf, n_data: int, n_tensor: int = 1) -> P:
    """PartitionSpec sharding the largest free dim of ``leaf`` over ``data``,
    on top of the leaf's tensor-parallel spec."""
    base = tp_spec(path, leaf, n_tensor) if n_tensor > 1 else P()
    if getattr(leaf, "ndim", 0) == 0 or n_data <= 1:
        return base
    spec = list(base) + [None] * (leaf.ndim - len(base))
    # largest dimension that is unsharded and divisible by n_data
    order = sorted(range(leaf.ndim), key=lambda i: -leaf.shape[i])
    for i in order:
        if spec[i] is None and leaf.shape[i] % n_data == 0:
            spec[i] = "data"
            return P(*spec)
    return base


def fsdp_shard_params(mesh: Mesh, params: Any) -> Any:
    """Place a param (or optimizer-state) tree on the mesh with FSDP(+TP)
    shardings. Works for any pytree of arrays (opt-state moments get the
    same layout as their params because they have the same shapes)."""
    shardings = fsdp_sharding_tree(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def fsdp_sharding_tree(mesh: Mesh, params: Any) -> Any:
    """The NamedSharding pytree matching ``fsdp_shard_params`` placement —
    use as jit in_shardings/out_shardings so the update step keeps state
    sharded instead of gathering it."""
    n_data = mesh.shape["data"]
    n_tensor = mesh.shape.get("tensor", 1)

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = [
        NamedSharding(mesh, fsdp_spec(path, leaf, n_data, n_tensor))
        for path, leaf in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, out)
