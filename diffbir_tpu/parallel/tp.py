"""Tensor-parallel sharding rules for the diffusion stack.

The reference has no TP (SURVEY.md §2.11). On TPU, GSPMD lets us express TP
as pure param shardings over the ``tensor`` mesh axis and have XLA insert
the collectives (all-gather / reduce-scatter over ICI):

- attention q/k/v projections + FF in-projections: column-parallel
  (output features sharded) -> heads/hidden split across chips;
- attention out-proj + FF out-projections: row-parallel (input features
  sharded) -> XLA materializes the psum;
- conv kernels (HWIO): output-channel sharded, alternating with
  input-channel sharded for the second conv of each ResBlock;
- norms/bias/embeddings: replicated.

``tp_shard_params`` is conservative: a leaf is sharded only when the chosen
axis is divisible by the mesh's tensor size, otherwise replicated — so the
same rules work for every model size (and degrade to pure replication on a
tensor=1 mesh).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# column-parallel (shard LAST axis = output features)
_COL_SUFFIXES = ("to_q", "to_k", "to_v", "net.0/proj", "in_layers.2", "qkv",
                 "mlp.c_fc", "mlp.fc1", "emb_layers.1")
# row-parallel (shard SECOND-TO-LAST axis = input features)
_ROW_SUFFIXES = ("to_out.0", "net.2", "out_layers.3", "proj", "mlp.c_proj",
                 "mlp.fc2")


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def tp_spec(path, leaf, n_tensor: int):
    """PartitionSpec for one param leaf under tensor parallelism."""
    name = _path_str(path)
    if not name.endswith("/kernel") or leaf.ndim < 2:
        return P()
    base = name[: -len("/kernel")]
    col = any(base.endswith(s) for s in _COL_SUFFIXES)
    row = any(base.endswith(s) for s in _ROW_SUFFIXES) and not col
    if col and leaf.shape[-1] % n_tensor == 0:
        return P(*([None] * (leaf.ndim - 1) + ["tensor"]))
    if row and leaf.shape[-2] % n_tensor == 0:
        return P(*([None] * (leaf.ndim - 2) + ["tensor", None]))
    return P()


def tp_shard_params(mesh: Mesh, params: Any) -> Any:
    """Place a param tree on the mesh with TP shardings."""
    n_tensor = mesh.shape["tensor"]
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        spec = tp_spec(path, leaf, n_tensor) if n_tensor > 1 else P()
        out.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, out)
