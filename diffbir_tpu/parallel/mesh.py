"""Device mesh + sharding utilities (the distributed backend).

The reference's distributed surface is HF accelerate -> torch.distributed ->
NCCL with exactly four collectives: allreduce(grad), allgather(metrics),
barrier, broadcast(init) (SURVEY.md §5.8; train_stage2.py:99,150,166).

TPU-native replacement: a named ``jax.sharding.Mesh`` and NamedSharding
annotations; XLA inserts the collectives (grad psum rides ICI inside the
pjit-compiled update). Axes:

- ``data``: batch sharding (DDP equivalent; the only mode the reference has)
- ``tensor``: reserved for tensor-parallel sharding of attention heads /
  conv channels on larger topologies; shardings here keep size-1 tensor axes
  working transparently.

Seeds: the reference uses per-rank seeds (set_seed(device_specific=True));
here the per-device fold-in happens naturally because the batch is split
before the rng is consumed, and explicit fold-in helpers are provided.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None, n_tensor: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_tensor
    if n_data * n_tensor != n:
        plats = sorted({d.platform for d in devices})
        raise ValueError(
            f"make_mesh: need n_data*n_tensor == len(devices) but got "
            f"{n_data}x{n_tensor} != {n} (platforms={plats}). For a virtual "
            f"multi-device run set JAX_PLATFORMS=cpu and XLA_FLAGS="
            f"--xla_force_host_platform_device_count=<n> BEFORE jax backend "
            f"init (the axon plugin ignores JAX_PLATFORMS; use "
            f"jax.config.update('jax_platforms', 'cpu'))."
        )
    arr = np.array(devices).reshape(n_data, n_tensor)
    return Mesh(arr, axis_names=("data", "tensor"))


def shard_batch(mesh: Mesh, tree):
    """Place a host pytree with the leading axis sharded over ``data``."""
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def batch_spec() -> P:
    return P("data")


def replicated_spec() -> P:
    return P()


def fold_in_axis(key: jax.Array, axis_name: str = "data") -> jax.Array:
    """Per-device seed derivation (device_specific seeds equivalent)."""
    return jax.random.fold_in(key, jax.lax.axis_index(axis_name))
