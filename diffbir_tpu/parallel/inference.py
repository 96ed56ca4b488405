"""Multi-chip inference sharding.

The reference is single-GPU at inference (SURVEY.md §3.1: all model math on
one device). TPU-native scaling modes offered here:

1. **Batch-parallel restoration** (the production serving mode): shard the
   image batch over the ``data`` mesh axis; params replicated. XLA runs every
   chip independently — restoring N images costs one image's latency.

2. **Tile-parallel diffusion** (SURVEY.md §2.11 suggestion): at high
   resolution the tiled sampler processes T latent tiles per denoise step;
   tiles are batched (tiling.py) and the tile batch is sharded over ``data``.
   Collectives: none inside the model; the Gaussian scatter-add blend runs
   replicated after an implicit all-gather of tile outputs.

Both are pure sharding annotations — the model code is unchanged.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_for_batch_parallel(mesh: Mesh, params, batch_tree):
    """Replicate params, shard the batch leading axis over ``data``."""
    params = jax.device_put(params, NamedSharding(mesh, P()))
    batch_tree = jax.device_put(batch_tree, NamedSharding(mesh, P("data")))
    return params, batch_tree


def batch_parallel(fn: Callable, mesh: Mesh) -> Callable:
    """Wrap a jitted restore fn so outputs stay batch-sharded on the mesh."""
    out_sharding = NamedSharding(mesh, P("data"))
    return jax.jit(fn, out_shardings=out_sharding)


def tile_parallel_model_fn(model_fn: Callable, mesh: Mesh) -> Callable:
    """Constrain the tile-batch axis of a diffusion model call to ``data``.

    Use as the ``fn`` handed to tiling.make_tiled_fn with
    ``tiles_per_batch >= mesh.shape['data']`` so each chip gets whole tiles.
    """
    sharding = NamedSharding(mesh, P("data"))

    def wrapped(x_tiles, *args, **kwargs):
        x_tiles = jax.lax.with_sharding_constraint(x_tiles, sharding)
        out = model_fn(x_tiles, *args, **kwargs)
        return jax.lax.with_sharding_constraint(out, sharding)

    if hasattr(model_fn, "tile_kwargs"):
        wrapped.tile_kwargs = model_fn.tile_kwargs
    return wrapped
