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

import numpy as np

import jax
import jax.numpy as jnp
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


def make_tile_sharded_fn(
    fn: Callable,
    size: int,
    stride: int,
    mesh: Mesh,
    axis: str = "data",
    scale_type: str = "up",
    scale: int = 1,
    channel: int = None,
    weight: str = "gaussian",
) -> Callable:
    """Tile-SHARDED version of tiling.make_tiled_fn: the tile axis is split
    over the ``axis`` mesh dimension, each device blends its tiles into a
    local canvas, and one ``psum`` over ICI reduces the weighted canvases
    (cheaper than all-gathering per-tile outputs: the canvas is one image,
    the tile stack is overlap-redundant). 8x SR at 2396x1596 (reference
    README.md:43) maps onto a pod slice this way — every denoise-step tile
    batch is embarrassingly parallel (SURVEY.md §2.11).

    ``fn`` maps a tile batch [N, size, size, C] -> [N, out, out, C'].
    Restriction: batch 1 (the high-res single-image path).
    """
    import functools

    from jax import shard_map
    from ..tiling import gaussian_weights, sliding_windows

    assert scale_type in ("up", "down")
    sfn = (lambda n: n * scale) if scale_type == "up" else (lambda n: n // scale)
    n_dev = mesh.shape[axis]

    def tiled(x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        assert b == 1, "tile-sharded path is the single-image high-res mode"
        out_c = channel or c
        coords = sliding_windows(h, w, size, stride)
        osize = sfn(size)
        wmask = (
            gaussian_weights(osize, osize) if weight == "gaussian"
            else np.ones((osize, osize))
        )
        count = np.zeros((sfn(h), sfn(w), 1), np.float32)
        for hi, wi in coords:
            count[sfn(hi): sfn(hi) + osize, sfn(wi): sfn(wi) + osize, 0] += wmask
        # pad the tile list to a device multiple; padded tiles get weight 0
        pad = (-len(coords)) % n_dev
        valid = np.array([1.0] * len(coords) + [0.0] * pad, np.float32)
        coords_pad = coords + [coords[-1]] * pad
        tiles = jnp.concatenate(
            [x[:, hi: hi + size, wi: wi + size, :] for hi, wi in coords_pad], axis=0
        )
        coord_tab = jnp.asarray(
            np.array([(sfn(hi), sfn(wi)) for hi, wi in coords_pad], np.int32)
        )
        wmask_j = jnp.asarray(wmask[:, :, None], jnp.float32)
        assert len(coords_pad) % n_dev == 0

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=P(),
        )
        def blend(tiles_l, coords_l, valid_l):
            res = fn(tiles_l).astype(jnp.float32)  # [per_dev, osize, osize, out_c]
            canvas = jnp.zeros((sfn(h), sfn(w), out_c), jnp.float32)
            # the carry becomes device-varying after the first update; mark
            # the init as varying over the mesh axis so scan types match
            canvas = jax.lax.pvary(canvas, (axis,))

            def body(acc, inp):
                r, co, v = inp
                cur = jax.lax.dynamic_slice(
                    acc, (co[0], co[1], 0), (osize, osize, out_c)
                )
                return jax.lax.dynamic_update_slice(
                    acc, cur + r * wmask_j * v, (co[0], co[1], 0)
                ), None

            canvas, _ = jax.lax.scan(body, canvas, (res, coords_l, valid_l))
            return jax.lax.psum(canvas, axis)

        out = blend(tiles, coord_tab, jnp.asarray(valid))
        return out[None] / jnp.asarray(count)[None]

    return tiled


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


def spatial_shard(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits the image/latent HEIGHT across the mesh."""
    return NamedSharding(mesh, P(None, axis))


def spatial_parallel(fn: Callable, mesh: Mesh, axis: str = "data") -> Callable:
    """Spatial partitioning (the "sp" mode): ONE high-res image's H axis is
    sharded over the mesh and the whole diffusion forward runs partitioned —
    GSPMD inserts conv halo exchanges and attention gathers automatically,
    so, unlike tiling, the math is IDENTICAL to the single-device run (no
    overlap blending, no seam approximation) while activations (the memory
    ceiling at 2048^2+) shrink n_dev-fold per chip.

    ``fn(params, x_nhwc, ...)``: params replicated, x height-sharded.
    Use when a latent is too large for one chip's HBM but tiling's blended
    seams are undesirable; combine with tile modes for anything larger.
    """
    sp = spatial_shard(mesh, axis)

    def wrapped(params, x, *args, **kwargs):
        x = jax.lax.with_sharding_constraint(x, sp)
        out = fn(params, x, *args, **kwargs)
        return jax.lax.with_sharding_constraint(out, sp)

    return jax.jit(wrapped, out_shardings=sp)
