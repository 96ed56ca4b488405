"""Spatial tiling: the resolution-scaling subsystem (SURVEY.md §5.7).

Behavioral parity target: ``make_tiled_fn`` + ``gaussian_weights`` +
``sliding_windows`` (/root/reference/diffbir/utils/common.py:123-232):
sliding windows with Gaussian-weighted overlap blending
(mixture-of-diffusers style), up/down output scaling, and synchronized
slicing of auxiliary inputs (the diffusion hint latent).

TPU-first redesign: the reference loops tiles one-by-one and monkey-patches
``model.forward``. Here tiling is a pure wrapper transform over an apply
function:
- tile coordinates are static (host-computed), so extraction is static
  slicing and the accumulation is an unrolled scatter-add that XLA fuses;
- tiles are stacked on a new leading axis and processed in chunks of
  ``tiles_per_batch`` through ONE batched call (MXU-friendly), instead of
  T sequential model calls;
- the overlap-count normalizer is a host-side constant (it depends only on
  geometry, not data).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def sliding_windows(h: int, w: int, size: int, stride: int) -> List[Tuple[int, int]]:
    """Top-left corners covering an (h, w) canvas (common.py:123-138)."""
    his = list(range(0, h - size + 1, stride))
    if (h - size) % stride != 0:
        his.append(h - size)
    wis = list(range(0, w - size + 1, stride))
    if (w - size) % stride != 0:
        wis.append(w - size)
    return [(hi, wi) for hi in his for wi in wis]


def gaussian_weights(tile_w: int, tile_h: int) -> np.ndarray:
    """Per-pixel Gaussian blending weights (common.py:142-169, CCSR lineage)."""
    var = 0.01
    mid_w = (tile_w - 1) / 2
    x = np.arange(tile_w)
    xp = np.exp(-((x - mid_w) ** 2) / (tile_w * tile_w) / (2 * var)) / np.sqrt(
        2 * np.pi * var
    )
    mid_h = tile_h / 2
    y = np.arange(tile_h)
    yp = np.exp(-((y - mid_h) ** 2) / (tile_h * tile_h) / (2 * var)) / np.sqrt(
        2 * np.pi * var
    )
    return np.outer(yp, xp)


SCAN_THRESHOLD = 32  # above this many tiles, loop via lax.scan, not unroll


def make_tiled_fn(
    fn: Callable[..., jax.Array],
    size: int,
    stride: int,
    scale_type: str = "up",
    scale: int = 1,
    channel: Optional[int] = None,
    weight: str = "gaussian",
    tiles_per_batch: int = 1,
) -> Callable[..., jax.Array]:
    """Wrap ``fn(x, ...)`` (NHWC -> NHWC) into a Gaussian-blended tiled version.

    ``fn`` receives stacked tiles with the batch axis multiplied by the number
    of tiles in the current chunk; extra positional args are passed through.
    If ``fn`` accepts ``tile_coords`` (a static tuple of (hi, wi) per tile in
    the chunk), it is provided — used by diffusion tiling to slice the hint.

    Memory/compile note: when the tile count is large (> SCAN_THRESHOLD) and
    ``fn`` does not need static tile coords, the tile loop compiles to ONE
    ``lax.scan`` over a coordinate table (dynamic_slice in, accumulate via
    dynamic_update_slice) — the model body appears once in the HLO and XLA
    cannot blow up live temps by interleaving hundreds of unrolled tile
    programs (observed: 2048^2 tiled VAE decode = 225 tiles OOMing as a
    fully unrolled graph).
    """
    assert scale_type in ("up", "down")
    sfn = (lambda n: n * scale) if scale_type == "up" else (lambda n: n // scale)

    def tiled(x: jax.Array, *args, **kwargs) -> jax.Array:
        b, h, w, c = x.shape
        out_c = channel or c
        coords = sliding_windows(h, w, size, stride)
        osize = sfn(size)
        if weight == "gaussian":
            wmask = gaussian_weights(osize, osize)
        else:
            wmask = np.ones((osize, osize))
        # geometry-only normalizer, computed on host
        count = np.zeros((sfn(h), sfn(w), 1), np.float32)
        for hi, wi in coords:
            count[sfn(hi): sfn(hi) + osize, sfn(wi): sfn(wi) + osize, 0] += wmask
        wmask_j = jnp.asarray(wmask[None, :, :, None], jnp.float32)
        inv_count = jnp.asarray(1.0 / count)[None]

        out = jnp.zeros((b, sfn(h), sfn(w), out_c), jnp.float32)
        accepts_coords = "tile_coords" in getattr(fn, "tile_kwargs", ())
        if not accepts_coords and len(coords) > SCAN_THRESHOLD:
            # scan over CHUNKS of tiles_per_batch: keeps the bounded-HLO
            # property (model body once) AND the tile-batching MXU win
            # (bench_highres: 4.5 -> 3.82 s/image). Padded slots in the last
            # chunk get weight 0 (they'd double-add their repeated coord).
            cpb = max(1, tiles_per_batch)
            pad = (-len(coords)) % cpb
            coords_pad = coords + [coords[-1]] * pad
            valid = np.array([1.0] * len(coords) + [0.0] * pad, np.float32)
            coord_tab = jnp.asarray(
                np.array(coords_pad, np.int32).reshape(-1, cpb, 2)
            )
            valid_tab = jnp.asarray(valid.reshape(-1, cpb))

            def body(acc, inp):
                hw, val = inp  # [cpb, 2], [cpb]
                tiles = jnp.concatenate(
                    [
                        jax.lax.dynamic_slice(
                            x, (0, hw[j, 0], hw[j, 1], 0), (b, size, size, c)
                        )
                        for j in range(cpb)
                    ],
                    axis=0,
                )
                res = fn(tiles, *args, **kwargs).astype(jnp.float32) * wmask_j
                for j in range(cpb):
                    r = res[j * b: (j + 1) * b] * val[j]
                    oh, ow = sfn(hw[j, 0]), sfn(hw[j, 1])
                    cur = jax.lax.dynamic_slice(
                        acc, (0, oh, ow, 0), (b, osize, osize, out_c)
                    )
                    acc = jax.lax.dynamic_update_slice(
                        acc, cur + r, (0, oh, ow, 0)
                    )
                return acc, None

            out, _ = jax.lax.scan(body, out, (coord_tab, valid_tab))
            return out * inv_count
        for i in range(0, len(coords), tiles_per_batch):
            chunk = coords[i: i + tiles_per_batch]
            n_real = len(chunk)
            if tiles_per_batch > 1 and n_real < tiles_per_batch:
                # pad the last chunk (repeat a coord) so every chunk has the
                # same batch shape -> the model body appears ONCE in the HLO
                chunk = chunk + [chunk[-1]] * (tiles_per_batch - n_real)
            tiles = jnp.concatenate(
                [x[:, hi: hi + size, wi: wi + size, :] for hi, wi in chunk], axis=0
            )
            if accepts_coords:
                res = fn(tiles, *args, tile_coords=tuple(chunk), **kwargs)
            else:
                res = fn(tiles, *args, **kwargs)
            res = res.astype(jnp.float32) * wmask_j
            for j, (hi, wi) in enumerate(chunk[:n_real]):
                out = out.at[
                    :, sfn(hi): sfn(hi) + osize, sfn(wi): sfn(wi) + osize, :
                ].add(res[j * b: (j + 1) * b])
        return out * inv_count

    return tiled
