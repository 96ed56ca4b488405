"""High-resolution tiled restoration demo on one chip.

Capability parity check for the reference's tiled path (README.md:77-81
demonstrates 2396x1596 tiled 8x SR; run_gradio.py:36-38 caps the demo at
2048x2048): full-size SwinIR + SD2.1 IRControlNet with EVERY tiling mode on
(cleaner 512/256, diffusion 512/256, VAE encoder/decoder 256), random bf16
weights, 10-step edm_dpm++_3m_sde (the default CLI sampler).

Measured (v5e, bf16), 1024x1024, 10-step, all tiling on:
  --tiles_per_batch 3 -> 3.10 s/image  (round-2 kernels + chunked scan;
  was 3.92, and 4.50 at tiles_per_batch=1)

Usage: python scripts/bench_highres.py [--size 1024] [--steps 10]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from diffbir_tpu.models.cldm import ControlLDM
from diffbir_tpu.models.swinir import SwinIR
from diffbir_tpu.pipeline import SwinIRPipeline
from diffbir_tpu.schedule import Schedule


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024, help="output H=W (pre-upscaled input)")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--sampler", default="edm_dpm++_3m_sde")
    ap.add_argument("--tiles_per_batch", type=int, default=1)
    args = ap.parse_args()

    bf = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )
    cldm = ControlLDM.sd21(dtype=jnp.bfloat16)
    swin = SwinIR(dtype=jnp.bfloat16)
    schedule = Schedule.create(timesteps=1000, parameterization="v", zero_snr=True)
    params = bf(jax.jit(cldm.init_params, static_argnums=1)(jax.random.PRNGKey(0), (64, 64)))
    sp = bf(jax.jit(swin.init)(jax.random.PRNGKey(1), jnp.zeros((1, 512, 512, 3))))
    pipe = SwinIRPipeline(
        # jit is essential: the tiled cleaner calls this once per tile
        cleaner_apply=jax.jit(lambda x: jnp.clip(swin.apply(sp, x), 0, 1)),
        cldm=cldm, params=params, schedule=schedule,
    )

    lq = np.random.default_rng(0).integers(
        0, 255, (1, args.size, args.size, 3), dtype=np.uint8
    )
    kw = dict(
        steps=args.steps, cfg_scale=4.0, sampler_type=args.sampler, seed=231,
        cleaner_tiled=True, cleaner_tile_size=512, cleaner_tile_stride=256,
        cldm_tiled=True, cldm_tile_size=512, cldm_tile_stride=256,
        cldm_tiles_per_batch=args.tiles_per_batch,
        vae_encoder_tiled=True, vae_encoder_tile_size=256,
        vae_decoder_tiled=True, vae_decoder_tile_size=256,
    )
    t0 = time.time()
    out = pipe.run(lq, **kw)
    compile_s = time.time() - t0
    assert out.shape == lq.shape, (out.shape, lq.shape)
    print(f"# compile+first: {compile_s:.1f}s", file=sys.stderr)

    times = []
    for i in range(3):
        t0 = time.time()
        pipe.run(lq, **{**kw, "seed": 232 + i})
        times.append(time.time() - t0)
    print(json.dumps({
        "metric": f"{args.size}x{args.size} {args.steps}-step fully-tiled restoration",
        "value": round(float(np.median(times)), 3),
        "unit": "s/image",
        "tiles_per_batch": args.tiles_per_batch,
    }))


if __name__ == "__main__":
    main()
