"""Stage-2 (IRControlNet) training-step throughput on one chip.

Full SD2.1 shapes at 512x512, bf16 compute, fp32 AdamW over the ControlNet
only (the frozen SD stack carries no optimizer state), gradient
checkpointing on ResBlock/SpatialTransformer. The reference trains this
stage with accelerate DDP on A100s (train_stage2.py); here one step =
vae_encode(gt) -> ControlNet+UNet fwd/bwd -> AdamW update, all inside one
jit.

Measured (v5e, bf16 frozen stack, fp32 ControlNet+AdamW, donated state):
  batch 4, 512x512, remat -> 0.454 s/step = 8.82 images/s/chip.
Without donate_argnums the old+new TrainState are both live and batch 4
OOMs on 16 GB.

Usage: python scripts/bench_train_step.py [--batch 4] [--remat]
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
from diffbir_tpu.schedule import Schedule
from diffbir_tpu.train.stage2 import init_train_state, make_optimizer, make_train_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--remat", action="store_true",
                    help="gradient checkpointing (needed for larger batches)")
    ap.add_argument("--fused_resblock", action="store_true",
                    help="Pallas fused-ResBlock forward (custom VJP; the "
                         "bwd runs the XLA math)")
    args = ap.parse_args()

    cldm = ControlLDM.sd21(dtype=jnp.bfloat16, use_checkpoint=args.remat,
                           fused_resblock=args.fused_resblock)
    schedule = Schedule.create(timesteps=1000, parameterization="v", zero_snr=True)
    lat = args.size // 8
    params = jax.jit(cldm.init_params, static_argnums=1)(jax.random.PRNGKey(0), (lat, lat))
    # frozen SD stack in bf16; trainable ControlNet master weights stay fp32
    params = {
        k: (v if k == "controlnet" else jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, v))
        for k, v in params.items()
    }
    opt = make_optimizer(learning_rate=1e-5)
    state = init_train_state(params, opt)
    # donate the state: without this the old and new TrainState (params +
    # AdamW moments, ~6 GB) are both live across the update -> OOM on 16 GB
    step = jax.jit(make_train_step(cldm, schedule, opt, noise_aug_timestep=200),
                   donate_argnums=(0,))

    b = args.batch
    batch = {
        "gt": jax.random.uniform(jax.random.PRNGKey(1), (b, args.size, args.size, 3)) * 2 - 1,
        "lq": jax.random.uniform(jax.random.PRNGKey(2), (b, args.size, args.size, 3)),
        "tokens": jnp.zeros((b, 77), jnp.int32),
    }

    t0 = time.time()
    state, metrics = step(state, batch, jax.random.PRNGKey(3))
    _ = float(metrics["loss"])
    print(f"# compile+first: {time.time() - t0:.1f}s loss={float(metrics['loss']):.4f}",
          file=sys.stderr)

    times = []
    for i in range(5):
        t0 = time.time()
        state, metrics = step(state, batch, jax.random.PRNGKey(4 + i))
        _ = float(metrics["loss"])
        times.append(time.time() - t0)
    p50 = float(np.median(times))
    print(json.dumps({
        "metric": f"stage-2 train step, batch {b}, {args.size}x{args.size}"
                  + (" (remat)" if args.remat else ""),
        "value": round(p50, 3),
        "unit": "s/step",
        "images_per_s_per_chip": round(b / p50, 2),
    }))


if __name__ == "__main__":
    main()
