"""Benchmark turbo modes on one chip (vs the exact-parity baseline).

Measured (v5e, 512x512, 50-step spaced, CFG 4.0, bf16):
  baseline (interval 1)                 : 1.375 s/image
  control_interval 3                    : 1.163 s/image
  control_interval 5                    : 1.132 s/image
  interval 3 + turbo_encoder            : 0.950 s/image
  interval 5 + turbo_encoder            : 0.884 s/image
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from diffbir_tpu.models.cldm import ControlLDM
from diffbir_tpu.models.swinir import SwinIR
from diffbir_tpu.sampler import SpacedSampler
from diffbir_tpu.schedule import Schedule
from diffbir_tpu.utils.common import wavelet_reconstruction


def main():
    cldm = ControlLDM.sd21(dtype=jnp.bfloat16,
                           quant_dense=bool(int(os.environ.get("BENCH_QUANT", "0"))),
                           fused_resblock=bool(int(os.environ.get("BENCH_FUSED", "0"))))
    swin = SwinIR(dtype=jnp.bfloat16)
    schedule = Schedule.create(timesteps=1000, parameterization="v", zero_snr=True)
    sampler = SpacedSampler(schedule.betas, "v", rescale_cfg=False)
    bf = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )
    params = bf(jax.jit(cldm.init_params, static_argnums=1)(jax.random.PRNGKey(0), (64, 64)))
    sp = bf(jax.jit(swin.init)(jax.random.PRNGKey(1), jnp.zeros((1, 512, 512, 3))))
    tokens = jnp.zeros((1, 77), jnp.int32)
    lq = jax.random.uniform(jax.random.PRNGKey(2), (1, 512, 512, 3))

    def make_fn(interval, enc):
        def restore(params, sp, lq, pos, neg, rng):
            cond_img = jnp.clip(swin.apply(sp, lq), 0, 1)
            cond = cldm.prepare_condition(params, cond_img, pos)
            uncond = cldm.prepare_condition(params, cond_img, neg)
            rng, k1, k2 = jax.random.split(rng, 3)
            x_T = jax.random.normal(k1, cond["c_img"].shape, jnp.float32)
            # scan-invariant hoisting, wired exactly as pipeline.py does
            hoist_lookup = None
            if os.environ.get("DIFFBIR_TPU_HOIST", "1") == "1":
                ctx_full = jnp.concatenate(
                    [cond["c_txt"], uncond["c_txt"]], axis=0
                )
                hoist_lookup = cldm.make_hoist_lookup(
                    params, ctx_full, sampler.model_ts(50)
                )
            if interval > 1:
                model_fn = cldm.make_cached_control_model(
                    params, 1.0, interval, (64, 64), call_batch=2,
                    cache_unet_encoder=enc, hoist_lookup=hoist_lookup,
                )
            elif hoist_lookup is not None:
                model_fn = lambda x, t, c: cldm(  # noqa: E731
                    params, x, t, c, hoisted=hoist_lookup(t)
                )
            else:
                model_fn = lambda x, t, c: cldm(params, x, t, c)  # noqa: E731
            z = sampler.sample(model_fn, x_T, cond, uncond, 4.0, 50, k2)
            return wavelet_reconstruction((cldm.vae_decode(params, z) + 1) / 2, cond_img)

        return jax.jit(restore)

    for interval, enc in [(1, False), (3, False), (5, False), (3, True), (5, True)]:
        fn = make_fn(interval, enc)
        _ = float(jnp.sum(fn(params, sp, lq, tokens, tokens, jax.random.PRNGKey(3))))
        times = []
        for i in range(3):
            t0 = time.time()
            _ = float(jnp.sum(fn(params, sp, lq, tokens, tokens, jax.random.PRNGKey(4 + i))))
            times.append(time.time() - t0)
        print(json.dumps({
            "control_interval": interval, "turbo_encoder": enc,
            "p50_s": round(float(np.median(times)), 3),
        }))


if __name__ == "__main__":
    main()
