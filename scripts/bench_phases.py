"""Phase-level timing of the 512x512 50-step BSR pipeline on one chip."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp

from diffbir_tpu.models.cldm import ControlLDM
from diffbir_tpu.models.swinir import SwinIR
from diffbir_tpu.sampler import SpacedSampler
from diffbir_tpu.schedule import Schedule

SIZE = 512
STEPS = 50


def _bf16(t):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )


def timeit(fn, *args, n=3):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    ts = []
    for _i in range(n):
        t0 = time.time()
        out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    cldm = ControlLDM.sd21(dtype=jnp.bfloat16,
                           quant_dense=bool(int(os.environ.get("BENCH_QUANT", "0"))),
                           fused_resblock=bool(int(os.environ.get("BENCH_FUSED", "0"))))
    swin = SwinIR(dtype=jnp.bfloat16)
    schedule = Schedule.create(timesteps=1000, parameterization="v", zero_snr=True)
    sampler = SpacedSampler(schedule.betas, "v", rescale_cfg=False)
    lat = SIZE // 8
    params = _bf16(jax.jit(cldm.init_params, static_argnums=1)(jax.random.PRNGKey(0), (lat, lat)))
    sp = _bf16(jax.jit(swin.init)(jax.random.PRNGKey(1), jnp.zeros((1, SIZE, SIZE, 3))))
    lq = jax.random.uniform(jax.random.PRNGKey(2), (1, SIZE, SIZE, 3))
    tokens = jnp.zeros((1, 77), jnp.int32)

    cleaner = jax.jit(lambda p, x: jnp.clip(swin.apply(p, x), 0, 1))
    t_clean = timeit(cleaner, sp, lq)
    cond_img = cleaner(sp, lq)

    prep = jax.jit(lambda p, c, t: cldm.prepare_condition(p, c, t))
    t_prep = timeit(prep, params, cond_img, tokens)
    cond = prep(params, cond_img, tokens)

    def one_step(p, x, c):
        x2 = jnp.concatenate([x, x])
        t = jnp.full((2,), 500.0)
        c2 = {k: jnp.concatenate([c[k], c[k]]) for k in c}
        return cldm(p, x2, t, c2)

    x = jax.random.normal(jax.random.PRNGKey(3), (1, lat, lat, 4))
    step_fn = jax.jit(one_step)
    t_step = timeit(step_fn, params, x, cond)

    def sample_fn(p, x_T, c, u, key):
        def model_fn(xx, tt, cc):
            return cldm(p, xx, tt, cc)

        return sampler.sample(model_fn, x_T, c, u, 4.0, STEPS, key)

    samp = jax.jit(sample_fn)
    t_samp = timeit(samp, params, x, cond, cond, jax.random.PRNGKey(4), n=2)

    dec = jax.jit(lambda p, z: cldm.vae_decode(p, z))
    t_dec = timeit(dec, params, x)

    print(f"cleaner (SwinIR 512^2):      {t_clean*1e3:8.1f} ms")
    print(f"cond encode (clip+vae) x1:   {t_prep*1e3:8.1f} ms (x2 for cfg)")
    print(f"one denoise step (cfg 2x):   {t_step*1e3:8.1f} ms  -> x{STEPS} = {t_step*STEPS*1e3:.0f} ms")
    print(f"{STEPS}-step sampler scan:        {t_samp*1e3:8.1f} ms")
    print(f"vae decode:                  {t_dec*1e3:8.1f} ms")
    total = t_clean + 2 * t_prep + t_samp + t_dec
    print(f"sum:                         {total*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
