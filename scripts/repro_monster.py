"""Stage-bisect the deterministic TPU worker crash at the 81920-token program.

The r4b fidelity dry-run crashed 4100 s in; the instrumented r5 rerun named
the culprit: real47 image "5" (386x515 LQ -> x4 -> 1544x2060 cond -> bucket
2048x2560 -> 256x320 latent = 81920 tokens), image #37 of 47 — deterministic,
while all 36 smaller-bucket images restored fine.  Every attention shape of
that program passes the isolated flash stress (STRESS_FLASH.json, 14/14 ok),
so the fault lives in the FULL program context.  This script runs the same
compute as pipeline._generate_fn (reference pipeline.py:236-321 analog) as
SEPARATE jitted dispatches with a host fetch after each, so the crash names
its stage:

  A. VAE encode of the 1x2048x2560x3 condition  (flash [1,81920,1,512])
  B. one CFG denoise step at 2x256x320x4        (flash [2,81920,5,64])
  C. 10-step denoise scan  (one ~20-50 s dispatch)
  D. 50-step denoise scan  (one ~100-250 s dispatch — if B/C pass and D
     crashes, the fault scales with single-dispatch DURATION, i.e. a worker/
     tunnel watchdog, not a kernel bug)
  E. VAE decode of 1x256x320x4

Run: PYTHONPATH=/root/.axon_site python scripts/repro_monster.py [--stages ABCDE]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/diffbir_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from diffbir_tpu.models.cldm import ControlLDM
from diffbir_tpu.sampler.spaced import SpacedSampler
from diffbir_tpu.schedule import Schedule

COND_HW = (2048, 2560)  # bucket of image "5"'s 1544x2060 condition
LAT_HW = (COND_HW[0] // 8, COND_HW[1] // 8)  # (256, 320) = 81920 tokens


def fetch(name, x, t0):
    s = float(jnp.sum(x.astype(jnp.float32)))
    print(f"[{name}] OK sum={s:.3e} {time.time() - t0:.1f}s", flush=True)
    return s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="ABCDE")
    args = ap.parse_args()

    print(f"# device: {jax.devices()[0]}", flush=True)
    cldm = ControlLDM.sd21(dtype=jnp.bfloat16)
    schedule = Schedule.create(
        timesteps=1000, beta_schedule="linear", linear_start=0.00085,
        linear_end=0.0120, parameterization="v", zero_snr=True,
    )
    sampler = SpacedSampler(schedule.betas, schedule.parameterization, False)

    t0 = time.time()
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        jax.jit(cldm.init_params, static_argnums=1)(
            jax.random.PRNGKey(0), LAT_HW
        ),
    )
    print(f"[init] params ready {time.time() - t0:.1f}s", flush=True)

    key = jax.random.PRNGKey(1)
    cond_img = jax.random.uniform(key, (1, *COND_HW, 3), jnp.float32)
    tok = jnp.zeros((1, 77), jnp.int32)

    # A: encode (deterministic mode posterior, like prepare_condition)
    c_img = None
    if "A" in args.stages:
        t0 = time.time()
        enc = jax.jit(
            lambda p, img, tk: cldm.prepare_condition(p, img, tk)
        )
        cond = enc(params, cond_img, tok)
        fetch("A encode 2048x2560", cond["c_img"], t0)
        c_img, c_txt = cond["c_img"], cond["c_txt"]
    else:
        c_img = jnp.zeros((1, *LAT_HW, 4), jnp.float32)
        c_txt = jax.jit(cldm.encode_text)(params, tok)

    ctx_full = jnp.concatenate([c_txt, c_txt], axis=0)  # CFG 2B
    cond = {"c_txt": c_txt, "c_img": c_img}
    uncond = {"c_txt": c_txt, "c_img": c_img}
    x_T = jax.random.normal(jax.random.PRNGKey(2), (1, *LAT_HW, 4), jnp.float32)

    # B: one CFG-batched model step with the hoisted path (the scan body)
    if "B" in args.stages:
        t0 = time.time()
        lookup = cldm.make_hoist_lookup(params, ctx_full, sampler.model_ts(50))

        def one_step(p, x2, t, ctx2, ci2):
            return cldm(
                p, x2, t, {"c_txt": ctx2, "c_img": ci2},
                control_scales=1.0, hoisted=lookup(t),
            )

        x2 = jnp.concatenate([x_T, x_T], axis=0)
        ci2 = jnp.concatenate([c_img, c_img], axis=0)
        t = jnp.full((2,), float(sampler.model_ts(50)[-1]), jnp.float32)
        out = jax.jit(one_step)(params, x2, t, ctx_full, ci2)
        fetch("B one step 2x256x320", out, t0)
        t0 = time.time()
        for i in range(3):
            out = jax.jit(one_step)(params, x2, t, ctx_full, ci2)
        fetch("B warm x3", out, t0)

    def run_scan(steps, tag):
        # params as a jit ARGUMENT (like pipeline._generate_fn) — closing
        # over them bakes 2.31 GB of constants into the remote-compile
        # payload, which breaks the compile RPC on its own
        t0 = time.time()

        def scan_fn(p, xT, ci, ctx2, rng):
            lookup = cldm.make_hoist_lookup(
                p, ctx2, sampler.model_ts(steps)
            )

            def model_fn(x, t, c):
                return cldm(p, x, t, c, control_scales=1.0,
                            hoisted=lookup(t))

            cnd = {"c_txt": ctx2[:1], "c_img": ci}
            unc = {"c_txt": ctx2[1:], "c_img": ci}
            return sampler.sample(model_fn, xT, cnd, unc, 4.0, steps, rng)

        z = jax.jit(scan_fn, static_argnums=())(
            params, x_T, c_img, ctx_full, jax.random.PRNGKey(3)
        )
        fetch(tag, z, t0)
        return z

    z = x_T
    if "C" in args.stages:
        z = run_scan(10, "C scan 10 steps")
    if "D" in args.stages:
        z = run_scan(50, "D scan 50 steps")

    # E: decode
    if "E" in args.stages:
        t0 = time.time()
        x = jax.jit(cldm.vae_decode)(params, z)
        fetch("E decode 256x320", x, t0)

    print("REPRO_ALL_STAGES_PASSED", flush=True)


if __name__ == "__main__":
    main()
