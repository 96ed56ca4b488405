"""Benchmark: 512x512 50-step BSR restoration on one TPU chip.

Workload = the reference's paper command (README.md:149-162): SwinIR cleaner
-> SD2.1 ControlLDM (IRControlNet) x 50 spaced-sampler steps with CFG 4.0
(2x batch per step) -> VAE decode -> wavelet color fix. Random bf16 weights
(math/FLOPs identical to trained weights).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: <= 2 s per image (BASELINE.md rebuild target on v5e).
"""

import json
import os
import sys
import time

import numpy as np

import jax

if os.environ.get("DIFFBIR_TPU_BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["DIFFBIR_TPU_BENCH_PLATFORM"])

from diffbir_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp

from diffbir_tpu.models.cldm import ControlLDM
from diffbir_tpu.models.swinir import SwinIR
from diffbir_tpu.sampler import SpacedSampler
from diffbir_tpu.schedule import Schedule
from diffbir_tpu.utils.common import wavelet_reconstruction

STEPS = int(os.environ.get("BENCH_STEPS", 50))
SIZE = int(os.environ.get("BENCH_SIZE", 512))
# BENCH_IMG_BATCH > 1: batch N images through the whole pipeline (CFG makes
# the denoise batch 2N) and report per-image latency + img/min throughput —
# the "60 img/min at batch 4" README row, re-measured per round on current
# kernels instead of quoted from an old session.
IMG_BATCH = int(os.environ.get("BENCH_IMG_BATCH", 1))
CFG = 4.0
BASELINE_S = 2.0


def _bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree
    )


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    qconv = bool(int(os.environ.get("BENCH_QUANT_CONV", "0")))
    quant = bool(int(os.environ.get("BENCH_QUANT", "0")))
    fused = qconv or bool(int(os.environ.get("BENCH_FUSED", "0")))
    explicit_mode = quant or fused
    cldm = ControlLDM.sd21(dtype=jnp.bfloat16, quant_dense=quant,
                           fused_resblock=fused, quant_conv=qconv)
    swin = SwinIR(dtype=jnp.bfloat16)
    schedule = Schedule.create(
        timesteps=1000, beta_schedule="linear", parameterization="v", zero_snr=True
    )
    sampler = SpacedSampler(schedule.betas, "v", rescale_cfg=False)

    rng = jax.random.PRNGKey(0)
    lat = SIZE // 8
    params = _bf16(jax.jit(cldm.init_params, static_argnums=1)(rng, (lat, lat)))
    sp = _bf16(
        jax.jit(swin.init)(
            jax.random.PRNGKey(1), jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
        )
    )
    tokens = jnp.zeros((IMG_BATCH, 77), jnp.int32)

    hoist = os.environ.get("DIFFBIR_TPU_HOIST", "1") == "1"

    def make_restore(model):
        def restore(params, sp, lq, pos_tok, neg_tok, rng):
            cond_img = jnp.clip(swin.apply(sp, lq), 0.0, 1.0)
            cond = model.prepare_condition(params, cond_img, pos_tok)
            uncond = model.prepare_condition(params, cond_img, neg_tok)
            rng, k1, k2 = jax.random.split(rng, 3)
            x_T = jax.random.normal(k1, cond["c_img"].shape, jnp.float32)

            if hoist:
                # scan-invariant hoisting (exact math; pipeline.py default):
                # context k/v once per prompt + temb tables for the t-grid
                ctx_full = jnp.concatenate(
                    [cond["c_txt"], uncond["c_txt"]], axis=0
                )
                model_fn = model.hoisted_model_fn(
                    params, ctx_full, sampler.model_ts(STEPS)
                )
            else:
                def model_fn(x, t, c):
                    return model(params, x, t, c, control_scales=1.0)

            z = sampler.sample(model_fn, x_T, cond, uncond, CFG, STEPS, k2)
            x = model.vae_decode(params, z)
            return wavelet_reconstruction((x + 1) / 2, cond_img)

        return jax.jit(restore)

    lq = jax.random.uniform(
        jax.random.PRNGKey(2), (IMG_BATCH, SIZE, SIZE, 3), jnp.float32)

    def measure(fn, tag):
        def run(key):
            out = fn(params, sp, lq, tokens, tokens, key)
            # fetch a scalar: forces execution + device->host sync even on
            # remote/tunneled backends where block_until_ready is lazy
            return float(jnp.sum(out))

        t0 = time.time()
        s = run(jax.random.PRNGKey(3))
        print(f"# [{tag}] compile+first-run: {time.time() - t0:.1f}s "
              f"(checksum {s:.3f})", file=sys.stderr)
        times = []
        for i in range(5):
            t0 = time.time()
            run(jax.random.PRNGKey(4 + i))
            times.append(time.time() - t0)
        print(f"# [{tag}] times: {[f'{t:.3f}' for t in times]}", file=sys.stderr)
        return float(np.median(times))

    p50 = measure(make_restore(cldm), "fused" if fused else
                  ("quant" if quant else "exact"))
    mode = "explicit-env" if explicit_mode else "exact"

    # Optional A/B of the fused-ResBlock serving mode (same param tree,
    # same math up to bf16 rounding). Opt-in via BENCH_AB=1: two on-chip
    # sessions measured the fused path as an e2e LOSS (r3 1.463 s, r4
    # 1.398 s vs 1.29 exact — TPU_RUNBOOK_r{3,4}.json), so the default
    # bench run no longer spends a ~5 min compile re-confirming it.
    if (not explicit_mode and jax.default_backend() == "tpu"
            and os.environ.get("BENCH_AB", "0") == "1"):
        try:
            fcldm = ControlLDM.sd21(dtype=jnp.bfloat16, fused_resblock=True)
            cond_img = jnp.clip(swin.apply(sp, lq), 0.0, 1.0)
            cond = jax.jit(cldm.prepare_condition)(params, cond_img, tokens)
            x = jax.random.normal(jax.random.PRNGKey(7),
                                  cond["c_img"].shape, jnp.float32)
            t = jnp.full((x.shape[0],), 500, jnp.int32)
            ref = jax.jit(lambda p: cldm(p, x, t, cond))(params)
            out = jax.jit(lambda p: fcldm(p, x, t, cond))(params)
            ref32 = np.asarray(ref.astype(jnp.float32))
            rel = float(np.abs(np.asarray(out.astype(jnp.float32)) - ref32).max()
                        / (np.abs(ref32).max() + 1e-9))
            print(f"# fused parity rel-max-abs: {rel:.4f}", file=sys.stderr)
            if rel < 0.05:
                p50_f = measure(make_restore(fcldm), "fused-ab")
                if p50_f < p50:
                    p50, mode = p50_f, "fused_resblock"
            else:
                print("# fused parity FAILED; keeping exact mode", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — never lose the baseline number
            print(f"# fused A/B failed ({type(e).__name__}: {e}); "
                  "keeping exact mode", file=sys.stderr)

    if IMG_BATCH > 1:
        print(json.dumps({
            "metric": f"{SIZE}x{SIZE} {STEPS}-step BSR restoration throughput "
                      f"(batch {IMG_BATCH}, 1 chip)",
            "value": round(60.0 * IMG_BATCH / p50, 2),
            "unit": "img/min",
            "vs_baseline": round(BASELINE_S / (p50 / IMG_BATCH), 3),
            "per_image_s": round(p50 / IMG_BATCH, 4),
            "mode": mode,
            "hoist": hoist,
        }))
        return
    print(json.dumps({
        "metric": f"{SIZE}x{SIZE} {STEPS}-step BSR restoration latency (p50, 1 chip)",
        "value": round(p50, 4),
        "unit": "s/image",
        "vs_baseline": round(BASELINE_S / p50, 3),
        "mode": mode,
        "hoist": hoist,
    }))


if __name__ == "__main__":
    main()
