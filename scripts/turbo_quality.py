"""Turbo drift accounting: same-seed turbo vs full-run outputs.

Turbo (interval-cached ControlNet residuals + optional UNet-encoder
propagation) is this repo's implementation of the reference's DiffBIR-turbo
TODO (/root/reference/README.md:95-96). Its speedups (scripts/bench_turbo.py)
are only meaningful with a quality bound, so this script runs the FULL
512x512 50-step pipeline once per turbo config with identical rng / x_T /
weights and reports PSNR + SSIM of each turbo output against the exact
(interval=1) output. Results -> TURBO_QUALITY.json at the repo root.

Weights: random-init full-size SD2.1 (no checkpoints in this environment);
re-run unchanged when real weights land to refresh the numbers. Random
weights are the conservative case for the ControlNet cache: trained
ControlNet residuals vary smoothly along the trajectory, random ones don't.

Usage: PYTHONPATH=/root/.axon_site python scripts/turbo_quality.py
       [--steps 50] [--images 2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/diffbir_tpu_jax_cache")

import numpy as np

import jax
import jax.numpy as jnp

from diffbir_tpu.models.cldm import ControlLDM
from diffbir_tpu.models.swinir import SwinIR
from diffbir_tpu.sampler import SpacedSampler
from diffbir_tpu.schedule import Schedule
from diffbir_tpu.utils.common import psnr, ssim, wavelet_reconstruction

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def make_lq(seed: int, size: int = 512) -> np.ndarray:
    """Structured synthetic image (smooth field + hard edges), like a
    natural photo's spectrum — NOT white noise, which is adversarial for
    any caching scheme."""
    g = np.random.default_rng(seed)
    low = g.random((8, 8, 3)).astype(np.float32)
    img = jax.image.resize(jnp.asarray(low), (size, size, 3), "cubic")
    img = np.array(img)  # writable host copy
    blk = max(4, size // 8)  # hard-edged squares scale with the canvas
    for _ in range(6):
        y, x = g.integers(blk // 4, size - blk - blk // 4, 2)
        img[y : y + blk, x : x + blk] = g.random(3)
    return np.clip(img, 0, 1)[None]


def dezero(tree, rng):
    """Replace all-zero leaves (SD zero_module sites) with small noise.

    At random init the zero-init output convs make the model output
    identically zero, which would render every turbo config vacuously
    bit-exact; trained weights are non-zero there."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(rng, len(leaves))
    out = []
    for leaf, k in zip(leaves, keys):
        if leaf.size and not np.any(np.asarray(leaf)):
            out.append(jax.random.normal(k, leaf.shape, leaf.dtype) * 0.02)
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def train_tiny_stage2(train_steps: int, size: int = 64):
    """Stage-2 train a tiny ControlLDM on synthetic pairs (the convergence
    gate's recipe: ControlNet-only AdamW, frozen de-zeroed backbone,
    scripts/convergence_gate.py:211-245) to a clearly-falling loss.

    Shared by turbo_quality --trained_tiny and quant_quality --trained_tiny
    (VERDICT r4 #7): drift bounds on random-init weights are a weak proxy;
    this gives every quality-accounting script the same TRAINED tiny model.
    Returns (cldm, schedule, sampler, params, loss_first, loss_last)."""
    from diffbir_tpu.train import stage2

    lat_n = size // 8
    lat = (lat_n, lat_n)
    cldm = ControlLDM.tiny()
    schedule = Schedule.create(timesteps=100, parameterization="eps")
    sampler = SpacedSampler(schedule.betas, "eps", rescale_cfg=False)
    params = jax.jit(cldm.init_params, static_argnums=1)(
        jax.random.PRNGKey(0), lat
    )
    k = jax.random.PRNGKey(99)
    params = {
        **{n: dezero(params[n], jax.random.fold_in(k, i))
           for i, n in enumerate(("unet", "vae", "clip"))},
        "controlnet": params["controlnet"],  # keeps its true zero-conv init
    }

    opt = stage2.make_optimizer(2e-3)
    state = stage2.init_train_state(params, opt)
    train_step = jax.jit(
        stage2.make_train_step(cldm, schedule, opt, cleaner_apply=None,
                               noise_aug_timestep=10),
        donate_argnums=(0,),
    )

    def make_batch(seed, n=4):
        g = np.random.default_rng(seed)
        gts, lqs = [], []
        for i in range(n):
            gt = make_lq(int(g.integers(1 << 30)), size)[0]
            # mild degradation: 2x down-up + gaussian noise
            low = jax.image.resize(jnp.asarray(gt), (size // 2, size // 2, 3),
                                   "linear")
            lq = np.asarray(jax.image.resize(low, (size, size, 3), "linear"))
            lq = np.clip(lq + g.normal(0, 0.02, lq.shape), 0, 1)
            gts.append(gt * 2 - 1)
            lqs.append(lq)
        return {
            "gt": jnp.asarray(np.stack(gts), jnp.float32),
            "lq": jnp.asarray(np.stack(lqs), jnp.float32),
            "tokens": jnp.zeros((n, 77), jnp.int32),
        }

    rng = jax.random.PRNGKey(7)
    losses = []
    t0 = time.time()
    for step in range(train_steps):
        rng, sub = jax.random.split(rng)
        state, metrics = train_step(state, make_batch(step), sub)
        losses.append(float(metrics["loss"]))
        if (step + 1) % 25 == 0:
            print(f"train step {step+1}: loss={np.mean(losses[-25:]):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    first, last = float(np.mean(losses[:20])), float(np.mean(losses[-20:]))
    assert last < first * 0.7, (
        f"tiny stage-2 did not converge (loss {first:.4f} -> {last:.4f}); "
        "trained-weights drift numbers would be meaningless"
    )
    return cldm, schedule, sampler, jax.device_get(state.params), first, last


def trained_tiny_mode(args):
    """VERDICT r3 weak #4: random-init PSNR-vs-exact says little about drift
    of a TRAINED model (trained ControlNet residuals vary smoothly along the
    trajectory; random ones don't). No full-size checkpoints exist in this
    environment, so this mode measures the same turbo protocol on an
    actually-TRAINED tiny ControlLDM (train_tiny_stage2). Results land in a
    separate "trained_tiny" section of TURBO_QUALITY.json next to the
    architecture-matched full-size random-init numbers."""
    size, lat_n = 64, 8
    lat = (lat_n, lat_n)
    cldm, schedule, sampler, params, first, last = train_tiny_stage2(
        args.train_steps, size
    )

    tokens = jnp.zeros((1, 77), jnp.int32)

    def make_fn(interval, enc):
        def restore(params, lq, rng):
            cond_img = lq  # identity cleaner at tiny scale
            cond = cldm.prepare_condition(params, cond_img, tokens)
            uncond = cldm.prepare_condition(params, cond_img, tokens)
            k1, k2 = jax.random.split(rng)
            x_T = jax.random.normal(k1, cond["c_img"].shape, jnp.float32)
            if interval > 1:
                model_fn = cldm.make_cached_control_model(
                    params, 1.0, interval, lat, call_batch=2,
                    cache_unet_encoder=enc,
                )
            else:
                model_fn = lambda x, t, c: cldm(params, x, t, c)  # noqa: E731
            z = sampler.sample(model_fn, x_T, cond, uncond, 4.0, args.steps, k2)
            out = wavelet_reconstruction(
                (cldm.vae_decode(params, z) + 1) / 2, cond_img
            )
            return jnp.clip(out, 0, 1)

        return jax.jit(restore)

    lqs = [jnp.asarray(make_lq(7 + i, size)) for i in range(args.images)]
    configs = [(1, False), (2, False), (3, False), (5, False), (3, True),
               (5, True)]
    outputs = {}
    for interval, enc in configs:
        fn = make_fn(interval, enc)
        outs = [np.asarray(fn(params, lq, jax.random.PRNGKey(100 + i))
                           .astype(jnp.float32))
                for i, lq in enumerate(lqs)]
        outputs[(interval, enc)] = outs
        print(f"trained-tiny interval={interval} enc={enc}: done", flush=True)

    base = outputs[(1, False)]
    probe = float(np.abs(outputs[(5, False)][0] - base[0]).max())
    assert probe > 1e-6, "turbo cache not engaging on the trained tiny model"
    rows = []
    for interval, enc in configs[1:]:
        ps = [float(psnr(jnp.asarray(o), jnp.asarray(b))[0])
              for o, b in zip(outputs[(interval, enc)], base)]
        ss = [float(ssim(jnp.asarray(o), jnp.asarray(b))[0])
              for o, b in zip(outputs[(interval, enc)], base)]
        rows.append({
            "control_interval": interval,
            "turbo_encoder": enc,
            "psnr_vs_full_db": round(float(np.mean(ps)), 2),
            "psnr_min_db": round(float(np.min(ps)), 2),
            "ssim_vs_full": round(float(np.mean(ss)), 4),
        })
        print(json.dumps(rows[-1]), flush=True)

    path = os.path.join(REPO, "TURBO_QUALITY.json")
    doc = {}
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
    doc["trained_tiny"] = {
        "protocol": {
            "model": "ControlLDM.tiny, stage-2 trained "
                     f"({args.train_steps} steps, loss {first:.3f} -> "
                     f"{last:.3f})",
            "size": size, "steps": args.steps, "sampler": "spaced",
            "cfg": 4.0, "images": args.images,
            "note": "same-seed turbo vs exact on TRAINED weights (tiny "
                    "scale); complements the full-size random-init section",
        },
        "results": rows,
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    print("wrote TURBO_QUALITY.json (trained_tiny section)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--images", type=int, default=2)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--trained_tiny", action="store_true")
    ap.add_argument("--train_steps", type=int, default=150)
    args = ap.parse_args()

    if args.trained_tiny:
        # tiny-scale quality measure — keep it off the (single) TPU chip so
        # it can run alongside TPU benches; axon ignores JAX_PLATFORMS, this
        # works because no backend op has run yet.
        jax.config.update("jax_platforms", "cpu")
        trained_tiny_mode(args)
        return

    cldm = ControlLDM.sd21(dtype=jnp.bfloat16)
    swin = SwinIR(dtype=jnp.bfloat16)
    schedule = Schedule.create(timesteps=1000, parameterization="v", zero_snr=True)
    sampler = SpacedSampler(schedule.betas, "v", rescale_cfg=False)
    bf = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )
    lat = (args.size // 8, args.size // 8)
    params = bf(jax.jit(cldm.init_params, static_argnums=1)(jax.random.PRNGKey(0), lat))

    # De-zero the SD zero_module sites (unet out convs, controlnet zero
    # convs) — see dezero() above; small noise stands in for trained weights.
    params = dezero(params, jax.random.PRNGKey(42))
    sp = bf(jax.jit(swin.init)(jax.random.PRNGKey(1), jnp.zeros((1, args.size, args.size, 3))))
    tokens = jnp.zeros((1, 77), jnp.int32)

    def make_fn(interval, enc):
        def restore(params, sp, lq, pos, neg, rng):
            cond_img = jnp.clip(swin.apply(sp, lq), 0, 1)
            cond = cldm.prepare_condition(params, cond_img, pos)
            uncond = cldm.prepare_condition(params, cond_img, neg)
            k1, k2 = jax.random.split(rng)
            x_T = jax.random.normal(k1, cond["c_img"].shape, jnp.float32)
            if interval > 1:
                model_fn = cldm.make_cached_control_model(
                    params, 1.0, interval, lat, call_batch=2,
                    cache_unet_encoder=enc,
                )
            else:
                model_fn = lambda x, t, c: cldm(params, x, t, c)  # noqa: E731
            z = sampler.sample(model_fn, x_T, cond, uncond, 4.0, args.steps, k2)
            out = wavelet_reconstruction((cldm.vae_decode(params, z) + 1) / 2, cond_img)
            return jnp.clip(out, 0, 1)

        return jax.jit(restore)

    lqs = [jnp.asarray(make_lq(7 + i, args.size)) for i in range(args.images)]
    configs = [(1, False), (2, False), (3, False), (5, False), (3, True), (5, True)]
    outputs = {}
    for interval, enc in configs:
        fn = make_fn(interval, enc)
        outs = []
        t0 = time.time()
        for i, lq in enumerate(lqs):
            # identical rng per image across configs: drift is the ONLY delta
            o = fn(params, sp, lq, tokens, tokens, jax.random.PRNGKey(100 + i))
            outs.append(np.asarray(o.astype(jnp.float32)))
        outputs[(interval, enc)] = outs
        print(f"interval={interval} enc={enc}: ran {len(lqs)} images "
              f"in {time.time() - t0:.1f}s", flush=True)

    base = outputs[(1, False)]
    # guard against vacuous measurements (e.g. a zero-output model)
    probe = float(np.abs(outputs[(5, False)][0] - base[0]).max())
    assert probe > 1e-6, (
        f"turbo interval=5 output is bit-identical to exact (max-abs {probe}); "
        "the cache is not engaging or the model is degenerate"
    )
    rows = []
    for interval, enc in configs[1:]:
        ps, ss = [], []
        for o, b in zip(outputs[(interval, enc)], base):
            ps.append(float(psnr(jnp.asarray(o), jnp.asarray(b))[0]))
            ss.append(float(ssim(jnp.asarray(o), jnp.asarray(b))[0]))
        rows.append({
            "control_interval": interval,
            "turbo_encoder": enc,
            "psnr_vs_full_db": round(float(np.mean(ps)), 2),
            "psnr_min_db": round(float(np.min(ps)), 2),
            "ssim_vs_full": round(float(np.mean(ss)), 4),
        })
        print(json.dumps(rows[-1]), flush=True)

    out = {
        "protocol": {
            "size": args.size, "steps": args.steps, "sampler": "spaced",
            "cfg": 4.0, "images": args.images, "weights": "random-init sd21",
            "note": "PSNR/SSIM of turbo output vs exact interval=1 output, "
                    "same seed/x_T; refresh with real weights via this script",
        },
        "results": rows,
    }
    with open(os.path.join(REPO, "TURBO_QUALITY.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("wrote TURBO_QUALITY.json")


if __name__ == "__main__":
    main()
