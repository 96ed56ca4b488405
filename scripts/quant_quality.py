"""int8-dense serving mode accounting: same-seed quant vs bf16 outputs + speed.

``--quant_dense`` halves the HBM weight traffic of the UNet/ControlNet dense
sites (the denoise step is HBM-bound — CLAUDE.md cost analysis). A serving
optimization is only meaningful with a quality bound, so this script runs the
FULL 512x512 pipeline with identical rng / x_T / float weights twice — once
bf16, once through quantize_dense_params — and reports PSNR/SSIM of the int8
output against the bf16 output, plus per-image wall time for both. Results ->
QUANT_QUALITY.json at the repo root.

Weights: random-init full-size SD2.1 (no checkpoints in this environment);
re-run unchanged when real weights land. Random lecun weights are the
conservative case for per-channel symmetric int8: trained SD weight
distributions are heavier-tailed per channel, which per-channel scales
absorb.

Usage: PYTHONPATH=/root/.axon_site python scripts/quant_quality.py
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

from diffbir_tpu.models.cldm import (
    ControlLDM, quantize_conv_params, quantize_dense_params)
from diffbir_tpu.models.swinir import SwinIR
from diffbir_tpu.sampler import SpacedSampler
from diffbir_tpu.schedule import Schedule
from diffbir_tpu.utils.common import psnr, ssim, wavelet_reconstruction

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

from turbo_quality import make_lq, train_tiny_stage2  # noqa: E402


def trained_tiny_mode(args):
    """VERDICT r4 #7: the full-size drift bound is random-init-only. This
    mode re-grounds the int8 quality accounting on an actually-TRAINED tiny
    ControlLDM (shared recipe: turbo_quality.train_tiny_stage2) — same-seed
    quant-vs-bf16 outputs on trained weights. Writes a "trained_tiny"
    section into QUANT_QUALITY.json next to the full-size numbers."""
    size = 64
    cldm, schedule, sampler, params, first, last = train_tiny_stage2(
        args.train_steps, size
    )
    qcldm = ControlLDM.tiny(quant_dense=True)
    ccldm = ControlLDM.tiny(fused_resblock=True, quant_conv=True)
    acldm = ControlLDM.tiny(quant_dense=True, fused_resblock=True,
                            quant_conv=True)
    variants = {
        "bf16": (cldm, params),
        "int8": (qcldm, quantize_dense_params(params)),
        "int8conv": (ccldm, quantize_conv_params(params)),
        "int8all": (acldm, quantize_conv_params(quantize_dense_params(params))),
    }
    tokens = jnp.zeros((1, 77), jnp.int32)

    def make_fn(model):
        def restore(p, lq, rng):
            cond_img = lq  # identity cleaner at tiny scale
            cond = model.prepare_condition(p, cond_img, tokens)
            uncond = model.prepare_condition(p, cond_img, tokens)
            k1, k2 = jax.random.split(rng)
            x_T = jax.random.normal(k1, cond["c_img"].shape, jnp.float32)
            model_fn = lambda x, t, c: model(p, x, t, c)  # noqa: E731
            z = sampler.sample(model_fn, x_T, cond, uncond, 4.0, args.steps, k2)
            out = wavelet_reconstruction(
                (model.vae_decode(p, z) + 1) / 2, cond_img)
            return jnp.clip(out, 0, 1)

        return jax.jit(restore)

    lqs = [jnp.asarray(make_lq(7 + i, size)) for i in range(args.images)]
    outputs = {}
    for tag, (model, p) in variants.items():
        fn = make_fn(model)
        outputs[tag] = [
            np.asarray(fn(p, lq, jax.random.PRNGKey(100 + i))
                       .astype(jnp.float32))
            for i, lq in enumerate(lqs)
        ]
        print(f"trained-tiny {tag}: done", flush=True)

    base = outputs["bf16"]
    rows = {}
    for tag in ("int8", "int8conv", "int8all"):
        probe = float(np.abs(outputs[tag][0] - base[0]).max())
        assert probe > 1e-7, f"{tag} bit-identical to bf16 — not engaged?"
        ps = [float(psnr(jnp.asarray(o), jnp.asarray(b))[0])
              for o, b in zip(outputs[tag], base)]
        ss = [float(ssim(jnp.asarray(o), jnp.asarray(b))[0])
              for o, b in zip(outputs[tag], base)]
        rows[tag] = {
            "psnr_vs_bf16_db": round(float(np.mean(ps)), 2),
            "psnr_min_db": round(float(np.min(ps)), 2),
            "ssim_vs_bf16": round(float(np.mean(ss)), 4),
        }
        print(tag, json.dumps(rows[tag]), flush=True)

    path = os.path.join(REPO, "QUANT_QUALITY.json")
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
            "note": "same-seed quant-vs-bf16 on TRAINED tiny weights; "
                    "complements the full-size random-init section",
        },
        "results": rows,
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    print("wrote QUANT_QUALITY.json (trained_tiny section)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--images", type=int, default=2)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny models (CPU smoke; numbers not meaningful)")
    ap.add_argument("--trained_tiny", action="store_true",
                    help="train a tiny ControlLDM first, then measure "
                    "quant-vs-bf16 drift on the TRAINED weights")
    ap.add_argument("--train_steps", type=int, default=150)
    args = ap.parse_args()

    if args.trained_tiny:
        trained_tiny_mode(args)  # tiny scale — runs fine on CPU or chip
        return

    schedule = Schedule.create(
        timesteps=1000, beta_schedule="linear", linear_start=0.00085,
        linear_end=0.0120, parameterization="v", zero_snr=True,
    )
    sampler = SpacedSampler(schedule.betas, "v", rescale_cfg=False)
    if args.tiny:
        # CPU smoke path: proves the script end-to-end without a chip
        swin = SwinIR(embed_dim=24, depths=(2,), num_heads=(4,),
                      window_size=4, mlp_ratio=2.0, sf=8, unshuffle=True,
                      unshuffle_scale=8, dtype=jnp.bfloat16)
    else:
        # full-size x1 cleaner, same protocol as turbo_quality.py
        swin = SwinIR(dtype=jnp.bfloat16)

    def bf(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree
        )

    mk = ControlLDM.tiny if args.tiny else ControlLDM.sd21
    cldm = mk(dtype=jnp.bfloat16)
    qcldm = mk(dtype=jnp.bfloat16, quant_dense=True)
    ccldm = mk(dtype=jnp.bfloat16, fused_resblock=True,
               quant_conv=True)
    acldm = mk(dtype=jnp.bfloat16, quant_dense=True,
               fused_resblock=True, quant_conv=True)
    lat = (args.size // 8, args.size // 8)
    params = bf(jax.jit(cldm.init_params, static_argnums=1)(jax.random.PRNGKey(0), lat))

    # de-zero the SD zero_module sites (see turbo_quality.py): at random init
    # they zero the model output, making any comparison vacuous
    def dezero(tree, rng):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        keys = jax.random.split(rng, len(leaves))
        out = []
        for leaf, k in zip(leaves, keys):
            if leaf.size and not np.any(np.asarray(leaf)):
                out.append(jax.random.normal(k, leaf.shape, leaf.dtype) * 0.02)
            else:
                out.append(leaf)
        return jax.tree_util.tree_unflatten(treedef, out)

    params = dezero(params, jax.random.PRNGKey(42))
    params_q = quantize_dense_params(params)
    params_c = quantize_conv_params(params)
    params_a = quantize_conv_params(params_q)
    sp = bf(jax.jit(swin.init)(jax.random.PRNGKey(1), jnp.zeros((1, args.size, args.size, 3))))
    tokens = jnp.zeros((1, 77), jnp.int32)

    def make_fn(model):
        def restore(params, sp, lq, pos, neg, rng):
            cond_img = jnp.clip(swin.apply(sp, lq), 0, 1)
            cond = model.prepare_condition(params, cond_img, pos)
            uncond = model.prepare_condition(params, cond_img, neg)
            k1, k2 = jax.random.split(rng)
            x_T = jax.random.normal(k1, cond["c_img"].shape, jnp.float32)
            model_fn = lambda x, t, c: model(params, x, t, c)  # noqa: E731
            z = sampler.sample(model_fn, x_T, cond, uncond, 4.0, args.steps, k2)
            out = wavelet_reconstruction((model.vae_decode(params, z) + 1) / 2, cond_img)
            return jnp.clip(out, 0, 1)

        return jax.jit(restore)

    lqs = [jnp.asarray(make_lq(7 + i, args.size)) for i in range(args.images)]
    results = {}
    for tag, model, p in [
        ("bf16", cldm, params),
        ("int8", qcldm, params_q),
        ("int8conv", ccldm, params_c),       # fused ResBlock + int8 convs
        ("int8all", acldm, params_a),        # dense + conv int8 together
    ]:
        fn = make_fn(model)
        outs, times = [], []
        for i, lq in enumerate(lqs):
            t0 = time.time()
            o = fn(p, sp, lq, tokens, tokens, jax.random.PRNGKey(100 + i))
            o = np.asarray(o.astype(jnp.float32))
            times.append(time.time() - t0)
            outs.append(o)
        results[tag] = (outs, times)
        print(f"{tag}: {args.images} images, per-image times "
              f"{[f'{t:.2f}' for t in times]}", flush=True)

    base, _ = results["bf16"]
    report = {
        "protocol": {
            "size": args.size, "steps": args.steps, "sampler": "spaced",
            "cfg": 4.0, "images": args.images,
            "weights": ("random-init TINY smoke (numbers not meaningful)"
                        if args.tiny
                        else "random-init sd21 (refresh with real checkpoints)"),
            "note": "PSNR/SSIM of each quant serving mode vs the bf16 "
                    "output, same seed/x_T; int8=dense sites, "
                    "int8conv=fused-ResBlock convs, int8all=both",
        },
        # warm per-image time = the LAST image (first includes compile)
        "bf16_warm_s": round(results["bf16"][1][-1], 3),
    }
    for tag in ("int8", "int8conv", "int8all"):
        outs, times = results[tag]
        probe = float(np.abs(outs[0] - base[0]).max())
        assert probe > 1e-7, f"{tag} output bit-identical to bf16 — not engaged?"
        ps = [float(psnr(jnp.asarray(o), jnp.asarray(b))[0])
              for o, b in zip(outs, base)]
        ss = [float(ssim(jnp.asarray(o), jnp.asarray(b))[0])
              for o, b in zip(outs, base)]
        report[f"{tag}_psnr_vs_bf16_db"] = round(float(np.mean(ps)), 2)
        report[f"{tag}_psnr_min_db"] = round(float(np.min(ps)), 2)
        report[f"{tag}_ssim_vs_bf16"] = round(float(np.mean(ss)), 4)
        report[f"{tag}_warm_s"] = round(times[-1], 3)
    print(json.dumps(report))
    name = "QUANT_QUALITY_SMOKE.json" if args.tiny else "QUANT_QUALITY.json"
    with open(os.path.join(REPO, name), "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {name}")


if __name__ == "__main__":
    main()
