"""Quality-drift accounting for DIFFBIR_TPU_FAST_GELU (tanh-approx GELU).

The exact erf GELU (reference attention.py:66 parity) costs 1.67 ms of the
26.4 ms denoise step on v5e — VPU transcendental-bound (r5 ffn_ablation).
The tanh approximation buys the measured 1.2596 -> 1.178 s/image headline
but is a math change, so it ships opt-in with the same drift protocol as
turbo/quant: same-seed fast-vs-exact outputs, PSNR/SSIM, on (a) a TRAINED
tiny ControlLDM (turbo_quality.train_tiny_stage2 recipe) and (b) the
full-size random-init pipeline on chip (--fullsize). Writes
GELU_QUALITY.json.

Run:  python scripts/gelu_quality.py --trained_tiny          (CPU ok)
      PYTHONPATH=/root/.axon_site python scripts/gelu_quality.py --fullsize
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/diffbir_tpu_jax_cache")

import numpy as np


def trained_tiny_mode(args):
    import jax
    import jax.numpy as jnp

    from diffbir_tpu.utils.common import wavelet_reconstruction
    from diffbir_tpu.utils.common import psnr, ssim
    from turbo_quality import make_lq, train_tiny_stage2

    size = 64
    cldm, schedule, sampler, params, first, last = train_tiny_stage2(
        args.train_steps, size
    )
    tokens = jnp.zeros((1, 77), jnp.int32)

    def make_fn():
        def restore(p, lq, rng):
            cond_img = lq
            cond = cldm.prepare_condition(p, cond_img, tokens)
            uncond = cldm.prepare_condition(p, cond_img, tokens)
            k1, k2 = jax.random.split(rng)
            x_T = jax.random.normal(k1, cond["c_img"].shape, jnp.float32)
            model_fn = lambda x, t, c: cldm(p, x, t, c)  # noqa: E731
            z = sampler.sample(model_fn, x_T, cond, uncond, 4.0, args.steps, k2)
            out = wavelet_reconstruction(
                (cldm.vae_decode(p, z) + 1) / 2, cond_img)
            return jnp.clip(out, 0, 1)

        return jax.jit(restore)

    lqs = [jnp.asarray(make_lq(7 + i, size)) for i in range(args.images)]
    outputs = {}
    for tag, env in (("exact", "0"), ("fast", "1")):
        os.environ["DIFFBIR_TPU_FAST_GELU"] = env
        fn = make_fn()  # fresh jit — env is read at trace time
        outputs[tag] = [
            np.asarray(fn(params, lq, jax.random.PRNGKey(100 + i))
                       .astype(jnp.float32))
            for i, lq in enumerate(lqs)
        ]
        print(f"trained-tiny {tag}: done", flush=True)
    os.environ.pop("DIFFBIR_TPU_FAST_GELU", None)

    base, fast = outputs["exact"], outputs["fast"]
    probe = float(np.abs(fast[0] - base[0]).max())
    assert probe > 1e-7, "fast gelu bit-identical to exact — not engaged?"
    ps = [float(psnr(jnp.asarray(o), jnp.asarray(b))[0])
          for o, b in zip(fast, base)]
    ss = [float(ssim(jnp.asarray(o), jnp.asarray(b))[0])
          for o, b in zip(fast, base)]
    row = {
        "psnr_vs_exact_db": round(float(np.mean(ps)), 2),
        "psnr_min_db": round(float(np.min(ps)), 2),
        "ssim_vs_exact": round(float(np.mean(ss)), 4),
    }
    print("fast_gelu", json.dumps(row), flush=True)
    _write("trained_tiny", {
        "protocol": {
            "model": "ControlLDM.tiny, stage-2 trained "
                     f"({args.train_steps} steps, loss {first:.3f} -> "
                     f"{last:.3f})",
            "size": size, "steps": args.steps, "sampler": "spaced",
            "cfg": 4.0, "images": args.images,
            "note": "same-seed fast-vs-exact gelu on TRAINED tiny weights",
        },
        "results": {"fast_gelu": row},
    })


def fullsize_mode(args):
    """Full-size (512², SD2.1-shaped) same-seed fast-vs-exact probe —
    the quant_quality.py full-size protocol (SwinIR cleaner + dezero'd
    random-init ControlLDM)."""
    import jax
    import jax.numpy as jnp

    from diffbir_tpu.models.cldm import ControlLDM
    from diffbir_tpu.models.swinir import SwinIR
    from diffbir_tpu.sampler.spaced import SpacedSampler
    from diffbir_tpu.schedule import Schedule
    from diffbir_tpu.utils.common import wavelet_reconstruction
    from diffbir_tpu.utils.common import psnr, ssim
    from quant_quality import make_lq  # shared degraded-input maker

    schedule = Schedule.create(
        timesteps=1000, beta_schedule="linear", linear_start=0.00085,
        linear_end=0.0120, parameterization="v", zero_snr=True,
    )
    sampler = SpacedSampler(schedule.betas, "v", rescale_cfg=False)
    swin = SwinIR(dtype=jnp.bfloat16)

    def bf(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, tree
        )

    cldm = ControlLDM.sd21(dtype=jnp.bfloat16)
    lat = (args.size // 8, args.size // 8)
    params = bf(jax.jit(cldm.init_params, static_argnums=1)(
        jax.random.PRNGKey(0), lat))

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
    sp = bf(jax.jit(swin.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, args.size, args.size, 3))))
    tokens = jnp.zeros((1, 77), jnp.int32)

    def make_fn():
        def restore(params, sp, lq, rng):
            cond_img = jnp.clip(swin.apply(sp, lq), 0, 1)
            cond = cldm.prepare_condition(params, cond_img, tokens)
            uncond = cldm.prepare_condition(params, cond_img, tokens)
            k1, k2 = jax.random.split(rng)
            x_T = jax.random.normal(k1, cond["c_img"].shape, jnp.float32)
            model_fn = lambda x, t, c: cldm(params, x, t, c)  # noqa: E731
            z = sampler.sample(
                model_fn, x_T, cond, uncond, 4.0, args.steps, k2)
            out = wavelet_reconstruction(
                (cldm.vae_decode(params, z) + 1) / 2, cond_img)
            return jnp.clip(out, 0, 1)

        return jax.jit(restore)

    lqs = [jnp.asarray(make_lq(7 + i, args.size))
           for i in range(args.images)]
    outs = {}
    for tag, env in (("exact", "0"), ("fast", "1")):
        os.environ["DIFFBIR_TPU_FAST_GELU"] = env
        fn = make_fn()
        outs[tag] = [
            np.asarray(fn(params, sp, lq, jax.random.PRNGKey(100 + i))
                       .astype(jnp.float32))
            for i, lq in enumerate(lqs)
        ]
        print(f"fullsize {tag}: done", flush=True)
    os.environ.pop("DIFFBIR_TPU_FAST_GELU", None)

    probe = float(np.abs(outs["fast"][0] - outs["exact"][0]).max())
    assert probe > 1e-7, "fast gelu bit-identical to exact — not engaged?"
    ps = [float(psnr(jnp.asarray(a), jnp.asarray(b))[0])
          for a, b in zip(outs["fast"], outs["exact"])]
    ss = [float(ssim(jnp.asarray(a), jnp.asarray(b))[0])
          for a, b in zip(outs["fast"], outs["exact"])]
    row = {
        "psnr_vs_exact_db": round(float(np.mean(ps)), 2),
        "psnr_min_db": round(float(np.min(ps)), 2),
        "ssim_vs_exact": round(float(np.mean(ss)), 4),
    }
    print("fullsize fast_gelu", json.dumps(row), flush=True)
    _write("fullsize_random_init", {
        "protocol": {
            "pipeline": f"{args.size}² {args.steps}-step SwinIR+SD2.1 "
                        "path, dezero'd random-init, same seed "
                        "(quant_quality.py protocol)",
            "images": args.images,
            "note": "random-init full-size drift probe; the trained_tiny "
                    "section is the perceptually-grounded one",
        },
        "results": {"fast_gelu": row},
    })


def _write(section, payload):
    path = os.path.join(REPO, "GELU_QUALITY.json")
    doc = {}
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
    doc[section] = payload
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    print(f"wrote GELU_QUALITY.json ({section})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--images", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--train_steps", type=int, default=300)
    ap.add_argument("--seed", type=int, default=231)
    ap.add_argument("--trained_tiny", action="store_true")
    ap.add_argument("--fullsize", action="store_true")
    args = ap.parse_args()
    if args.trained_tiny:
        trained_tiny_mode(args)
    if args.fullsize:
        fullsize_mode(args)
    if not (args.trained_tiny or args.fullsize):
        print("pick --trained_tiny and/or --fullsize")


if __name__ == "__main__":
    main()
