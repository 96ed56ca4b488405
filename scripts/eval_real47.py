"""Evaluate BSR restoration on the real47 testset (fidelity benchmark).

The reference ships inputs/real47 (47 real-world LQ images, README.md:46) as
its de-facto integration testset. This script restores a directory of images
and, when a directory of reference outputs is given (e.g. the torch
reference's results), reports PSNR / Y-PSNR between the two — the
"within 0.5 dB of the torch reference" BASELINE.md criterion.

Usage:
  python scripts/eval_real47.py --input /root/reference/inputs/real47 \
      --output results/real47 [--ref torch_outputs_dir] \
      [--version v2.1 --steps 50 --sampler spaced --cfg_scale 4.0 --upscale 4]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--ref", default=None, help="dir of reference outputs to PSNR against")
    ap.add_argument("--version", default="v2.1")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--sampler", default="spaced")
    ap.add_argument("--cfg_scale", type=float, default=4.0)
    ap.add_argument("--upscale", type=float, default=4.0)
    ap.add_argument("--seed", type=int, default=231)
    ap.add_argument("--skip_existing", action="store_true",
                    help="resume: skip inputs whose output png already "
                    "exists (mid-run TPU crash recovery)")
    ap.add_argument("--size_bucket", type=int, default=0,
                    help="static-shape bucketing (pad the stage-2 condition "
                    "image to multiples of N px, crop back; LQ only to x64); "
                    "bounds stage-2 compile count over the 31 distinct "
                    "real47 shapes (7 programs at 512) — use 0 (exact x64) "
                    "for the fidelity verdict, 512 for harness dry-runs")
    args = ap.parse_args()  # strict: a typo'd flag must not silently run defaults

    from argparse import Namespace

    import numpy as np
    from PIL import Image

    from diffbir_tpu.inference.bsr_loop import BSRInferenceLoop

    loop_args = Namespace(
        task="sr", version=args.version, upscale=args.upscale, precision="bf16",
        captioner="none", guidance=False, input=args.input, output=args.output,
        n_samples=1, seed=args.seed, steps=args.steps,
        pos_prompt="", neg_prompt="low quality, blurry, low-resolution, noisy, unsharp, weird textures",
        cfg_scale=args.cfg_scale, strength=1.0, start_point_type="noise",
        sampler=args.sampler, noise_aug=0, rescale_cfg=False,
        cleaner_tiled=False, cleaner_tile_size=512, cleaner_tile_stride=256,
        size_bucket=args.size_bucket, skip_existing=args.skip_existing,
    )
    loop = BSRInferenceLoop(loop_args)
    loop.run()

    if args.ref:
        import jax.numpy as jnp

        from diffbir_tpu.utils.common import psnr

        scores, scores_y = [], []
        for name in sorted(os.listdir(args.output)):
            if not name.endswith(".png"):
                continue
            ref_path = os.path.join(args.ref, name)
            if not os.path.exists(ref_path):
                continue
            a = np.asarray(Image.open(os.path.join(args.output, name)), np.float32) / 255.0
            b = np.asarray(Image.open(ref_path).convert("RGB"), np.float32) / 255.0
            if a.shape != b.shape:
                print(f"skip {name}: shape {a.shape} vs {b.shape}")
                continue
            scores.append(float(psnr(jnp.asarray(a[None]), jnp.asarray(b[None]))[0]))
            scores_y.append(
                float(psnr(jnp.asarray(a[None]), jnp.asarray(b[None]), test_y=True)[0])
            )
        if not scores:
            raise SystemExit(
                "eval_real47: no overlapping filenames between --output and "
                "--ref (check n_samples naming, e.g. stem_0.png vs stem.png)"
            )
        print(f"PSNR vs reference outputs: {np.mean(scores):.2f} dB "
              f"(Y: {np.mean(scores_y):.2f} dB) over {len(scores)} images")


if __name__ == "__main__":
    main()
