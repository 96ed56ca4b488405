"""Large-image serving envelope: one 8x SR run to ~2396x1596 output.

The reference demonstrates 8x SR to 2396x1596 (/root/reference/README.md:43,
the v1 8x face example). This drives OUR production path (BSRInferenceLoop ->
pipeline with full tiling: cleaner tiles, cldm tiles, streaming tiled VAE)
at that output scale on the chip, random-init weights
(DIFFBIR_TPU_RANDOM_INIT=1 — the envelope is shapes/memory/latency, not
pixels), and records latency + peak HBM.

Run: PYTHONPATH=/root/.axon_site python scripts/bench_8x_sr.py
"""

import json
import os
import sys
import time
from argparse import Namespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/diffbir_tpu_jax_cache")
os.environ["DIFFBIR_TPU_RANDOM_INIT"] = "1"

import numpy as np
from PIL import Image

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def main():
    # ~300x200 LQ -> x8 -> 2400x1600 output (the reference's 2396x1596 row
    # rounded to /8-friendly dims). Synthesized from a real47 image so the
    # content spectrum is natural.
    src_dir = "/root/reference/inputs/real47"
    files = sorted(f for f in os.listdir(src_dir) if f.endswith(".jpg"))
    img = Image.open(os.path.join(src_dir, files[0])).convert("RGB")
    lq = img.resize((300, 200), Image.BICUBIC)
    in_dir = "/tmp/sr8x_in"
    out_dir = os.path.join(REPO, "results", "sr8x")
    os.makedirs(in_dir, exist_ok=True)
    lq.save(os.path.join(in_dir, "lq300x200.png"))

    from diffbir_tpu.inference.bsr_loop import BSRInferenceLoop

    args = Namespace(
        task="sr", version="v2.1", upscale=8.0, precision="bf16",
        captioner="none", guidance=False, input=in_dir, output=out_dir,
        n_samples=1, seed=231, steps=10,
        pos_prompt="", neg_prompt="low quality, blurry",
        cfg_scale=4.0, strength=1.0, start_point_type="noise",
        sampler="spaced", noise_aug=0, rescale_cfg=False,
        cleaner_tiled=True, cleaner_tile_size=512, cleaner_tile_stride=256,
        vae_encoder_tiled=True, vae_encoder_tile_size=512,
        vae_decoder_tiled=True, vae_decoder_tile_size=512,
        cldm_tiled=True, cldm_tile_size=512, cldm_tile_stride=256,
        cldm_tiles_per_batch=3,
        size_bucket=0,
    )
    t0 = time.time()
    loop = BSRInferenceLoop(args)
    t_load = time.time() - t0
    t0 = time.time()
    loop.run()
    wall = time.time() - t0

    import jax

    stats = {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        pass
    out_png = os.path.join(out_dir, "lq300x200.png")
    out_shape = None
    if os.path.exists(out_png):
        out_shape = list(np.asarray(Image.open(out_png)).shape)
    rec = {
        "input": "300x200", "upscale": 8, "steps": 10,
        "output_shape": out_shape,
        "load_s": round(t_load, 1), "restore_wall_s": round(wall, 1),
        "peak_hbm_gb": round(stats.get("peak_bytes_in_use", 0) / 2**30, 2),
        "tiling": "cleaner+cldm(ttb=3)+vae enc/dec, tile 512",
    }
    print(json.dumps(rec), flush=True)
    with open(os.path.join(REPO, "SR8X_ENVELOPE.json"), "w") as f:
        json.dump(rec, f, indent=2)
    print("wrote SR8X_ENVELOPE.json")


if __name__ == "__main__":
    main()
