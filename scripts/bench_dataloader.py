"""Host data-loader throughput: native C++ pool vs pure-Python path.

Generates a synthetic image corpus (512x512 JPEGs), then measures decoded+
cropped images/second through (a) the C++ thread-pool loader and (b) the
Python PIL/cv2 __getitem__ path — the host-side analog of torch DataLoader
workers vs in-process loading. Run anywhere (no TPU needed).

Usage: python scripts/bench_dataloader.py [--n 200] [--batch 16] [--threads 8]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import tempfile
import time

import numpy as np
from PIL import Image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200, help="corpus size")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=512, help="crop size")
    ap.add_argument("--src", type=int, default=768, help="source image size")
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--batches", type=int, default=30, help="batches to time")
    args = ap.parse_args()

    from diffbir_tpu.dataset.native_loader import NativeImageLoader, native_available

    if not native_available():
        print(json.dumps({"error": "native loader unavailable (make -C native)"}))
        return

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as d:
        paths = []
        for i in range(args.n):
            arr = rng.integers(0, 255, (args.src, args.src, 3), dtype=np.uint8)
            p = os.path.join(d, f"{i}.jpg")
            Image.fromarray(arr).save(p, quality=92)
            paths.append(p)

        # native
        ld = NativeImageLoader(paths, args.batch, args.size, crop="random",
                               num_threads=args.threads, queue_depth=8, seed=1)
        ld.next()  # warm the pool
        t0 = time.time()
        for _ in range(args.batches):
            ld.next()
        native_ips = args.batches * args.batch / (time.time() - t0)
        ld.close()

        # python single-process reference
        def py_one(p):
            img = np.asarray(Image.open(p).convert("RGB"))
            y = rng.integers(0, img.shape[0] - args.size + 1)
            x = rng.integers(0, img.shape[1] - args.size + 1)
            return img[y:y + args.size, x:x + args.size]

        t0 = time.time()
        count = args.batches * args.batch
        for i in range(count):
            py_one(paths[i % len(paths)])
        py_ips = count / (time.time() - t0)

    print(json.dumps({
        "metric": f"host decode+crop throughput ({args.size}^2 from {args.src}^2 jpeg)",
        "native_images_per_s": round(native_ips, 1),
        "python_images_per_s": round(py_ips, 1),
        "speedup": round(native_ips / py_ips, 2),
        "threads": args.threads,
        # thread-pool speedup needs cores; on a 1-vCPU host the win comes
        # from overlapping decode with the TPU step, not from this number
        "host_cpus": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
