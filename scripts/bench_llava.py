"""LLaVA decode throughput (tokens/s) — int4 vs int8 vs bf16 weights.

Weights-gated: with DIFFBIR_TPU_LLAVA_PATH set to a llava-1.5-hf dir it
benches the real 7B model on the TPU; otherwise it runs a synthetic
llama-7B-shaped decoder with random weights (same FLOPs/bytes — the
numbers are representative, the tokens are garbage).

Usage: PYTHONPATH=/root/.axon_site python scripts/bench_llava.py [--new 64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--new", type=int, default=64, help="tokens to generate")
    ap.add_argument("--prompt_len", type=int, default=576 + 48,
                    help="prefill length (image tokens + text)")
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--dim", type=int, default=4096)
    ap.add_argument("--variants", default="int4,int8,bf16",
                    help="comma list; at 7B run ONE per process — the host "
                    "tree is 26 GB fp32 and per-variant copies accumulate "
                    "(the r5 all-three run OOM-killed the host at 130 GB)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from diffbir_tpu.models import llava as L

    path = os.environ.get("DIFFBIR_TPU_LLAVA_PATH", "")
    if path and os.path.isdir(path):
        cfg = L.load_llava_params(path, quantize=4)[3][0]
        variants = {
            "int4": lambda: L.load_llava_params(path, quantize=4)[0],
            "int8": lambda: L.load_llava_params(path, quantize=8)[0],
            "bf16": lambda: jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x,
                L.load_llava_params(path, quantize=False)[0],
            ),
        }
    else:
        cfg = L.LlamaConfig(dim=args.dim, n_layers=args.layers,
                            n_heads=args.dim // 128, ffn_dim=11008)
        print(f"no weights; synthetic llama {cfg.n_layers}x{cfg.dim}", flush=True)
        # HOST numpy fp32 tree (~26 GB at 7B — fits the 125 GB host, not the
        # 16 GB HBM); each variant is derived on host, lazily, one at a time
        params = L.init_llama_params(np.random.default_rng(0), cfg)
        variants = {
            "int4": lambda: L.quantize_llama_params(params, bits=4, host=True),
            "int8": lambda: L.quantize_llama_params(params, bits=8, host=True),
            "bf16": lambda: jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype")
                and np.issubdtype(x.dtype, np.floating) else x,
                params,
            ),
        }

    prompt = jnp.asarray(
        np.random.default_rng(1).standard_normal(
            (1, args.prompt_len, cfg.dim)
        ).astype(np.float32) * 0.1,
        jnp.bfloat16,
    )

    want = set(args.variants.split(","))
    variants = {k: v for k, v in variants.items() if k in want}
    for name, build in variants.items():
        # Weights live on HOST until here. device_put ONE variant at a time:
        # passing host numpy trees into jit would re-transfer up to 14 GB
        # (bf16 7B) through the tunnel on EVERY timed call (measuring link
        # bandwidth, not decode), and holding bf16+int8+int4 on device at
        # once (14+7+3.5 GB) overflows the 16 GB v5e HBM.
        host_tree = build()
        p = jax.device_put(host_tree)
        jax.block_until_ready(p)
        del host_tree
        fn = jax.jit(lambda pp, pr: L.greedy_decode(pp, cfg, pr, args.new, -1))
        toks = fn(p, prompt)
        _ = np.asarray(toks)  # force through the tunnel
        t0 = time.time()
        n_runs = 3
        for _ in range(n_runs):
            _ = np.asarray(fn(p, prompt))
        dt = (time.time() - t0) / n_runs
        del p
        print(f"{name}: {args.new / dt:.1f} tok/s  "
              f"({dt / args.new * 1000:.1f} ms/tok, prefill {args.prompt_len})",
              flush=True)


if __name__ == "__main__":
    main()
