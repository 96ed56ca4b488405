"""Micro-benchmark: Pallas flash attention vs XLA einsum attention on TPU.

Shapes = SD2.1 UNet at 512x512 (latent 64x64): self-attn 4096/1024/256 tokens
and cross-attn to 77 text tokens, across the channel widths used per level.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp

from diffbir_tpu.ops.attention import xla_attention
from diffbir_tpu.ops.flash_attention import flash_attention, supported

CASES = [
    # (B, Sq, Skv, H, D) — per-level self-attn + cross-attn (CFG batch 2)
    (2, 4096, 4096, 5, 64),
    (2, 1024, 1024, 10, 64),
    (2, 256, 256, 20, 64),
    (2, 4096, 77, 5, 64),
    (2, 1024, 77, 10, 64),
    (2, 256, 77, 20, 64),
]


def timeit(fn, q, k, v, n=100):
    """Time n chained applications inside ONE jitted program (no dispatch
    overhead; the q perturbation defeats CSE)."""

    @jax.jit
    def loop(q, k, v):
        def body(i, acc):
            out = fn(acc, k, v)
            return acc + 0.001 * out

        return jax.lax.fori_loop(0, n, body, q)

    _ = float(jnp.sum(loop(q, k, v)))  # compile + run
    t0 = time.time()
    _ = float(jnp.sum(loop(q, k, v)))
    return (time.time() - t0) / n


def main():
    print(f"device: {jax.devices()[0]}")
    for b, sq, skv, h, d in CASES:
        k = jax.random.PRNGKey(0)
        q = jax.random.normal(k, (b, sq, h, d), jnp.bfloat16)
        kk = jax.random.normal(k, (b, skv, h, d), jnp.bfloat16)
        v = jax.random.normal(k, (b, skv, h, d), jnp.bfloat16)
        t_xla = timeit(xla_attention, q, kk, v)
        row = f"B{b} Sq{sq} Skv{skv} H{h} D{d}: xla {t_xla*1e3:.3f}ms"
        if supported(q, kk, v):
            t_fl = timeit(flash_attention, q, kk, v)
            row += f"  flash {t_fl*1e3:.3f}ms  speedup x{t_xla/t_fl:.2f}"
        else:
            row += "  flash unsupported"
        print(row)


if __name__ == "__main__":
    main()
