"""Packed-layout flash attention vs folded flash vs XLA, on the real TPU.

The packed kernel consumes the projection's native [B,S,H*D] layout (no
fold/unfold transposes around the pallas_call) and fetches each k/v tile
once for ALL heads. This sweep decides the dispatch policy in
ops/attention.py for both self-attention and 77-token cross-attention.

Usage: PYTHONPATH=/root/.axon_site python scripts/bench_attention_packed.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from diffbir_tpu.ops import flash_attention as fa_mod
from diffbir_tpu.ops.attention import xla_attention

CASES = [
    # (B, Sq, Skv, H, D) — SD2.1 UNet sites at 512^2, CFG batch 2
    (2, 4096, 4096, 5, 64),
    (2, 1024, 1024, 10, 64),
    (2, 256, 256, 20, 64),
    (2, 4096, 77, 5, 64),
    (2, 1024, 77, 10, 64),
    (2, 256, 77, 20, 64),
]


def timeit(fn, q, k, v, n=100):
    @jax.jit
    def loop(q, k, v):
        def body(i, acc):
            out = fn(acc, k, v)
            return acc + 0.001 * out

        return jax.lax.fori_loop(0, n, body, q)

    _ = float(jnp.sum(loop(q, k, v).astype(jnp.float32)))
    t0 = time.time()
    _ = float(jnp.sum(loop(q, k, v).astype(jnp.float32)))
    return (time.time() - t0) / n


def main():
    print(f"# device: {jax.devices()[0]}", flush=True)
    for b, sq, skv, h, d in CASES:
        kq = jax.random.PRNGKey(0)
        q = jax.random.normal(kq, (b, sq, h, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(kq, 1), (b, skv, h, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(kq, 2), (b, skv, h, d), jnp.bfloat16)
        row = {"shape": (b, sq, skv, h, d)}
        row["xla_ms"] = round(timeit(xla_attention, q, k, v) * 1e3, 3)
        if skv == sq:  # folded path requires its block constraints
            row["folded_ms"] = round(
                timeit(lambda a, b_, c: fa_mod._flash_attention_impl(a, b_, c), q, k, v)
                * 1e3, 3)
        row["packed_ms"] = round(
            timeit(lambda a, b_, c: fa_mod._flash_attention_impl_packed(a, b_, c),
                   q, k, v) * 1e3, 3)
        # correctness spot-check on-chip
        ref = xla_attention(q, k, v).astype(jnp.float32)
        got = fa_mod._flash_attention_impl_packed(q, k, v).astype(jnp.float32)
        row["packed_max_abs_err"] = round(float(jnp.abs(got - ref).max()), 5)
        print(row, flush=True)


if __name__ == "__main__":
    main()
