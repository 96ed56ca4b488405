"""Flash-attention variant sweep on the real TPU.

Compares, at the two flash-dispatched SD2.1 shapes (4096/1024-token
self-attn, bf16, CFG batch 2):
  - ours fp32-exp (current default)
  - ours bf16-exp (DIFFBIR_TPU_FLASH_EXP=bf16)
  - jax.experimental.pallas.ops.tpu.flash_attention (upstream kernel)
  - XLA einsum attention

Usage: PYTHONPATH=/root/.axon_site python scripts/bench_attention_variants.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from diffbir_tpu.ops import flash_attention as fa_mod
from diffbir_tpu.ops.attention import xla_attention

CASES = [(2, 4096, 5, 64), (2, 1024, 10, 64)]


def timeit(fn, q, k, v, n=100):
    @jax.jit
    def loop(q, k, v):
        def body(i, acc):
            out = fn(acc, k, v)
            return acc + 0.001 * out

        return jax.lax.fori_loop(0, n, body, q)

    _ = float(jnp.sum(loop(q, k, v)))
    t0 = time.time()
    _ = float(jnp.sum(loop(q, k, v)))
    return (time.time() - t0) / n


def main():
    print(f"# device: {jax.devices()[0]}")
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as upstream,
        )

        def upstream_fn(q, k, v):
            # upstream layout is [B, H, S, D]
            qt = q.transpose(0, 2, 1, 3)
            kt = k.transpose(0, 2, 1, 3)
            vt = v.transpose(0, 2, 1, 3)
            o = upstream(qt, kt, vt, sm_scale=q.shape[-1] ** -0.5)
            return o.transpose(0, 2, 1, 3)
    except Exception as e:  # pragma: no cover
        print(f"# upstream kernel unavailable: {e}")
        upstream_fn = None

    for b, s, h, d in CASES:
        kq = jax.random.PRNGKey(0)
        q = jax.random.normal(kq, (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(kq, 1), (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(kq, 2), (b, s, h, d), jnp.bfloat16)

        t_xla = timeit(xla_attention, q, k, v)
        os.environ["DIFFBIR_TPU_FLASH_EXP"] = "fp32"
        t_f32 = timeit(fa_mod.flash_attention, q, k, v)
        os.environ["DIFFBIR_TPU_FLASH_EXP"] = "bf16"
        # new env value -> new traced program needed; jit caches key on fn id,
        # so wrap to force a fresh trace
        t_bf16 = timeit(lambda q, k, v: fa_mod.flash_attention(q, k, v), q, k, v)
        os.environ["DIFFBIR_TPU_FLASH_EXP"] = "fp32"
        row = {
            "shape": (b, s, h, d),
            "xla_ms": round(t_xla * 1e3, 3),
            "flash_fp32exp_ms": round(t_f32 * 1e3, 3),
            "flash_bf16exp_ms": round(t_bf16 * 1e3, 3),
        }
        if upstream_fn is not None:
            try:
                row["upstream_ms"] = round(timeit(upstream_fn, q, k, v) * 1e3, 3)
            except Exception as e:
                row["upstream_ms"] = f"error: {str(e)[:120]}"
        # accuracy of bf16-exp vs fp32 reference
        ref = xla_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                            v.astype(jnp.float32))
        os.environ["DIFFBIR_TPU_FLASH_EXP"] = "bf16"
        ours = fa_mod._flash_attention_impl(q, k, v, exp_bf16=True)
        os.environ["DIFFBIR_TPU_FLASH_EXP"] = "fp32"
        row["bf16exp_max_abs_err"] = round(
            float(jnp.abs(ours.astype(jnp.float32) - ref).max()), 5
        )
        print(row, flush=True)


if __name__ == "__main__":
    main()
