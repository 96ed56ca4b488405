"""On-chip parity check of the wide-head (d=512) + ragged-q flash paths.

The VAE mid-block single-head attention (d=512) and non-block-multiple query
lengths dispatch to the Pallas kernel for >=8192-token encodes
(ops/attention.py DIFFBIR_TPU_FLASH_MIN_WIDE). Interpret-mode tests and the
AOT lowering gate both pass for these shapes, but Mosaic *backend*-only
failures are a demonstrated risk (the int4 scale-slice bug) — so this script
runs the real kernel on the chip at a moderate shape and checks it against
the XLA einsum before the fidelity dry-run bets 2 h of chip time on it.

Run: PYTHONPATH=/root/.axon_site python scripts/check_flash_wide_chip.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from diffbir_tpu.ops.attention import xla_attention
from diffbir_tpu.ops.flash_attention import flash_attention


def check(name, shape, dtype=jnp.bfloat16, atol=2e-2):
    q = jax.random.normal(jax.random.PRNGKey(0), shape, dtype)
    k = jax.random.normal(jax.random.PRNGKey(1), shape, dtype)
    v = jax.random.normal(jax.random.PRNGKey(2), shape, dtype)
    o = jax.jit(flash_attention)(q, k, v)
    r = jax.jit(xla_attention)(q, k, v)
    err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - r.astype(jnp.float32))))
    ok = err <= atol
    print(f"{'ok  ' if ok else 'FAIL'} {name}: max|flash-xla| = {err:.2e}",
          flush=True)
    return ok


def main():
    results = [
        # VAE mid-block single head, block-multiple tokens
        check("d512 sq=8192", (1, 8192, 1, 512)),
        # ragged q (zero-pad + crop): 8200 % 512 != 0
        check("d512 ragged sq=8200", (1, 8200, 1, 512)),
        # UNet-head ragged (fidelity exact-shape latents)
        check("d64 ragged sq=3300", (2, 3300, 5, 64)),
    ]
    print("FLASH_WIDE_OK" if all(results) else "FLASH_WIDE_FAIL", flush=True)
    sys.exit(0 if all(results) else 1)


if __name__ == "__main__":
    main()
