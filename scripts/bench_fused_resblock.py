"""Microbench: Pallas fused ResBlock vs the XLA module path, per UNet shape.

Run on the real TPU (PYTHONPATH=/root/.axon_site python scripts/bench_fused_resblock.py).
Shapes = SD2.1 UNet ResBlock sites at 512^2 (64x64 latent), batch 2 (CFG).
The dispatch policy in ops/fused_resblock.py should encode this table's
conclusions (fall back to XLA where fused loses).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Policy discovery: attempt the kernel at EVERY site (the production
# dispatch table in ops/fused_resblock.py is then set FROM this table).
# Read before import.
os.environ.setdefault("DIFFBIR_TPU_FUSED_VMEM", str(1 << 40))
os.environ.setdefault("DIFFBIR_TPU_FUSED_MIN_HW", "0")
os.environ.setdefault("DIFFBIR_TPU_FUSED_TABLE", "0")

import jax
import jax.numpy as jnp

from diffbir_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

from diffbir_tpu.models.cldm import quantize_conv_params
from diffbir_tpu.models.unet import ResBlock

# (cin, cout, h, w) — encoder, middle, and decoder(concat) sites at 64x64 base
SHAPES = [
    (320, 320, 64, 64),
    (320, 640, 32, 32),
    (640, 640, 32, 32),
    (640, 1280, 16, 16),
    (1280, 1280, 16, 16),
    (1280, 1280, 8, 8),
    (640, 320, 64, 64),    # decoder concat (320+320)
    (960, 320, 64, 64),    # decoder concat (320+640)
    (1280, 640, 32, 32),
    (1920, 640, 32, 32),
    (2560, 1280, 16, 16),  # big concat — expected XLA fallback
    (2560, 1280, 8, 8),
]
BATCH = int(os.environ.get("BENCH_B", 2))
REPS = int(os.environ.get("BENCH_REPS", 30))


def timed(fn, *args):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))  # force through the tunnel
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
    print(f"# device: {jax.devices()[0]}  batch={BATCH}")
    total_x, total_f = 0.0, 0.0
    for cin, cout, h, w in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), (BATCH, h, w, cin),
                              jnp.bfloat16)
        emb = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 1280),
                                jnp.bfloat16)
        mod = ResBlock(cout, dtype=jnp.bfloat16)
        mod_f = ResBlock(cout, dtype=jnp.bfloat16, fused=True)
        mod_q = ResBlock(cout, dtype=jnp.bfloat16, fused=True, quant_conv=True)
        params = jax.tree.map(
            lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
            mod.init(jax.random.PRNGKey(2), x, emb),
        )
        pq = quantize_conv_params({"unet": params["params"], "controlnet": {}})
        params_q = {"params": pq["unet"]}
        f_x = jax.jit(lambda p, a, b: mod.apply(p, a, b))
        f_f = jax.jit(lambda p, a, b: mod_f.apply(p, a, b))
        f_q = jax.jit(lambda p, a, b: mod_q.apply(p, a, b))

        def attempt(fn, p, tag):
            try:
                return timed(fn, p, x, emb)
            except Exception as exc:  # noqa: BLE001 — report per-shape failures
                print(f"  {tag} failed for {(cin, cout, h, w)}: {exc}")
                return float("nan")

        ms_f = attempt(f_f, params, "fused")
        ms_q = attempt(f_q, params_q, "fused[int8]")
        ms_x = timed(f_x, params, x, emb)
        total_x += ms_x
        best = min(v for v in (ms_x, ms_f, ms_q) if v == v)
        total_f += best
        sp_f = ms_x / ms_f if ms_f == ms_f else float("nan")
        sp_q = ms_x / ms_q if ms_q == ms_q else float("nan")
        print(f"cin={cin:5d} cout={cout:5d} {h:3d}x{w:<3d}  "
              f"xla {ms_x:7.3f} ms  fused {ms_f:7.3f} ms (x{sp_f:.2f})  "
              f"int8 {ms_q:7.3f} ms (x{sp_q:.2f})")
    print(f"# sum over sites: xla {total_x:.2f} ms, best-of {total_f:.2f} ms")


if __name__ == "__main__":
    main()
