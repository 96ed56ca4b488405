"""Per-shape on-chip stress of the flash kernel at the REAL fidelity shapes.

The r4b fidelity dry-run died 4100 s in with a TPU worker crash ("kernel
fault", TPU_RUNBOOK_r4b.json step 15) with the new d=512/ragged flash paths
live. `scripts/check_flash_wide_chip.py` had only validated sq<=8200, while
the dry-run's 7 bucket programs (bucket=512, upscale 4, real47 shapes) hit:

  - VAE mid-block (b=1, h=1, d=512): sq = cond_h/8 * cond_w/8
        in {8192, 16384, 24576, 36864, 81920}
  - UNet/ControlNet top-level self-attn (b=2 CFG, h=5, d=64): the SAME
        token counts (attention_resolutions include ds=1), plus the /2 and
        /4 sites (identical shape family, smaller sq)

This script runs EVERY such shape in its own subprocess so a worker crash
names its shape instead of killing a 2 h run, and checks parity against a
chunked O(S) XLA reference (the full einsum would materialize 26.8 GB at
81920 tokens — the r4b step-12 OOM). Writes STRESS_FLASH.json.

Run: PYTHONPATH=/root/.axon_site python scripts/stress_flash_buckets.py
(one shape: ... stress_flash_buckets.py --one B SQ H D)
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# (B, SQ, H, D) — every distinct flash-dispatched self-attention shape across
# the 7 bucket programs (cond buckets 512x512 .. 2560x2048; latents /8; UNet
# attn at latent /1, /2, /4 with 5 heads of 64 at the top level).
SHAPES = [
    # d=512 VAE mid-block (flash when sq >= DIFFBIR_TPU_FLASH_MIN_WIDE=8192)
    (1, 8192, 1, 512),
    (1, 16384, 1, 512),
    (1, 24576, 1, 512),
    (1, 36864, 1, 512),
    (1, 81920, 1, 512),
    # d=64 UNet top-level self-attn, CFG batch 2 (flash when sq >= 2048)
    (2, 4096, 5, 64),
    (2, 8192, 5, 64),
    (2, 16384, 5, 64),
    (2, 20480, 5, 64),
    (2, 24576, 5, 64),
    (2, 36864, 5, 64),
    (2, 81920, 5, 64),
    # ragged q regression (bucket=0 exact-x64 path)
    (1, 8200, 1, 512),
    (2, 3300, 5, 64),
]


def chunked_reference(q, k, v, chunk=1024):
    """O(S * chunk) attention reference: fp32 logits/softmax, per-(b,h) and
    per-q-chunk via lax.map — never materializes the [S, S] score matrix."""
    import jax
    import jax.numpy as jnp

    b, sq, h, d = q.shape
    scale = d ** -0.5
    pad = (-sq) % chunk
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0))) if pad else q
    nq = (sq + pad) // chunk
    # fold heads; fp32 once
    qf = qp.transpose(0, 2, 1, 3).reshape(b * h, sq + pad, d).astype(jnp.float32)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, k.shape[1], d).astype(jnp.float32)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, k.shape[1], d).astype(jnp.float32)

    def one_bh(args):
        qb, kb, vb = args

        def one_chunk(qc):
            logits = (qc * scale) @ kb.T  # (chunk, S) fp32
            w = jax.nn.softmax(logits, axis=-1)
            return w.astype(v.dtype).astype(jnp.float32) @ vb

        return jax.lax.map(one_chunk, qb.reshape(nq, chunk, d)).reshape(
            sq + pad, d)

    out = jax.lax.map(one_bh, (qf, kf, vf))
    out = out[:, :sq].reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    return out.astype(q.dtype)


def run_one(b, sq, h, d):
    import jax
    import jax.numpy as jnp

    from diffbir_tpu.ops.flash_attention import flash_attention

    shape = (b, sq, h, d)
    kshape = (b, sq, h, d)
    q = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), kshape, jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), kshape, jnp.bfloat16)
    t0 = time.time()
    o = jax.jit(flash_attention)(q, k, v)
    s = float(jnp.sum(o.astype(jnp.float32)))  # force through the tunnel
    t_flash = time.time() - t0
    if not (s == s):  # NaN
        print(f"FAIL {shape}: flash output NaN", flush=True)
        return 1
    t0 = time.time()
    r = jax.jit(chunked_reference)(q, k, v)
    jax.block_until_ready(r)
    t_ref = time.time() - t0
    err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - r.astype(jnp.float32))))
    # bf16 inputs, fp32 accumulation both sides; softmax weights rounded to
    # bf16 in the reference PV too — tolerance covers the exp/rounding paths
    ok = err <= 2e-2
    # steady-state flash timing (3 reps, fetch a scalar each time)
    reps = []
    for _ in range(3):
        t0 = time.time()
        o = jax.jit(flash_attention)(q, k, v)
        float(jnp.sum(o.astype(jnp.float32)))
        reps.append(time.time() - t0)
    print(json.dumps({
        "shape": shape, "err": err, "ok": ok,
        "t_first_s": round(t_flash, 2), "t_ref_s": round(t_ref, 2),
        "t_warm_s": round(min(reps), 4),
    }), flush=True)
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", nargs=4, type=int, default=None,
                    metavar=("B", "SQ", "H", "D"))
    args = ap.parse_args()
    if args.one:
        sys.exit(run_one(*args.one))

    results = []
    for shape in SHAPES:
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--one", *map(str, shape)],
            capture_output=True, text=True)
        rec = {"shape": list(shape), "rc": p.returncode,
               "wall_s": round(time.time() - t0, 1)}
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if line:
            rec.update(json.loads(line[-1]))
        if p.returncode != 0:
            rec["tail"] = (p.stdout + p.stderr)[-1500:]
            print(f"CRASH/FAIL at shape {shape} rc={p.returncode}", flush=True)
            print(rec["tail"], flush=True)
        else:
            print(f"ok {shape} warm={rec.get('t_warm_s')}s "
                  f"err={rec.get('err'):.2e}", flush=True)
        results.append(rec)
        with open(os.path.join(ROOT, "STRESS_FLASH.json"), "w") as f:
            json.dump(results, f, indent=1)
        if p.returncode != 0:
            print("stopping at first failure — shape isolated", flush=True)
            break
    n_ok = sum(r["rc"] == 0 for r in results)
    print(f"STRESS_FLASH: {n_ok}/{len(results)} ok "
          f"({len(SHAPES)} planned)", flush=True)
    sys.exit(0 if n_ok == len(SHAPES) else 1)


if __name__ == "__main__":
    main()
