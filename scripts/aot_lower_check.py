"""AOT-lower every Pallas kernel for the TPU platform from the CPU host.

``jax.export.export(jit_fn, platforms=("tpu",))`` runs the full
Pallas->Mosaic lowering + MLIR verification without needing a chip, which
catches block-shape rule violations and Mosaic verifier bugs that
interpret-mode tests cannot see (it caught the fused-ResBlock emb BlockSpec
and the bf16-silu broadcast bug). The Mosaic *backend* compile still only
runs on the device, so this is necessary-not-sufficient — but it is the
cheapest pre-TPU gate we have while the tunnel is down.

Run: python scripts/aot_lower_check.py   (forces CPU; safe anywhere)
Exit code != 0 if any production shape fails to lower.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

FAILS = []


def check(name, fn, *args):
    try:
        jax.export.export(jax.jit(fn), platforms=("tpu",))(*args)
        print(f"ok   {name}")
    except Exception as exc:  # noqa: BLE001
        FAILS.append(name)
        print(f"FAIL {name}: {type(exc).__name__}: {str(exc)[:300]}")


def z(shape, dtype=jnp.bfloat16):
    return jnp.zeros(shape, dtype)


def main():
    # ---- flash attention forward (UNet self-attn sites, bf16) ----
    from diffbir_tpu.ops import flash_attention as fa

    for seq, heads in ((4096, 5), (1024, 10)):
        q = z((2, seq, heads, 64))
        check(f"flash_fwd seq={seq}", fa.flash_attention, q, q, q)

    # wide single-head (VAE mid-block, d=512) — incl. the 81920-token
    # fidelity-scale shape and a ragged (q-padded) length
    for seq in (4096, 81920, 52800):
        q = z((1, seq, 1, 512))
        check(f"flash_fwd_vae seq={seq} d=512", fa.flash_attention, q, q, q)
    # ragged q at the UNet head layout (q zero-pad + crop path)
    q = z((2, 2500, 5, 64))
    check("flash_fwd ragged seq=2500", fa.flash_attention, q, q, q)

    # packed [B,S,H*D] forward: all SD2.1 self-attn sites + 77-token cross
    for seq, skv, heads in (
        (4096, 4096, 5), (1024, 1024, 10), (256, 256, 20),
        (4096, 77, 5), (1024, 77, 10), (256, 77, 20),
    ):
        q = z((2, seq, heads, 64))
        kv = z((2, skv, heads, 64))
        check(
            f"flash_fwd_packed seq={seq} skv={skv}",
            lambda a, b, c: fa._flash_attention_impl_packed(a, b, c),
            q, kv, kv,
        )

    # ---- flash attention backward (training shapes) ----
    def bwd(q, k, v):
        f = lambda a, b, c: jnp.sum(fa.flash_attention(a, b, c).astype(jnp.float32))
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    for seq, heads in ((4096, 5), (1024, 10)):
        q = z((2, seq, heads, 64))
        check(f"flash_bwd seq={seq}", bwd, q, q, q)

    # ---- int8/int4 weight-only matmul (M-tiled dense serving + LLaVA),
    # through the public dispatcher so block sizes match production ----
    from diffbir_tpu.ops.quant_matmul import quant_matmul, quant_matmul_int4

    qm = functools.partial(quant_matmul, force="pallas")
    qm4 = functools.partial(quant_matmul_int4, force="pallas")
    for m, k, n in ((8192, 1280, 1280), (77, 1024, 4096), (1, 4096, 11008)):
        check(f"quant_int8 m={m} k={k} n={n}", qm,
              z((m, k)), z((k, n), jnp.int8), z((n,), jnp.float32))

    for m, k, n in ((1, 4096, 4096), (16, 4096, 11008)):
        check(f"quant_int4 m={m} k={k} n={n}", qm4,
              z((m, k)), z((k // 2, n), jnp.int8),
              z((k // 128, n), jnp.float32))

    # ---- fused ResBlock (every SD2.1 UNet site that dispatches to Pallas) ----
    from diffbir_tpu.ops.fused_resblock import _pallas_fused_resblock

    sites = [
        (320, 320, 64, 64), (640, 320, 64, 64), (960, 320, 64, 64),
        (320, 640, 32, 32), (640, 640, 32, 32), (1280, 640, 32, 32),
        (1920, 640, 32, 32), (640, 1280, 16, 16), (1280, 1280, 16, 16),
        (1280, 1280, 8, 8),
    ]
    for cin, cout, h, w in sites:
        skip = cin != cout
        bias = z((cout,), jnp.float32)
        args = (
            z((2, h, w + 2, cin)), z((2, cout)),
            z((cin,), jnp.float32), z((cin,), jnp.float32),
            z((3, 3, cin, cout), jnp.float32), bias,
            z((cout,), jnp.float32), z((cout,), jnp.float32),
            z((3, 3, cout, cout), jnp.float32), bias,
            z((1, 1, cin, cout), jnp.float32) if skip else None,
            bias if skip else None,
        )
        f = functools.partial(_pallas_fused_resblock, groups=32, eps=1e-5)
        check(f"fused_resblock cin={cin} cout={cout} {h}x{w}", f, *args)

    # ---- fused ResBlock, int8 weight-only mode (quant_conv serving) ----
    # Includes the 2560-in decoder concat site the fp mode excludes by VMEM.
    for cin, cout, h, w in sites + [(2560, 1280, 16, 16)]:
        skip = cin != cout
        bias = z((cout,), jnp.float32)
        scale = z((cout,), jnp.float32)
        args = (
            z((2, h, w + 2, cin)), z((2, cout)),
            z((cin,), jnp.float32), z((cin,), jnp.float32),
            z((3, 3, cin, cout), jnp.int8), bias,
            z((cout,), jnp.float32), z((cout,), jnp.float32),
            z((3, 3, cout, cout), jnp.int8), bias,
            z((1, 1, cin, cout), jnp.int8) if skip else None,
            bias if skip else None,
        )
        f = functools.partial(_pallas_fused_resblock, s1=scale, s2=scale,
                              ss=scale if skip else None,
                              groups=32, eps=1e-5)
        check(f"fused_resblock[int8] cin={cin} cout={cout} {h}x{w}", f, *args)

    # ---- fused FFN (GEGLU MLP) — every SD2.1 transformer site, batch-2
    # CFG row counts (N = 2 * tokens) ----
    from diffbir_tpu.ops.fused_ffn import _fused_ffn_impl

    for tokens, d in ((4096, 320), (1024, 640), (256, 1280)):
        inner = d * 4
        check(
            f"fused_ffn N={2*tokens} d={d}", _fused_ffn_impl,
            z((2 * tokens, d)), z((d, inner * 2), jnp.float32),
            z((inner * 2,), jnp.float32), z((inner, d), jnp.float32),
            z((d,), jnp.float32),
        )
    # 1024^2 tiled site (4096 tokens at d=640) + a ragged row count
    check("fused_ffn N=8192 d=640", _fused_ffn_impl,
          z((8192, 640)), z((640, 5120), jnp.float32),
          z((5120,), jnp.float32), z((2560, 640), jnp.float32),
          z((640,), jnp.float32))
    check("fused_ffn ragged N=6600 d=320", _fused_ffn_impl,
          z((6600, 320)), z((320, 2560), jnp.float32),
          z((2560,), jnp.float32), z((1280, 320), jnp.float32),
          z((320,), jnp.float32))

    print(f"\n{len(FAILS)} failures" if FAILS else "\nall kernels lower for tpu")
    sys.exit(1 if FAILS else 0)


if __name__ == "__main__":
    main()
