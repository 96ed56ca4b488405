"""Pallas fused transformer FFN (GEGLU MLP): proj -> geglu -> proj, one kernel.

Reference behavior being fused: FeedForward
(/root/reference/diffbir/model/attention.py:50-76) — Linear(d, 2*4d) ->
GEGLU (h * gelu(gate), exact erf gelu) -> Linear(4d, d).

Why: the denoise step is HBM-bound (XLA cost analysis ~29.7 GB accessed vs
2.12 TFLOP, CLAUDE.md), and the FFN materializes two wide intermediates per
site — the (N, 8d) GEGLU projection and the (N, 4d) gated activation —
because conv/dot operands can't fuse with their producers. This kernel
streams row-blocks of x through both matmuls with the intermediates pinned
in VMEM: HBM traffic drops from ~(2*8d + 2*4d + 2d)*N*2 bytes to
(2d)*N*2 + weights. At the 512^2 top-level site (N=8192, d=320) that is
~125 MB -> ~10 MB per call.

**MEASURED E2E DEAD END (r5 on-chip, TPU_RUNBOOK_r5.json)** — the
step-level A/B: +4.60 ms/step (31.00 vs 26.40 ms), bench 1.478 vs
1.2596 s/image. The fused-ResBlock lesson (ops/fused_resblock.py
dead-end header) repeats a second time: a pallas_call is an
optimization barrier, and the lost neighbor fusion + per-call grid
overhead eat the HBM-traffic saving even though the FFN's boundary
neighbors are only a LayerNorm read and a residual add. With the
r5 ablation showing the whole FFN share is just 3.95 ms/step, the
theoretical ceiling never justified the boundary cost. Kept OPT-IN
(DIFFBIR_TPU_FUSED_FFN=1) as the third data point in the fused-block
evidence line (ResBlock x2 sessions, FFN x1): do NOT attempt the
whole-BasicTransformerBlock kernel on this toolchain without first
fixing the boundary-cost problem itself. The measured WIN against the
same transcendental-bound budget is DIFFBIR_TPU_FAST_GELU
(models/unet.py GEGLU): 1.2596 -> 1.178 s/image, drift-accounted in
GELU_QUALITY.json.

Grid: (row_blocks,); weights use constant index maps so Mosaic keeps them
resident in VMEM across the row sweep. fp32 accumulation in both dots,
gelu in fp32 (exact erf, matching LayerNormFp32-style precision policy);
bf16 operands use DEFAULT MXU precision (see ops/flash_attention.py note).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def enabled() -> bool:
    return os.environ.get("DIFFBIR_TPU_FUSED_FFN", "0") == "1"


def _prec(dtype):
    return (jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def _block_rows(n: int, d: int) -> int:
    # VMEM per row-block: x (bn,d) + h (bn,8d) f32 + act (bn,4d) f32 + out.
    # 512 rows at d=640 is ~16 MB of temporaries; weights add W1 (d,8d) +
    # W2 (4d,d). d=1280 (16^2 sites, N=512) drops to 256-row blocks to
    # keep temporaries + 39 MB of weights inside the scoped budget.
    bn = int(os.environ.get("DIFFBIR_TPU_FUSED_FFN_BN", 512 if d <= 640 else 256))
    return min(bn, n)


def _xla_ffn(x, w1, b1, w2, b2):
    """Reference math (identical to the unfused module path)."""
    dtype = x.dtype
    h = x @ w1.astype(dtype) + b1.astype(dtype)
    a, g = jnp.split(h, 2, axis=-1)
    act = a * jax.nn.gelu(g, approximate=False)
    return act @ w2.astype(dtype) + b2.astype(dtype)


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf, max abs err 1.5e-7 (fp32).

    Mosaic implements neither erf nor erfc (scripts/aot_lower_check.py
    caught both), so the exact-gelu path computes erf from exp — which the
    VPU does have (the flash kernel's softmax uses it)."""
    s = jnp.sign(x)
    z = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-z * z))


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, prec):
    x = x_ref[...]
    h = jax.lax.dot(
        x, w1_ref[...], preferred_element_type=jnp.float32, precision=prec
    ) + b1_ref[...].astype(jnp.float32)  # (bn, 2*inner) fp32
    a, g = jnp.split(h, 2, axis=-1)
    # exact-erf gelu matching the reference's F.gelu default (within the
    # 1.5e-7 _erf approximation — far below bf16 resolution)
    act = a * (0.5 * g * (1.0 + _erf(g * (2.0 ** -0.5))))
    o = jax.lax.dot(
        act.astype(x.dtype), w2_ref[...],
        preferred_element_type=jnp.float32, precision=prec,
    ) + b2_ref[...].astype(jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_ffn_impl(x, w1, b1, w2, b2, interpret: bool = False):
    n, d = x.shape
    inner2 = w1.shape[1]
    bn = _block_rows(n, d)
    pad = (-n) % bn
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    nb = (n + pad) // bn
    wdtype = x.dtype
    out = pl.pallas_call(
        functools.partial(_kernel, prec=_prec(wdtype)),
        out_shape=jax.ShapeDtypeStruct((n + pad, d), x.dtype),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bn, d), lambda i: (i, 0)),
            pl.BlockSpec((d, inner2), lambda i: (0, 0)),
            pl.BlockSpec((1, inner2), lambda i: (0, 0)),
            pl.BlockSpec((inner2 // 2, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bn, d), lambda i: (i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # weights resident + fp32 row-block temporaries; d=1280 site:
            # 39 MB weights + ~16 MB temporaries
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        xp,
        w1.astype(wdtype), b1.reshape(1, -1),
        w2.astype(wdtype), b2.reshape(1, -1),
    )
    return out[:n] if pad else out


@jax.custom_vjp
def fused_ffn(x: jax.Array, w1: jax.Array, b1: jax.Array,
              w2: jax.Array, b2: jax.Array) -> jax.Array:
    """x [N, D] @ W1 [D, 2I] -> GEGLU -> @ W2 [I, D]. Forward = Pallas
    kernel on TPU (XLA fallback elsewhere / odd shapes); backward = XLA
    recompute math (the fused forward acts as remat, like fused_resblock).
    Weights arrive fp32 from the param tree and are cast to x.dtype inside
    (same as nn.Dense with dtype=bf16, param_dtype=fp32)."""
    if supported(x, w1):
        return _fused_ffn_impl(x, w1, b1, w2, b2)
    return _xla_ffn(x, w1, b1, w2, b2)


def supported(x, w1) -> bool:
    if jax.default_backend() != "tpu" and not os.environ.get(
            "DIFFBIR_TPU_FUSED_FFN_FORCE"):
        return False
    n, d = x.shape
    inner2 = w1.shape[1]
    # lane alignment: d and inner2 multiples of 128; N >= one row block
    return d % 128 == 0 and inner2 % 256 == 0 and n >= 128


def _vjp_fwd(x, w1, b1, w2, b2):
    return fused_ffn(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _vjp_bwd(res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(_xla_ffn, x, w1, b1, w2, b2)
    return vjp(g)


fused_ffn.defvjp(_vjp_fwd, _vjp_bwd)
