"""Attention ops: XLA reference path + Pallas flash kernel dispatch.

The reference selects between xformers / torch-SDP / vanilla einsum at import
time (/root/reference/diffbir/model/attention.py:220-224,
/root/reference/diffbir/model/config.py:23-62). Here the same role is played
by a single functional entry point with an implementation switch:

- "xla":    einsum attention with fp32 logits/softmax (parity / CPU tests).
- "flash":  Pallas TPU flash-attention kernel (ops/flash_attention.py).
- "auto":   flash on TPU when shapes qualify, else xla.

Layout convention: q [B, Sq, H, D]; k, v [B, Skv, H, D]; returns [B, Sq, H, D].
Softmax and the QK product are computed in fp32 regardless of input dtype,
matching ATTN_PRECISION=fp32 semantics (reference attention.py:15,86-95).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def _env_mode() -> str:
    return os.environ.get("DIFFBIR_TPU_ATTN", "auto")


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Reference einsum attention with fp32 accumulation.

    mask: broadcastable to [B, H, Sq, Skv], True = keep.
    bias: broadcastable additive bias (e.g. Swin relative position bias).
    """
    orig_dtype = q.dtype
    d = q.shape[-1]
    scale = d ** -0.5
    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qf, kf)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(orig_dtype), v)
    return out.astype(orig_dtype)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    impl: Optional[str] = None,
) -> jax.Array:
    """Dispatching attention entry point used by all models."""
    impl = impl or _env_mode()
    if impl == "auto":
        # measured on v5e: the Pallas kernel wins big for 4096-token
        # self-attention (x2.4-2.5 vs XLA, scripts/bench_attention.py), but
        # the 1024/256-token margins wobble per-session in microbenches.
        # The step-level sweep settled it (TPU_RUNBOOK_r4b.json
        # flash_threshold_sweep, same-process re-jits): min-self 4096 ->
        # 26.80 ms/step, 1024 -> 27.19, 256 -> 27.67 — flash below 2048
        # tokens is a net step loss, so the default dispatches flash only
        # for >=2048-token self-attention. DIFFBIR_TPU_FLASH_MIN_SELF
        # overrides for A/Bs (scripts/profile_step_ablation.py
        # --flash_threshold_sweep).
        min_self = int(os.environ.get("DIFFBIR_TPU_FLASH_MIN_SELF", "2048"))
        if q.shape[-1] > 256:
            # wide single-head sites (VAE mid-block, d=512): XLA's einsum is
            # fine at the measured 512^2 headline scale (64^2=4096 tokens,
            # 67 MB fp32 logits) but materializes O(S^2) fp32 — 26.8 GB at
            # 81920 tokens (large untiled encodes; the first fidelity
            # dry-run OOM, TPU_RUNBOOK_r4b.json). Dispatch flash only where
            # the materialization starts to threaten HBM.
            min_self = int(
                os.environ.get("DIFFBIR_TPU_FLASH_MIN_WIDE", "8192"))
        big_self = q.shape[1] >= min_self and k.shape[1] == q.shape[1]
        impl = "flash" if _on_tpu() and mask is None and bias is None and big_self else "xla"
    if impl == "flash":
        from . import flash_attention

        if flash_attention.supported(q, k, v, mask, bias):
            return flash_attention.flash_attention(q, k, v)
        impl = "xla"
    if impl == "xla":
        return xla_attention(q, k, v, mask=mask, bias=bias)
    raise ValueError(f"unknown attention impl {impl!r}")
