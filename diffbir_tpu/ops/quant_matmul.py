"""int8 weight-only quantized matmul (Pallas TPU kernel + XLA fallback).

The reference serves LLaVA's 7B language model through bitsandbytes 4/8-bit
quantized linears (/root/reference/llava/model/builder.py:26-80). The
TPU-native equivalent (SURVEY.md §2.10) is a weight-only int8 matmul: weights
live in HBM as int8 with one fp32 scale per output channel, and the kernel
dequantizes tiles in VMEM right before the MXU dot. Token-by-token LLM
decoding is bandwidth-bound on weight reads, so int8 weights halve the
HBM traffic per step vs bf16 (and quarter it vs fp32) with <0.5% matmul
error for LLM weight distributions.

Quantization is symmetric per-output-channel: w ≈ w_q * scale[None, :].
The scale multiply commutes with the K-reduction, so applying it after the
accumulated dot is exact (not an approximation).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def quantize_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[K, N] float -> (int8 [K, N], fp32 scale [N]) symmetric per-channel."""
    w = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def _xla_quant_matmul(x: jax.Array, w_q: jax.Array, scale: jax.Array) -> jax.Array:
    """Fallback: dequantize-then-dot (XLA fuses the dequant into the dot
    operand on TPU; exact same math as the kernel)."""
    acc = jnp.dot(
        x.astype(jnp.bfloat16), w_q.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return (acc * scale[None, :]).astype(x.dtype)


def _kernel(x_ref, wq_ref, scale_ref, out_ref, acc_ref):
    """Grid (m_tiles, n_tiles, k_tiles); K is the minor (sequential) axis so
    the fp32 accumulator carries across K steps of one (M, N) tile."""
    from jax.experimental import pallas as pl

    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = wq_ref[:].astype(jnp.bfloat16)  # int8 -> bf16 in VMEM
    # pin DEFAULT precision: a global jax_default_matmul_precision=float32
    # (parity tests) otherwise lowers this bf16 dot as 3-pass emulation,
    # which Mosaic rejects ("Bad lhs type")
    acc_ref[:] += jnp.dot(
        x_ref[:].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )

    @pl.when(k == nk - 1)
    def _done():
        out_ref[:] = (acc_ref[:] * scale_ref[:].astype(jnp.float32)).astype(
            out_ref.dtype
        )


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "block_k", "interpret")
)
def _pallas_quant_matmul(
    x: jax.Array, w_q: jax.Array, scale: jax.Array,
    block_m: int = 512, block_n: int = 512, block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = x.shape
    k2, n = w_q.shape
    assert k == k2 and scale.shape == (n,)
    # M is tiled (UNet prefill rows can be 8k+, too big for one VMEM tile).
    # Pad M to the bf16 sublane tile (16): the kernel's dot runs bf16xbf16
    # and Mosaic rejects sub-tile bf16 operands ("Bad lhs type" at m_pad=8);
    # for multi-tile M pad to the block size.
    bm = min(block_m, m + (-m) % 16)
    m_pad = (-m) % bm
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    mp = x.shape[0]
    bn = min(block_n, n)
    bk = min(block_k, k)
    assert n % bn == 0 and k % bk == 0, (
        f"quant_matmul needs N%{bn}==0 and K%{bk}==0 (got N={n}, K={k})"
    )
    grid = (mp // bm, n // bn, k // bk)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((mp, n), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda mi, ni, ki: (mi, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda mi, ni, ki: (ki, ni), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda mi, ni, ki: (0, ni), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda mi, ni, ki: (mi, ni), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(x, w_q, scale.reshape(1, n))
    return out[:m] if m_pad else out


# --------------------------------------------------------------------------- #
# int4 (packed) weight-only matmul
#
# The reference's DEFAULT LLaVA load is 4-bit bitsandbytes
# (/root/reference/llava/model/builder.py:32-41). TPU equivalent: two int4
# nibbles per int8 byte in HBM with per-group fp32 scales along K (groupwise
# symmetric quant, like bnb NF4's blockwise scales but with a uniform grid,
# which keeps the dequant a multiply on the MXU path). Per-group scales do
# NOT commute with the K-reduction, so the kernel dequantizes the weight
# tile in VMEM (int4 -> bf16 * scale) before the dot.
#
# Packing layout ("window-halved"): K is split into windows of W logical
# rows; within a window, low nibbles hold rows [0, W/2) and high nibbles
# rows [W/2, W). Unpacking a window is then two arithmetic shifts plus one
# CONTIGUOUS concat along sublanes — no lane interleave on the minor dim.
# --------------------------------------------------------------------------- #
INT4_WINDOW = 256  # logical K rows per pack window (divides 4096 and 11008)


def quantize_weight_int4(
    w: jax.Array, group_size: int = 128, window: int = INT4_WINDOW
) -> Tuple[jax.Array, jax.Array]:
    """[K, N] float -> (packed int8 [K/2, N], fp32 scales [K/group_size, N]).

    Symmetric per-(group, output-channel) quant to [-7, 7]; pairs are packed
    along K in the window-halved layout described above.
    """
    k, n = w.shape
    # groups must tile each window (unpack restores original row order inside
    # a window, so groups may span the half boundary but not a window edge)
    assert k % window == 0 and window % 2 == 0 and window % group_size == 0, (
        k, window, group_size)
    w = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w.reshape(k // group_size, group_size, n)), axis=1)
    scale = jnp.maximum(absmax / 7.0, 1e-8)  # [K/g, N]
    q = jnp.clip(
        jnp.round(w / jnp.repeat(scale, group_size, axis=0)), -7, 7
    ).astype(jnp.int32)
    half = window // 2
    qw = q.reshape(k // window, window, n)
    lo = qw[:, :half] & 0xF
    hi = qw[:, half:] & 0xF
    packed = jax.lax.bitcast_convert_type(
        (lo | (hi << 4)).astype(jnp.uint8), jnp.int8
    )
    return packed.reshape(k // 2, n), scale


def quantize_weight_np(w) -> Tuple["np.ndarray", "np.ndarray"]:
    """Host (numpy) twin of :func:`quantize_weight` — bit-identical packing
    without touching the device. Needed to build synthetic 7B-scale weight
    sets on the 125 GB host: the jnp version would materialize the fp32
    source on the 16 GB v5e HBM before quantizing (scripts/bench_llava.py)."""
    import numpy as np

    w = np.asarray(w, np.float32)
    absmax = np.max(np.abs(w), axis=0)
    scale = np.maximum(absmax / 127.0, 1e-8).astype(np.float32)
    q = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
    return q, scale


def quantize_weight_int4_np(
    w, group_size: int = 128, window: int = INT4_WINDOW
) -> Tuple["np.ndarray", "np.ndarray"]:
    """Host (numpy) twin of :func:`quantize_weight_int4` (same window-halved
    packing; see quantize_weight_np for why it exists)."""
    import numpy as np

    k, n = w.shape
    assert k % window == 0 and window % 2 == 0 and window % group_size == 0, (
        k, window, group_size)
    w = np.asarray(w, np.float32)
    absmax = np.max(np.abs(w.reshape(k // group_size, group_size, n)), axis=1)
    scale = np.maximum(absmax / 7.0, 1e-8).astype(np.float32)
    q = np.clip(
        np.round(w / np.repeat(scale, group_size, axis=0)), -7, 7
    ).astype(np.int32)
    half = window // 2
    qw = q.reshape(k // window, window, n)
    lo = qw[:, :half] & 0xF
    hi = qw[:, half:] & 0xF
    packed = (lo | (hi << 4)).astype(np.uint8).view(np.int8)
    return packed.reshape(k // 2, n), scale


def _unpack_int4(packed: jax.Array, window: int = INT4_WINDOW) -> jax.Array:
    """[K/2, N] packed int8 -> [K, N] int32 in [-7, 7] (window-halved layout)."""
    kp, n = packed.shape
    half = window // 2
    p = packed.reshape(kp // half, half, n).astype(jnp.int32)
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(p, 28), 28)
    hi = jax.lax.shift_right_arithmetic(jax.lax.shift_left(p, 24), 28)
    return jnp.concatenate([lo, hi], axis=1).reshape(kp * 2, n)


def _xla_quant_matmul_int4(
    x: jax.Array, packed: jax.Array, scale: jax.Array, window: int = INT4_WINDOW
) -> jax.Array:
    k = packed.shape[0] * 2
    g = k // scale.shape[0]
    w_int = _unpack_int4(packed, window)
    w = (w_int.reshape(scale.shape[0], g, -1) * scale[:, None, :]).reshape(
        k, -1
    ).astype(jnp.bfloat16)
    acc = jnp.dot(
        x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    return acc.astype(x.dtype)


def _kernel_int4(x_ref, wq_ref, scale_ref, out_ref, acc_ref, *, window, gpw):
    """Grid (n_tiles, k_windows); one K step = one pack window of `window`
    logical rows (window/2 packed int8 rows). ``scale_ref`` is this window's
    sublane-padded scale block ([rpw>=8, bn], rows [0, gpw) valid): the
    window step happens in the BlockSpec index map, so the in-kernel row
    slice is STATIC. (The previous dynamic ``dslice(j*gpw, gpw)`` failed the
    Mosaic backend — 'cannot statically prove index is a multiple of 8' —
    at every llama shape, where gpw=2; interpret-mode tests and the AOT
    lowering gate both miss backend-only errors like this.)"""
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p = wq_ref[:].astype(jnp.int32)  # [window/2, bn]
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(p, 28), 28)
    hi = jax.lax.shift_right_arithmetic(jax.lax.shift_left(p, 24), 28)
    w_int = jnp.concatenate([lo, hi], axis=0)  # [window, bn]
    bn = scale_ref.shape[-1]
    scale_w = scale_ref[:gpw, :]  # static slice of the padded window block
    w = (
        w_int.reshape(gpw, window // gpw, bn).astype(jnp.float32)
        * scale_w[:, None, :]
    ).reshape(window, bn).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(
        x_ref[:].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )

    @pl.when(j == nk - 1)
    def _done():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_n", "window", "interpret")
)
def _pallas_quant_matmul_int4(
    x: jax.Array, packed: jax.Array, scale: jax.Array,
    block_n: int = 512, window: int = INT4_WINDOW, interpret: bool = False,
) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = x.shape
    kp, n = packed.shape
    assert k == kp * 2 and scale.shape[1] == n and k % window == 0
    groups_per_window = window // (k // scale.shape[0])
    m_pad = (-m) % 16
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    bm = x.shape[0]
    bn = min(block_n, n)
    assert n % bn == 0, (n, bn)
    grid = (n // bn, k // window)
    # sublane-align the scales per window: gpw rows (2 at the llama
    # group=128) padded up to 8 so each window's scale block starts at a
    # provably 8-aligned row and the kernel slices it statically
    rpw = -(-groups_per_window // 8) * 8
    scale_p = jnp.pad(
        scale.reshape(k // window, groups_per_window, n),
        ((0, 0), (0, rpw - groups_per_window), (0, 0)),
    ).reshape(k // window * rpw, n)
    out = pl.pallas_call(
        functools.partial(_kernel_int4, window=window, gpw=groups_per_window),
        out_shape=jax.ShapeDtypeStruct((bm, n), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, window), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (window // 2, bn), lambda i, j: (j, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((rpw, bn), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(x, packed, scale_p)
    return out[:m] if m_pad else out


def quant_matmul_int4(
    x: jax.Array, packed: jax.Array, scale: jax.Array, force: str = None
) -> jax.Array:
    """x [.., K] @ dequant_int4(packed [K/2, N], scale [K/g, N]) -> [.., N]."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    k = packed.shape[0] * 2
    n = packed.shape[1]
    use_pallas = force == "pallas"
    if force is None:
        use_pallas = (
            jax.default_backend() == "tpu"
            and n % 256 == 0 and k % INT4_WINDOW == 0
            and x2.shape[0] <= 1024
        )
    if use_pallas:
        bn = 512 if n % 512 == 0 else 256
        out = _pallas_quant_matmul_int4(x2, packed, scale, block_n=bn)
    else:
        out = _xla_quant_matmul_int4(x2, packed, scale)
    return out.reshape(lead + (n,))


def quant_matmul(
    x: jax.Array, w_q: jax.Array, scale: jax.Array, force: str = None
) -> jax.Array:
    """x [.., K] @ dequant(w_q [K, N]) -> [.., N].

    Dispatch: the Pallas kernel on TPU for aligned shapes, XLA elsewhere
    (identical math). ``force`` in {"pallas", "xla"} overrides (tests).
    """
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    k, n = w_q.shape
    use_pallas = force == "pallas"
    bn = next((b for b in (512, 256, 128) if n % b == 0), None)
    bk = next((b for b in (1024, 512, 256, 128) if k % b == 0), None)
    if force is None:
        # lane-aligned N/K go through the kernel at any M (M is tiled);
        # 128-unaligned dims (e.g. the UNet's 320/960-channel level) fall
        # back to XLA dequant-into-dot.
        use_pallas = (
            jax.default_backend() == "tpu" and bn is not None and bk is not None
        )
    if use_pallas:
        out = _pallas_quant_matmul(x2, w_q, scale, block_n=bn or n, block_k=bk or k)
    else:
        out = _xla_quant_matmul(x2, w_q, scale)
    return out.reshape(lead + (n,))


class QuantLinear:
    """Weight-only int8 linear: y = quant_matmul(x, w_q, scale) + b."""

    def __init__(self, w: jax.Array, b: jax.Array = None):
        self.w_q, self.scale = quantize_weight(w)
        self.b = b

    def __call__(self, x: jax.Array) -> jax.Array:
        y = quant_matmul(x, self.w_q, self.scale)
        if self.b is not None:
            y = y + self.b
        return y
