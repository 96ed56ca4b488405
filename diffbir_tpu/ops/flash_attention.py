"""Pallas TPU flash-attention forward kernel.

TPU-native replacement for the reference's xformers
``memory_efficient_attention`` / torch-SDP backends
(/root/reference/diffbir/model/attention.py:113-216,
/root/reference/diffbir/model/vae.py:168-283).

Online-softmax tiling: grid = (batch*heads, q_blocks, kv_blocks); kv is the
innermost (sequential) dimension; fp32 running max / sum / accumulator live in
VMEM scratch and the output tile is written on the last kv step.

Shapes are UNet/VAE scale: self-attention over (h·w) tokens — 4096 at 512^2
latents, up to ~82k for the VAE mid-block on large untiled encodes — and
cross-attention to 77 text tokens (padded to 128 by the caller via
``pad_kv``). head_dim is 64 (UNet) or 512 (VAE single-head: smaller 512^2
blocks keep the fp32 logit tiles in VMEM; XLA einsum at that width would
materialize the full [S,S] fp32 score matrix — 26.8 GB at 81920 tokens, the
on-chip OOM that killed the first fidelity dry-run, TPU_RUNBOOK_r4b.json).
Query lengths that don't divide the block are zero-padded and cropped (rows
are independent under softmax, so padded queries are garbage-in/cropped-out).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _exp_bf16() -> bool:
    # Measured (v5e, scripts/bench_attention_variants.py): bf16-exp is NOT a
    # win — 0.950 ms vs 0.893 fp32 at (2,4096,5,64), tie at (2,1024,10,64) —
    # the kernel is not exp-throughput-bound (matches the earlier exp2
    # experiment). Kept as an env toggle for future re-measurement on other
    # TPU generations. Same sweep: ours-fp32 0.893 ms vs upstream pallas
    # flash 4.635 ms and XLA einsum 2.142 ms at 4096 tokens.
    import os

    return os.environ.get("DIFFBIR_TPU_FLASH_EXP", "fp32") == "bf16"


def _block_sizes(sq: int, skv: int, d: int = 64):
    # v5e sweep at 4096 tokens, d=64 (bf16 operands): (2048,1024) 0.831 ms,
    # (1024,1024) 0.887, (512,1024) 0.906, (1024,2048) 0.932; (2048,2048)
    # exceeds the 16 MB scoped-vmem limit. 1024-token maps clamp to
    # (1024,1024) via min(). See /tmp-style sweep in scripts/bench_attention.py.
    # Wider heads shrink the blocks to keep the fp32 (BQ,BK) s/p temporaries
    # plus the (BQ,D) accumulator inside the scoped-VMEM budget:
    # d=512 at (512,512) is s/p 1 MB each + acc 1 MB.
    import os

    if d >= 512:
        dq, dk = 512, 512
    elif d >= 256:
        dq, dk = 1024, 1024
    else:
        dq, dk = 2048, 1024
    bq = int(os.environ.get("DIFFBIR_TPU_FLASH_BQ", dq))
    bk = int(os.environ.get("DIFFBIR_TPU_FLASH_BK", dk))
    return min(bq, sq), min(bk, skv)


def supported(q, k, v, mask=None, bias=None) -> bool:
    if mask is not None or bias is not None:
        return False
    if q.ndim != 4:
        return False
    b, sq, h, d = q.shape
    skv = k.shape[1]
    if d not in (64, 128, 256, 512):
        return False
    # q remainder is zero-padded and cropped; kv remainder is masked
    return sq >= 128 and skv >= 16


def _kernel(q_ref, k_ref, v_ref, o_ref, *rest, sm_scale, kv_len, masked,
            exp_bf16=False, with_lse=False):
    if with_lse:
        lse_ref, m_ref, l_ref, acc_ref = rest
    else:
        lse_ref = None
        m_ref, l_ref, acc_ref = rest
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # bf16 operands with fp32 accumulation: bf16 x bf16 products are exact in
    # fp32, so this equals the fp32 dot for bf16 inputs at ~4x MXU throughput;
    # sm_scale is applied to the fp32 logits (not the bf16 operand).
    # Precision is pinned per-dtype (NOT inherited from the global
    # jax_default_matmul_precision, whose float32 setting would make Mosaic
    # lower bf16 dots as 3-pass emulation): bf16 -> DEFAULT (single pass),
    # fp32 -> HIGHEST (full fp32, what the parity tests compare against).
    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (BK, D)
    prec = (jax.lax.Precision.DEFAULT if q.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    ) * sm_scale  # (BQ, BK) fp32

    bk = k.shape[0]
    if masked:
        # mask kv padding (only compiled in when skv % block != 0 — the
        # iota+compare+select costs ~3 VPU ops per logit otherwise)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * bk
        s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_ref[:]  # (BQ, 128) — replicated along lanes
    m_cur = jnp.max(s, axis=-1, keepdims=True)  # (BQ, 1)
    m_next = jnp.maximum(m_prev, m_cur)  # (BQ, 128)
    alpha = jnp.exp(m_prev[:, :1] - m_next[:, :1])  # (BQ, 1)
    if exp_bf16:
        # bf16 transcendental: ~2x VPU rate on packed lanes. p is cast to
        # bf16 for the PV dot anyway; only the softmax denominator loses
        # precision (fp32 accumulation over bf16 terms, ~1e-3 relative).
        p = jnp.exp((s - m_next[:, :1]).astype(jnp.bfloat16))
        l_ref[:] = l_ref[:] * alpha + jnp.sum(
            p.astype(jnp.float32), axis=-1, keepdims=True
        )
    else:
        p = jnp.exp(s - m_next[:, :1])  # (BQ, BK)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = m_next

    v = v_ref[0]  # (BK, D)
    pv = jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32,
        precision=prec,
    )  # (BQ, D)
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(ki == nk - 1)
    def _store():
        l = l_ref[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_ref[:] * l_inv).astype(o_ref.dtype)
        if with_lse:
            # logsumexp per q row, lane-replicated (layout matches m/l
            # scratch — no cross-lane transpose on the store path)
            lse_ref[0] = m_ref[:] + jnp.log(jnp.where(l == 0.0, 1.0, l))


def _fwd_layout() -> str:
    import os

    # "packed": kernel reads/writes the model's native [B,S,H*D] layout via
    # per-head static lane slices inside the kernel — no fold/unfold
    # transposes (q,k,v,o ~21 MB of pure layout HBM traffic per 4096-token
    # site with the folded path) and k/v tiles are fetched once for ALL
    # heads. "folded": transpose to [B*H,S,D] first (round-1/2 behavior).
    return os.environ.get("DIFFBIR_TPU_FLASH_LAYOUT", "folded")


@jax.custom_vjp
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """q [B,Sq,H,D]; k,v [B,Skv,H,D] -> [B,Sq,H,D]. Forward = Pallas kernel;
    backward = Pallas dq + dkv kernels over saved (q,k,v,o,lse) — no S^2
    score matrix ever hits HBM in either direction (the previous backward
    differentiated the XLA formulation, materializing fp32 [Sq,Skv] tensors;
    at 4096 tokens that is 671 MB/layer of round-trips in the train step).
    DIFFBIR_TPU_FLASH_BWD=xla restores the old recompute path."""
    if _fwd_layout() == "packed":
        return _flash_attention_impl_packed(q, k, v, exp_bf16=_exp_bf16())
    return _flash_attention_impl(q, k, v, exp_bf16=_exp_bf16())


def _bwd_xla() -> bool:
    import os

    return os.environ.get("DIFFBIR_TPU_FLASH_BWD", "pallas") == "xla"


def _flash_fwd(q, k, v):
    if _bwd_xla():
        return _flash_attention_impl(q, k, v, exp_bf16=_exp_bf16()), (
            q, k, v, None, None)
    o, lse = _flash_attention_impl(
        q, k, v, exp_bf16=_exp_bf16(), return_lse=True
    )
    return o, (q, k, v, o, lse)


def _flash_bwd(res, g):
    q, k, v, o, lse = res
    if o is None:  # xla fallback (recompute)
        from .attention import xla_attention

        _, vjp = jax.vjp(xla_attention, q, k, v)
        return vjp(g)
    return _flash_attention_bwd_impl(q, k, v, o, lse, g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


# --------------------------------------------------------------------------- #
# packed-layout forward: [B, S, H*D] blocks, per-head static lane slices
#
# The folded path spends real HBM on layout: transpose q,k,v to [B*H,S,D]
# before the kernel and o back after it (~21 MB per 4096-token site at CFG
# batch 2), and its (bh, qi, ki) grid re-fetches k/v tiles once PER HEAD.
# Here the kernel consumes the projection's native packed layout directly:
# one (bq, H*D) q tile and one (bk, H*D) k/v tile per grid step serve all
# heads via static lane slices (Mosaic lowers the d=64 offsets to vreg
# shifts — cheap next to the per-head MXU dots). Per-head running max/sum
# live side-by-side in lane-aligned 128-wide scratch stripes.
# --------------------------------------------------------------------------- #
def _packed_block_sizes(sq: int, skv: int):
    import os

    bq = int(os.environ.get("DIFFBIR_TPU_FLASH_PACKED_BQ", 1024))
    bk = int(os.environ.get("DIFFBIR_TPU_FLASH_PACKED_BK", 1024))
    skv128 = ((skv + 127) // 128) * 128  # short-kv (77-token) -> one 128 block
    return min(bq, sq), min(bk, skv128)


def _kernel_packed(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                   sm_scale, kv_len, masked, heads, dim, exp_bf16):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qt, kt, vt = q_ref[0], k_ref[0], v_ref[0]
    prec = (jax.lax.Precision.DEFAULT if qt.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    if qt.dtype == jnp.bfloat16:
        # scale q once per tile (bq x H*D elements) instead of every logit
        # (heads x bq x bk): one bf16 rounding of q*scale, inside the
        # kernel's existing bf16 tolerance.
        qt = (qt.astype(jnp.float32) * sm_scale).astype(qt.dtype)
        s_scale = 1.0
    else:
        s_scale = sm_scale  # fp32 path stays bit-identical to the folded one
    col = None
    if masked:
        bk = kt.shape[0]
        col = jax.lax.broadcasted_iota(
            jnp.int32, (qt.shape[0], bk), 1) + ki * bk

    for hh in range(heads):
        hd = slice(hh * dim, (hh + 1) * dim)
        hl = slice(hh * 128, (hh + 1) * 128)
        s = jax.lax.dot_general(
            qt[:, hd], kt[:, hd], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        if s_scale != 1.0:
            s = s * s_scale
        if masked:
            s = jnp.where(col < kv_len, s, NEG_INF)
        m_prev = m_ref[:, hl]  # (BQ, 128) lane-replicated
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev[:, :1] - m_next[:, :1])
        if exp_bf16:
            p = jnp.exp((s - m_next[:, :1]).astype(jnp.bfloat16))
            l_new = l_ref[:, hl] * alpha + jnp.sum(
                p.astype(jnp.float32), axis=-1, keepdims=True)
        else:
            p = jnp.exp(s - m_next[:, :1])
            l_new = l_ref[:, hl] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        l_ref[:, hl] = l_new
        m_ref[:, hl] = m_next
        pv = jax.lax.dot(
            p.astype(vt.dtype), vt[:, hd], preferred_element_type=jnp.float32,
            precision=prec,
        )
        acc_ref[:, hd] = acc_ref[:, hd] * alpha + pv

    @pl.when(ki == nk - 1)
    def _store():
        for hh in range(heads):
            hd = slice(hh * dim, (hh + 1) * dim)
            l = l_ref[:, hh * 128: hh * 128 + 1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, :, hd] = (acc_ref[:, hd] * l_inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "exp_bf16"))
def _flash_attention_impl_packed(
    q: jax.Array, k: jax.Array, v: jax.Array, interpret: bool = False,
    exp_bf16: bool = False,
):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    sm_scale = d ** -0.5
    bq, bk = _packed_block_sizes(sq, skv)
    if sq % bq:
        return _flash_attention_impl(q, k, v, interpret=interpret,
                                     exp_bf16=exp_bf16)

    qp = q.reshape(b, sq, h * d)
    kp = k.reshape(b, skv, h * d)
    vp = v.reshape(b, skv, h * d)
    pad = (-skv) % bk
    if pad:
        kp = jnp.pad(kp, ((0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(vp, ((0, 0), (0, pad), (0, 0)))
    nq, nk = sq // bq, (skv + pad) // bk

    out = pl.pallas_call(
        functools.partial(_kernel_packed, sm_scale=sm_scale, kv_len=skv,
                          masked=pad != 0, heads=h, dim=d, exp_bf16=exp_bf16),
        out_shape=jax.ShapeDtypeStruct((b, sq, h * d), q.dtype),
        grid=(b, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, h * d), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, bk, h * d), lambda bi, qi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, bk, h * d), lambda bi, qi, ki: (bi, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, h * d), lambda bi, qi, ki: (bi, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((bq, 128 * h), jnp.float32),  # per-head running max
            pltpu.VMEM((bq, 128 * h), jnp.float32),  # per-head running sum
            pltpu.VMEM((bq, h * d), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # the per-head fp32 s/p temporaries plus the packed acc and the
            # lane-striped m/l scratch sit well above the 16 MB default at
            # the (1024, 1024, H=20) widest site; v5e has 128 MB physical.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, sq, h, d)


# --------------------------------------------------------------------------- #
# backward kernels
#
# Residuals: q,k,v,o (input dtype) + lane-replicated lse (fp32). Per-row
# delta D = rowsum(dO * O) is recomputed in-kernel from o/do tiles (cheap
# elementwise, saves a separate pass + plumbing). Two kernels because the
# natural accumulation axes differ: dq accumulates over kv blocks, dk/dv
# over q blocks — each gets the matching sequential grid axis.
# --------------------------------------------------------------------------- #
def _bwd_block_sizes(sq: int, skv: int, d: int = 64):
    # backward holds ~4 (BQ, BK) fp32 temporaries (s, p, dp, ds) at once;
    # (1024, 1024) keeps them at 4 MB each — the pallas_calls below raise
    # the scoped-vmem limit to 32 MB to give the compiler's stack headroom
    # for these plus the block inputs (the 16 MB default was measured
    # insufficient on the forward's lse variant; v5e has 128 MB physical).
    # d=512 (VAE single-head) halves the blocks so the (BQ,D) tiles and
    # accumulators stay inside the same budget.
    import os

    dq = dk = 512 if d >= 512 else 1024
    bq = int(os.environ.get("DIFFBIR_TPU_FLASH_BWD_BQ", dq))
    bk = int(os.environ.get("DIFFBIR_TPU_FLASH_BWD_BK", dk))
    return min(bq, sq), min(bk, skv)


def _dq_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref, dq_ref, acc_ref,
               *, sm_scale, kv_len, masked):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    o, do = o_ref[0], do_ref[0]
    prec = (jax.lax.Precision.DEFAULT if q.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    ) * sm_scale
    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * k.shape[0]
        s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0][:, :1])  # (BQ, BK) fp32; 0 in masked cols
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    )  # (BQ, BK)
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )  # (BQ, 1)
    ds = p * (dp - delta) * sm_scale  # (BQ, BK) fp32
    acc_ref[:] += jax.lax.dot(
        ds.astype(q.dtype), k, preferred_element_type=jnp.float32,
        precision=prec,
    )

    @pl.when(ki == nk - 1)
    def _store():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref, dk_ref, dv_ref,
                dk_acc, dv_acc, *, sm_scale, kv_len, masked):
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    o, do = o_ref[0], do_ref[0]
    prec = (jax.lax.Precision.DEFAULT if q.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    ) * sm_scale  # (BQ, BK)
    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        col = col + pl.program_id(1) * k.shape[0]
        s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0][:, :1])
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    )
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )
    ds = p * (dp - delta) * sm_scale
    # contract over the q-row axis (dim 0 of both operands)
    dv_acc[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (BK, D)
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (BK, D)

    @pl.when(qi == nq - 1)
    def _store():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _flash_attention_bwd_impl(q, k, v, o, lse, g, interpret: bool = False):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    sm_scale = d ** -0.5
    bq, bk = _bwd_block_sizes(sq, skv, d)

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], x.shape[-1])

    qf, kf, vf, of, gf = fold(q), fold(k), fold(v), fold(o), fold(g)
    # pad the q-side rows (q, o, dO, lse) to a block multiple: padded rows
    # have q=dO=0, so their dk/dv contributions vanish (ds=0, p^T.dO=0) and
    # the garbage dq rows are cropped below
    qpad = (-sq) % bq
    if qpad:
        qf = jnp.pad(qf, ((0, 0), (0, qpad), (0, 0)))
        of = jnp.pad(of, ((0, 0), (0, qpad), (0, 0)))
        gf = jnp.pad(gf, ((0, 0), (0, qpad), (0, 0)))
        lse = jnp.pad(lse, ((0, 0), (0, qpad), (0, 0)))
    sqp = sq + qpad
    pad = (-skv) % bk
    if pad:
        kf = jnp.pad(kf, ((0, 0), (0, pad), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, pad), (0, 0)))
    nq, nk = sqp // bq, (skv + pad) // bk
    masked = pad != 0

    common = dict(sm_scale=sm_scale, kv_len=skv, masked=masked)
    in_q = pl.BlockSpec((1, bq, d), lambda bh, i, j: (bh, i, 0))
    in_lse = pl.BlockSpec((1, bq, 128), lambda bh, i, j: (bh, i, 0))
    in_kv_dq = pl.BlockSpec((1, bk, d), lambda bh, i, j: (bh, j, 0))
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, **common),
        out_shape=jax.ShapeDtypeStruct((b * h, sqp, d), q.dtype),
        grid=(b * h, nq, nk),
        in_specs=[in_q, in_kv_dq, in_kv_dq, in_q, in_lse, in_q],
        out_specs=pl.BlockSpec((1, bq, d), lambda bh, i, j: (bh, i, 0)),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # four (BQ, BK) fp32 temporaries (s, p, dp, ds) ~= 16 MB at the
            # (1024,1024) default blocks; give the scoped stack headroom
            # beyond the 16 MB default (see the forward's note).
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qf, kf, vf, of, lse, gf)

    in_q_seq = pl.BlockSpec((1, bq, d), lambda bh, i, j: (bh, j, 0))
    in_lse_seq = pl.BlockSpec((1, bq, 128), lambda bh, i, j: (bh, j, 0))
    in_kv = pl.BlockSpec((1, bk, d), lambda bh, i, j: (bh, i, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, **common),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, skv + pad, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, skv + pad, d), v.dtype),
        ],
        grid=(b * h, nk, nq),
        in_specs=[in_q_seq, in_kv, in_kv, in_q_seq, in_lse_seq, in_q_seq],
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec((1, bk, d), lambda bh, i, j: (bh, i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=32 * 1024 * 1024,  # see _dq_kernel's note
        ),
        interpret=interpret,
    )(qf, kf, vf, of, lse, gf)
    if pad:
        dk, dv = dk[:, :skv], dv[:, :skv]
    if qpad:
        dq = dq[:, :sq]

    def unfold(x, s):
        return x.reshape(b, h, s, d).transpose(0, 2, 1, 3)

    return unfold(dq, sq), unfold(dk, skv), unfold(dv, skv)


@functools.partial(
    jax.jit, static_argnames=("interpret", "exp_bf16", "return_lse")
)
def _flash_attention_impl(
    q: jax.Array, k: jax.Array, v: jax.Array, interpret: bool = False,
    exp_bf16: bool = False, return_lse: bool = False,
):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    sm_scale = d ** -0.5
    bq, bk = _block_sizes(sq, skv, d)

    # fold heads into batch; layout (BH, S, D)
    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qf, kf, vf = fold(q), fold(k), fold(v)
    # pad q to a multiple of bq (rows are independent under softmax: padded
    # queries produce garbage rows that are cropped below, no mask needed)
    qpad = (-sq) % bq
    if qpad:
        qf = jnp.pad(qf, ((0, 0), (0, qpad), (0, 0)))
    sqp = sq + qpad
    # pad kv to a multiple of bk (masked inside the kernel)
    pad = (-skv) % bk
    if pad:
        kf = jnp.pad(kf, ((0, 0), (0, pad), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, pad), (0, 0)))
    nq, nk = sqp // bq, (skv + pad) // bk

    out_shape = jax.ShapeDtypeStruct((b * h, sqp, d), q.dtype)
    out_spec = pl.BlockSpec((1, bq, d), lambda bh, qi, ki: (bh, qi, 0))
    if return_lse:
        # lane-replicated lse (BH, Sq, 128): matches the (bq, 128) scratch
        # layout so the store is a copy, not a transpose; the bwd kernels
        # consume column 0 via [:, :1].
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b * h, sqp, 128), jnp.float32)]
        out_spec = [out_spec,
                    pl.BlockSpec((1, bq, 128), lambda bh, qi, ki: (bh, qi, 0))]

    out = pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale, kv_len=skv,
                          masked=pad != 0, exp_bf16=exp_bf16,
                          with_lse=return_lse),
        out_shape=out_shape,
        grid=(b * h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, bk, d), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda bh, qi, ki: (bh, ki, 0)),
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),  # running max (lane-replicated)
            pltpu.VMEM((bq, 128), jnp.float32),  # running sum
            pltpu.VMEM((bq, d), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # the (2048,1024) fp32 s/p temporaries sit at ~16 MB; the extra
            # lane-replicated lse output buffer pushed the scoped-vmem stack
            # 168 KB over the 16 MB default (measured OOM, v5e train step).
            # Raise the scoped budget instead of shrinking the measured-fast
            # blocks; v5e has 128 MB physical VMEM.
            vmem_limit_bytes=24 * 1024 * 1024 if return_lse else None,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    if return_lse:
        o, lse = out
        if qpad:
            o, lse = o[:, :sq], lse[:, :sq]
        return o.reshape(b, h, sq, d).transpose(0, 2, 1, 3), lse
    if qpad:
        out = out[:, :sq]
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)
