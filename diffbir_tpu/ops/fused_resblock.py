"""Pallas fused ResBlock: the whole GN->SiLU->conv3x3->+emb->GN->SiLU->conv3x3
(+skip) block in one kernel, activations never leaving VMEM.

Why: the denoise step is HBM-bound (XLA cost analysis: ~29.7 GB accessed vs
2.12 TFLOP per step, CLAUDE.md), and the ResBlock is its worst offender — the
XLA path materializes the activation ~6x per block (GN stats read, normalized
write+read into conv1, conv1 out, GN2 stats read, normalized write+read into
conv2) because conv operands cannot fuse with their producers. This kernel
reads x once and writes the residual sum once; conv weights stream beside it.
Reference behavior being fused: ResBlock
(/root/reference/diffbir/model/unet.py:111-223) under the GroupNorm32 fp32
policy (/root/reference/diffbir/model/util.py:191-193).

Layout trick (no 3D reshapes inside the kernel): every activation lives as a
2D (H*Wp, C) array where Wp = W + 2 and the last two columns of each row
stripe are zeros ("garbage columns"). In this flattened-padded layout, a
3x3 conv is 9 row-shifted matmuls: out[t] += y[t + ky*Wp + kx] @ w[ky,kx]
with the zero columns acting as the left/right halo of the NEXT/PREVIOUS
row stripe (a shift by Wp+1 rows turns the compact stripe layout into the
centered padded layout). Grid is (batch,); one program owns one image.

Differentiable via custom VJP (Pallas forward + XLA-math backward — the fused
forward acts as remat; int8 weight mode stays serving-only). Dispatch falls
back to XLA (same math, one jitted graph) off-TPU or when the block's VMEM
footprint (big concat-skip channels) exceeds the budget.

DEAD-END ANALYSIS (round 4, status: OPT-IN ONLY — e2e loss on hardware).
Measured on the chip across two independent sessions: e2e 512x512 50-step
latency with the fused kernel is 1.463 s (r3, TPU_RUNBOOK_r3.json) and
1.398 s (r4, TPU_RUNBOOK_r4.json) vs 1.291 s exact — a ~2.1-3.4 ms/step
regression — even though the summed per-site microbench predicts a ~3.4
ms/step WIN (17.42 vs 20.81 ms, scripts/bench_fused_resblock.py). The gap
is a kernel-boundary effect, not kernel-internal cost: (a) a pallas_call is
an optimization barrier, so the neighbors XLA used to fuse into the
ResBlock's first GN read and last conv write (timestep-emb broadcast, skip
adds, the next block's GN stats pass) become separate HBM round-trips that
the microbench — which times the block in isolation against an equally
isolated XLA block — cannot see; (b) per-site win ratios are session-noisy
(the (1280,1280,64) site swung x1.63 -> x0.59 same-day, see the dispatch
table note below), so the table picks sites by noise; (c) at batch 2 the
grid is 2 programs, leaving the core under-occupied while XLA pipelines
adjacent ops. Conclusion: block-level fusion of conv-bearing blocks does
NOT pay on this model at these shapes; the win the microbench shows is
real only for the block in isolation. The kernel stays for (i) the int8
conv path, (ii) shapes/batches where occupancy changes the balance, but it
is demoted from the bench matrix and must never become the default without
a fresh two-session e2e win.

Bisect CLOSED (r5 on-chip, TPU_RUNBOOK_r5.json): single-best-site-only
(MIN_WIN=1.7, just the x1.70 (2560,1280,256) site) measures 1.4023 s e2e
and the two-site config (MIN_WIN=1.4) measures 1.4033 s — statistically
the SAME loss as the full config (1.398-1.463 across sessions). One
pallas call anywhere in the denoise scan costs ~0.14 s/image and adding
sites does not compound: the penalty is a FIXED structural cost —
candidate (a), the optimization barrier, specifically the scan-body-level
scheduling/pipelining XLA gives up around any custom call — not (b)
noisy site tables. This also predicted the fused-FFN kernel's +4.6
ms/step loss (ops/fused_ffn.py, r5) and rules out the
whole-BasicTransformerBlock kernel on this toolchain.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32


def _prec(dtype):
    # Same policy as ops/flash_attention.py: bf16 -> DEFAULT single-pass MXU
    # (a global jax_default_matmul_precision=float32 would otherwise make
    # Mosaic emulate 3-pass); fp32 -> HIGHEST (what parity tests compare).
    return (jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def _silu(v):
    # jax.nn.silu on bf16 inside a TPU Pallas kernel trips a Mosaic
    # verification bug (f32 constant broadcast into a bf16 vector inside
    # sigmoid's lowering); compute the gate in fp32 and cast back.
    vf = v.astype(_F32)
    return (vf * jax.nn.sigmoid(vf)).astype(v.dtype)


def _group_affine(s1, v_c, scale, bias, groups: int, eps: float):
    """Per-channel fp32 moments (1, C) -> per-channel GN affine (1, C) rows.

    Same parallel-variance fold as models.layers.gn_fold_moments, but
    expressed as two tiny one-hot matmuls (C x g) so it lowers cleanly in
    Mosaic (no minor-dim reshapes of width C/g)."""
    c = s1.shape[-1]
    cg = c // groups
    cid = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cg
    gid = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    m = (cid == gid).astype(_F32)  # (C, g) group membership
    mt = m.T  # (g, C)
    hi = jax.lax.Precision.HIGHEST
    m_g = jnp.dot(s1, m, precision=hi) / cg          # (1, g)
    mean = jnp.dot(m_g, mt, precision=hi)            # (1, C) per-group mean
    dm = s1 - mean
    var_g = jnp.dot(v_c + dm * dm, m, precision=hi) / cg
    var = jnp.dot(var_g, mt, precision=hi)
    a = jax.lax.rsqrt(var + eps) * scale
    b = bias - mean * a
    return a, b


def _conv3x3(src, w_ref, h: int, wp: int, prec):
    """src: (>= h*wp + 2*wp + 2, C) flattened-padded rows; w_ref: (9, C, Co).

    Returns fp32 (h*wp, Co): out[t] = sum_taps src[t + ky*wp + kx] @ w[tap],
    i.e. a cross-correlation (torch/flax conv convention).

    int8 weights (quant serving mode) are cast per tap to the activation
    dtype — integers <= 127 are exact in bf16 — and the caller applies the
    per-output-channel scale ONCE on the fp32 accumulator (exact: the scale
    factors out of the tap/channel sums)."""
    n = h * wp
    acc = None
    for ky in range(3):
        for kx in range(3):
            off = ky * wp + kx
            w = w_ref[ky * 3 + kx]
            if w.dtype == jnp.int8:
                w = w.astype(src.dtype)
            part = jnp.dot(
                src[off:off + n], w,
                preferred_element_type=_F32, precision=prec,
            )
            acc = part if acc is None else acc + part
    return acc


def _kernel(x_ref, e_ref, g1s_ref, g1b_ref, w1_ref, b1_ref,
            g2s_ref, g2b_ref, w2_ref, b2_ref, *rest,
            h: int, w: int, groups: int, eps: float, has_skip: bool,
            quant: bool = False):
    if quant:
        s1_ref, s2_ref = rest[0], rest[1]
        rest = rest[2:]
    if has_skip:
        if quant:
            ws_ref, ss_ref, bs_ref, o_ref = rest
        else:
            ws_ref, bs_ref, o_ref = rest
    else:
        o_ref = rest[0]
    x = x_ref[0]  # (h*wp, Cin), garbage cols already zero (padded outside)
    dtype = x.dtype
    prec = _prec(dtype)
    wp = w + 2
    n = h * wp
    hw = h * w
    col = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) % wp
    valid = (col < w).astype(_F32)  # (n, 1) kills the garbage columns

    # ---- GN1 (fp32 stats; identical math to models.layers.GroupNorm32) ----
    xf = x.astype(_F32)
    s1 = jnp.sum(xf, axis=0, keepdims=True) / hw            # (1, Cin)
    d = (xf - s1) * valid
    v1 = jnp.sum(d * d, axis=0, keepdims=True) / hw
    a1, b1a = _group_affine(s1, v1, g1s_ref[:].astype(_F32),
                            g1b_ref[:].astype(_F32), groups, eps)
    y = _silu(x * a1.astype(dtype) + b1a.astype(dtype))
    y = y * valid.astype(dtype)

    # ---- conv1 + bias + time-embedding channel vector ----
    zpre = jnp.zeros((wp + 1, y.shape[-1]), dtype)
    src1 = jnp.concatenate([zpre, y, zpre], axis=0)
    acc = _conv3x3(src1, w1_ref, h, wp, prec)
    if quant:
        acc = acc * s1_ref[:].astype(_F32)
    h1f = acc + b1_ref[:].astype(_F32) + e_ref[0].astype(_F32)
    h1 = (h1f * valid).astype(dtype)  # mask BEFORE GN2 stats

    # ---- GN2 + SiLU ----
    hf = h1.astype(_F32)
    s2 = jnp.sum(hf, axis=0, keepdims=True) / hw
    d2 = (hf - s2) * valid
    v2 = jnp.sum(d2 * d2, axis=0, keepdims=True) / hw
    a2, b2a = _group_affine(s2, v2, g2s_ref[:].astype(_F32),
                            g2b_ref[:].astype(_F32), groups, eps)
    y2 = _silu(h1 * a2.astype(dtype) + b2a.astype(dtype))
    y2 = y2 * valid.astype(dtype)  # conv2 halo must be zeros

    # ---- conv2 (zero-init at train start) + bias ----
    zpre2 = jnp.zeros((wp + 1, y2.shape[-1]), dtype)
    src2 = jnp.concatenate([zpre2, y2, zpre2], axis=0)
    h2 = _conv3x3(src2, w2_ref, h, wp, prec)
    if quant:
        h2 = h2 * s2_ref[:].astype(_F32)
    h2 = h2 + b2_ref[:].astype(_F32)

    # ---- skip connection ----
    if has_skip:
        wsk = ws_ref[0]
        if wsk.dtype == jnp.int8:
            wsk = wsk.astype(dtype)
        skip = jnp.dot(x, wsk, preferred_element_type=_F32, precision=prec)
        if quant:
            skip = skip * ss_ref[:].astype(_F32)
        skip = skip + bs_ref[:].astype(_F32)
    else:
        skip = x.astype(_F32)
    o_ref[0] = (skip + h2).astype(dtype)


def _vmem_bytes(h, w, cin, cout, itemsize, w_itemsize=None):
    wp = w + 2
    n = h * wp
    w_itemsize = itemsize if w_itemsize is None else w_itemsize
    acts = n * (cin * 4 + cout * 7) * itemsize  # x/y/src copies + accs (~)
    wgt = 9 * (cin + cout) * cout * w_itemsize + (cin * cout * w_itemsize)
    if w_itemsize < itemsize:
        # quant mode: one (Cin, Cout) tap transiently cast to compute dtype
        wgt += cin * cout * itemsize
    return acts + wgt


@functools.partial(jax.jit, static_argnames=("groups", "eps", "interpret"))
def _pallas_fused_resblock(xs, e, g1s, g1b, w1, b1, g2s, g2b, w2, b2,
                           ws, bs, s1=None, s2=None, ss=None,
                           groups: int = 32, eps: float = 1e-5,
                           interpret: bool = False):
    """xs: (B, H, Wp, Cin) with the last 2 columns zero. Returns the strided
    (B, H, Wp, Cout) output (caller slices [:, :, :W]).

    ``s1/s2/ss`` present => int8 weight-only mode: w1/w2/ws stream as int8
    (half the weight HBM bytes + VMEM) and the per-output-channel scales are
    applied on the fp32 accumulators."""
    bsz, hh, wpad, cin = xs.shape
    ww = wpad - 2
    cout = w1.shape[-1]
    dtype = xs.dtype
    has_skip = ws is not None
    quant = s1 is not None
    x2 = xs.reshape(bsz, hh * wpad, cin)

    def wcast(v):  # weights stay int8 in quant mode, else compute dtype
        return v if v.dtype == jnp.int8 else v.astype(dtype)

    def row(v):  # (C,) param -> (1, C) fp32 VMEM row
        return v.astype(_F32).reshape(1, -1)

    args = [
        x2,
        e.astype(dtype).reshape(bsz, 1, cout),
        row(g1s), row(g1b),
        wcast(w1).reshape(9, cin, cout), row(b1),
        row(g2s), row(g2b),
        wcast(w2).reshape(9, cout, cout), row(b2),
    ]
    const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, hh * wpad, cin), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        const(1, cin), const(1, cin),
        const(9, cin, cout), const(1, cout),
        const(1, cout), const(1, cout),
        const(9, cout, cout), const(1, cout),
    ]
    if quant:
        args += [row(s1), row(s2)]
        in_specs += [const(1, cout), const(1, cout)]
    if has_skip:
        args += [wcast(ws).reshape(1, cin, cout)]
        in_specs += [const(1, cin, cout)]
        if quant:
            args += [row(ss)]
            in_specs += [const(1, cout)]
        args += [row(bs)]
        in_specs += [const(1, cout)]

    kernel = functools.partial(_kernel, h=hh, w=ww, groups=groups, eps=eps,
                               has_skip=has_skip, quant=quant)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, hh * wpad, cout), dtype),
        grid=(bsz,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hh * wpad, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **kwargs,
    )(*args)
    return out.reshape(bsz, hh, wpad, cout)


def quantize_conv_weight(w):
    """fp32 conv kernel (..., Cout) -> (int8 same-shape, f32 (Cout,) scales).

    Symmetric per-output-channel over all leading dims (taps + Cin); mirrors
    ops/quant_matmul.quantize_weight for 2-D dense kernels."""
    wf = jnp.asarray(w, _F32)
    amax = jnp.max(jnp.abs(wf), axis=tuple(range(wf.ndim - 1)))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _dequant_p(p, dtype):
    """Quantized fused-ResBlock param dict -> float dict (XLA fallback)."""
    out = dict(p)
    for wk, sk in (("w1", "s1"), ("w2", "s2"), ("w_skip", "s_skip")):
        qk = wk + "_q" if wk != "w_skip" else "w_skip_q"
        if out.get(qk) is not None:
            out[wk] = out.pop(qk).astype(dtype) * out.pop(sk).astype(dtype)
    return out


def _xla_fused_resblock(x, e, p, groups: int, eps: float):
    """Fallback with the exact module math (models/unet.py ResBlock)."""
    from ..models.layers import gn_fold_moments

    dtype = x.dtype
    if "w1_q" in p:
        p = _dequant_p(p, dtype)

    def gn(v, scale, bias):
        vf = v.astype(_F32)
        s1 = jnp.mean(vf, axis=(1, 2))
        d = vf - s1[:, None, None, :]
        v_c = jnp.mean(d * d, axis=(1, 2))
        a, b = gn_fold_moments(s1, v_c, scale.astype(_F32),
                               bias.astype(_F32), groups, eps)
        a = a[:, None, None, :].astype(dtype)
        b = b[:, None, None, :].astype(dtype)
        return v * a + b

    def conv3(v, w, b):
        out = jax.lax.conv_general_dilated(
            v, w.astype(dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + b.astype(dtype)

    y = jax.nn.silu(gn(x, p["gn1_scale"], p["gn1_bias"]))
    h = conv3(y, p["w1"], p["b1"]) + e[:, None, None, :].astype(dtype)
    y2 = jax.nn.silu(gn(h, p["gn2_scale"], p["gn2_bias"]))
    h2 = conv3(y2, p["w2"], p["b2"])
    if p.get("w_skip") is not None:
        skip = jax.lax.conv_general_dilated(
            x, p["w_skip"].astype(dtype), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["b_skip"].astype(dtype)
    else:
        skip = x
    return skip + h2


# ~matches the v5e VMEM budget minus pipelining headroom; concat-skip blocks
# at ds4/ds8 (Cin up to 2560 -> 88 MB of weights alone) fall back to XLA.
_VMEM_BUDGET = int(os.environ.get("DIFFBIR_TPU_FUSED_VMEM", 72 * 1024 * 1024))
# minimum spatial positions for kernel dispatch — tune from
# scripts/bench_fused_resblock.py (small grids underutilize the MXU and the
# XLA path may win there).
_MIN_HW = int(os.environ.get("DIFFBIR_TPU_FUSED_MIN_HW", 0))

# Measured per-site dispatch (v5e, batch 2, scripts/bench_fused_resblock.py,
# 2026-08-18): keyed (cin, cout, h*w) -> measured kernel-vs-XLA speedup. The
# win pattern is not monotone in any single knob (equal-channel and
# decoder-concat sites win, channel-widening and mid-grid 16x16 sites lose),
# so measured sites dispatch from this table; unmeasured shapes fall back to
# the VMEM/MIN_HW heuristic above.
# CAVEAT (measured 2026-08-18 + re-confirmed 2026-08-19): dispatching every
# >=1.05x site made the END-TO-END 50-step bench SLOWER in two independent
# sessions (1.456-1.463 s r3, 1.398 s r4, vs 1.291 s exact) — isolated
# per-site wins don't survive graph context (Pallas call boundaries break
# XLA's surrounding fusions); see the module-header dead-end analysis.
# DIFFBIR_TPU_FUSED_MIN_WIN default 1.05 therefore equals the
# every-winner config, which IS the measured e2e-loss config: fused mode
# remains a net e2e loss at the default threshold and is opt-in only.
# Raising MIN_WIN (e.g. 1.4) dispatches only the large-margin sites — the
# r4 runbook bisect measures whether ANY subset wins e2e.
# DIFFBIR_TPU_FUSED_TABLE=0 disables the table (the microbench sets it to
# force kernel attempts at every site).
# Ratios from the 23:34 session (same tunnel session as the e2e headline).
# NOTE cross-session instability: an earlier same-day run measured
# (1280,1280,64) at x1.63 float; this session it is x0.59 — per-site numbers
# only transfer within a session, so refresh this table (bench_fused_resblock)
# in the same session as any e2e decision.
_TABLE_FLOAT = {  # float fused kernel measured speedup vs XLA
    (320, 320, 4096): 1.41,
    (640, 640, 1024): 1.26,
    (640, 1280, 256): 1.10,
    (1920, 640, 1024): 1.18,
    (2560, 1280, 256): 1.70,
}
_TABLE_INT8 = {  # int8-weight fused kernel measured speedup vs XLA
    (320, 320, 4096): 1.50,
    (640, 640, 1024): 1.27,
    (960, 320, 4096): 1.11,
    (1920, 640, 1024): 1.08,
}
_MEASURED = {  # every microbenched site (winners + losers)
    (320, 320, 4096), (320, 640, 1024), (640, 640, 1024), (640, 1280, 256),
    (1280, 1280, 256), (1280, 1280, 64), (640, 320, 4096), (960, 320, 4096),
    (1280, 640, 1024), (1920, 640, 1024), (2560, 1280, 256), (2560, 1280, 64),
}


def _table_dispatch(cin: int, cout: int, hw: int, quant: bool):
    """Returns True/False from the measured table, or None if unmeasured
    (or the table is disabled)."""
    if os.environ.get("DIFFBIR_TPU_FUSED_TABLE", "1") == "0":
        return None
    key = (cin, cout, hw)
    if key not in _MEASURED:
        return None
    min_win = float(os.environ.get("DIFFBIR_TPU_FUSED_MIN_WIN", "1.05"))
    table = _TABLE_INT8 if quant else _TABLE_FLOAT
    return table.get(key, 0.0) >= min_win


def _fused_resblock_impl(x, e, p, *, groups: int = 32, eps: float = 1e-5,
                         force: Optional[str] = None):
    bsz, hh, ww, cin = x.shape
    quant = "w1_q" in p
    w1 = p["w1_q"] if quant else p["w1"]
    cout = w1.shape[-1]
    has_skip = (p.get("w_skip_q") if quant else p.get("w_skip")) is not None
    use_pallas = force in ("pallas", "interpret")
    if force is None:
        env = os.environ.get("DIFFBIR_TPU_FUSED_RESBLOCK", "auto")
        table = _table_dispatch(cin, cout, hh * ww, quant)
        heuristic = (
            hh * ww >= _MIN_HW
            and _vmem_bytes(hh, ww, cin, cout, x.dtype.itemsize,
                            w_itemsize=1 if quant else None)
            <= _VMEM_BUDGET
        )
        use_pallas = (
            env != "xla"
            and jax.default_backend() == "tpu"
            and (heuristic if table is None else table)
        )
    if not use_pallas:
        return _xla_fused_resblock(x, e, p, groups, eps)
    xs = jnp.pad(x, ((0, 0), (0, 0), (0, 2), (0, 0)))
    out = _pallas_fused_resblock(
        xs, e, p["gn1_scale"], p["gn1_bias"], w1, p["b1"],
        p["gn2_scale"], p["gn2_bias"], p["w2_q"] if quant else p["w2"], p["b2"],
        p.get("w_skip_q") if quant else p.get("w_skip"), p.get("b_skip"),
        s1=p.get("s1"), s2=p.get("s2"), ss=p.get("s_skip"),
        groups=groups, eps=eps, interpret=force == "interpret",
    )
    return out[:, :, :ww, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_resblock_diff(x, e, p, groups, eps, force):
    return _fused_resblock_impl(x, e, p, groups=groups, eps=eps, force=force)


def _diff_fwd(x, e, p, groups, eps, force):
    out = _fused_resblock_impl(x, e, p, groups=groups, eps=eps, force=force)
    return out, (x, e, p)


def _diff_bwd(groups, eps, force, res, g):
    # Backward through the XLA reference math (same math as the kernel up to
    # bf16 rounding): recompute-forward + autodiff, i.e. the fused forward
    # acts as rematerialization. Grads are exact w.r.t. the module's math.
    x, e, p = res
    _, vjp = jax.vjp(
        lambda x_, e_, p_: _xla_fused_resblock(x_, e_, p_, groups, eps),
        x, e, p,
    )
    return vjp(g)


_fused_resblock_diff.defvjp(_diff_fwd, _diff_bwd)


def fused_resblock(x, e, p, *, groups: int = 32, eps: float = 1e-5,
                   force: Optional[str] = None):
    """x: (B, H, W, Cin) NHWC; e: (B, Cout) time-emb projection; p: dict of
    fp32 params {gn1_scale, gn1_bias, w1 (3,3,Cin,Cout), b1, gn2_scale,
    gn2_bias, w2 (3,3,Cout,Cout), b2, [w_skip (1,1,Cin,Cout), b_skip]}.

    int8 weight-only mode (serving): replace w1/w2/w_skip with
    w1_q/w2_q/w_skip_q (int8, same shapes) + s1/s2/s_skip (f32 (Cout,)
    per-output-channel scales, see quantize_conv_weight). Halves the
    kernel's weight HBM traffic and VMEM footprint — which also brings the
    2560-in decoder concat sites under the VMEM budget.

    Differentiable (float mode): a custom VJP runs the Pallas kernel forward
    and backpropagates through the XLA reference math (recompute + autodiff),
    so the fused block composes with jax.grad / remat for training. The int8
    mode is serving-only and stays non-differentiable.

    ``force`` in {"pallas", "xla", "interpret"} overrides dispatch (tests).
    Env DIFFBIR_TPU_FUSED_RESBLOCK=xla disables the kernel globally.
    """
    if "w1_q" in p:
        return _fused_resblock_impl(x, e, p, groups=groups, eps=eps,
                                    force=force)
    return _fused_resblock_diff(x, e, p, groups, eps, force)
