"""Fused-ResBlock op/kernel parity (ops/fused_resblock.py).

The Pallas kernel runs in interpret mode here (CPU test mesh); the real-TPU
win is measured by scripts/bench_fused_resblock.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffbir_tpu.models.unet import ResBlock
from diffbir_tpu.ops.fused_resblock import fused_resblock


def _params(rng, cin, cout, skip):
    ks = jax.random.split(rng, 8)
    p = dict(
        gn1_scale=1.0 + 0.1 * jax.random.normal(ks[0], (cin,)),
        gn1_bias=0.1 * jax.random.normal(ks[1], (cin,)),
        w1=jax.random.normal(ks[2], (3, 3, cin, cout)) * 0.1,
        b1=0.1 * jax.random.normal(ks[3], (cout,)),
        gn2_scale=1.0 + 0.1 * jax.random.normal(ks[4], (cout,)),
        gn2_bias=0.1 * jax.random.normal(ks[5], (cout,)),
        # non-zero "zero-conv" so the second half of the block is exercised
        w2=jax.random.normal(ks[6], (3, 3, cout, cout)) * 0.1,
        b2=0.1 * jax.random.normal(ks[7], (cout,)),
    )
    if skip:
        p["w_skip"] = jax.random.normal(ks[0], (1, 1, cin, cout)) * 0.2
        p["b_skip"] = 0.05 * jax.random.normal(ks[1], (cout,))
    return p


@pytest.mark.parametrize("cin,cout,h,w", [
    (64, 64, 8, 8),      # identity skip
    (64, 128, 8, 8),     # 1x1 conv skip
    (64, 64, 4, 8),      # H != W
])
def test_pallas_interpret_matches_xla(cin, cout, h, w):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, h, w, cin), jnp.float32)
    e = jax.random.normal(jax.random.PRNGKey(2), (2, cout), jnp.float32)
    p = _params(rng, cin, cout, skip=cin != cout)
    ref = fused_resblock(x, e, p, force="xla")
    out = fused_resblock(x, e, p, force="interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_pallas_interpret_bf16_close():
    cin, cout = 64, 128
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, cin), jnp.bfloat16)
    e = jax.random.normal(jax.random.PRNGKey(2), (1, cout), jnp.bfloat16)
    p = _params(jax.random.PRNGKey(0), cin, cout, skip=True)
    ref = fused_resblock(x, e, p, force="xla").astype(jnp.float32)
    out = fused_resblock(x, e, p, force="interpret").astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0.05 * scale)


@pytest.mark.parametrize("cin,cout", [(64, 64), (64, 128)])
def test_module_fused_matches_unfused(cin, cout):
    """ResBlock(fused=True) on CPU (XLA fallback path) == ResBlock(fused=False)
    with the SAME param tree — proves the fused branch registers an identical
    tree and the op replicates the module math."""
    mod = ResBlock(cout)
    mod_f = ResBlock(cout, fused=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, cin), jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(2), (2, 32), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x, emb)
    params_f = mod_f.init(jax.random.PRNGKey(0), x, emb)
    ref_shapes = jax.tree.map(lambda a: a.shape, params)
    fused_shapes = jax.tree.map(lambda a: a.shape, params_f)
    assert ref_shapes == fused_shapes
    ref = mod.apply(params, x, emb)
    out = mod_f.apply(params, x, emb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _quantize_p(p):
    from diffbir_tpu.ops.fused_resblock import quantize_conv_weight

    pq = {k: v for k, v in p.items()
          if k not in ("w1", "w2", "w_skip")}
    pq["w1_q"], pq["s1"] = quantize_conv_weight(p["w1"])
    pq["w2_q"], pq["s2"] = quantize_conv_weight(p["w2"])
    if "w_skip" in p:
        pq["w_skip_q"], pq["s_skip"] = quantize_conv_weight(p["w_skip"])
    return pq


@pytest.mark.parametrize("cin,cout", [(64, 64), (64, 128)])
def test_quant_interpret_matches_dequant_xla(cin, cout):
    """int8 weight-only kernel == the XLA dequant fallback on the SAME
    quantized params (the scale factors out of the tap/channel sums, so the
    kernel's apply-scale-once-on-the-accumulator is exact)."""
    p = _params(jax.random.PRNGKey(0), cin, cout, skip=cin != cout)
    pq = _quantize_p(p)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, cin), jnp.float32)
    e = jax.random.normal(jax.random.PRNGKey(2), (2, cout), jnp.float32)
    ref = fused_resblock(x, e, pq, force="xla")
    out = fused_resblock(x, e, pq, force="interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)
    # and the int8 rounding itself stays small vs the float block
    flt = fused_resblock(x, e, p, force="xla")
    rel = float(jnp.max(jnp.abs(ref - flt))) / float(jnp.max(jnp.abs(flt)))
    assert rel < 0.05, rel


def test_quantize_conv_weight_roundtrip():
    from diffbir_tpu.ops.fused_resblock import quantize_conv_weight

    w = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 32, 64)) * 0.2
    q, s = quantize_conv_weight(w)
    assert q.dtype == jnp.int8 and s.shape == (64,)
    deq = q.astype(jnp.float32) * s
    np.testing.assert_allclose(np.asarray(deq), np.asarray(w),
                               atol=float(jnp.max(jnp.abs(w))) / 127 * 1.01)


def test_module_quant_conv_close_to_float():
    """ResBlock(fused=True, quant_conv=True) with quantized params stays
    close to the float module (CPU XLA-fallback path)."""
    from diffbir_tpu.models.cldm import quantize_conv_params

    cin, cout = 64, 128
    mod = ResBlock(cout)
    mod_q = ResBlock(cout, fused=True, quant_conv=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, cin), jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(2), (2, 32), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x, emb)
    # zero-init w2 -> perturb so the second half is exercised
    params = jax.tree_util.tree_map(lambda a: a + 0.05, params)
    pq = {"unet": params["params"], "controlnet": {}}
    pq = quantize_conv_params(pq)
    pq = {"params": pq["unet"]}
    shapes_q = jax.tree_util.tree_map(
        lambda a: (a.shape, a.dtype),
        mod_q.init(jax.random.PRNGKey(0), x, emb))
    shapes_t = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), pq)
    assert shapes_q == shapes_t
    ref = mod.apply(params, x, emb)
    out = mod_q.apply(pq, x, emb)
    rel = float(jnp.max(jnp.abs(out - ref))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 0.05, rel


def test_unet_fused_flag_threads():
    """Tiny UNet with fused_resblock=True matches the standard one."""
    from diffbir_tpu.models.unet import UNetModel

    kw = dict(model_channels=32, num_head_channels=16, channel_mult=(1, 2),
              attention_resolutions=(2, 1), context_dim=64)
    m0 = UNetModel(**kw)
    m1 = UNetModel(fused_resblock=True, **kw)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4), jnp.float32)
    t = jnp.array([3.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 64), jnp.float32)
    params = m0.init(jax.random.PRNGKey(0), x, t, ctx)
    ref = m0.apply(params, x, t, ctx)
    out = m1.apply(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("skip", [False, True])
def test_grad_matches_module(skip):
    """jax.grad through fused_resblock (custom VJP) == grad through the
    plain module math, for inputs, time-emb, and every param."""
    cin, cout = 64, 128 if skip else 64
    p = _params(jax.random.PRNGKey(0), cin, cout, skip=skip)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, cin), jnp.float32)
    e = jax.random.normal(jax.random.PRNGKey(2), (2, cout), jnp.float32)
    tgt = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, cout))

    def loss_fused(x, e, p):
        return jnp.mean((fused_resblock(x, e, p) - tgt) ** 2)

    def loss_ref(x, e, p):
        from diffbir_tpu.ops.fused_resblock import _xla_fused_resblock
        return jnp.mean((_xla_fused_resblock(x, e, p, 32, 1e-5) - tgt) ** 2)

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(x, e, p)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(x, e, p)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_grad_through_interpret_forward():
    """The custom VJP composes with the Pallas (interpret) forward: grads
    are the XLA-math grads up to the forward's fp32 rounding (the loss
    cotangent depends on the forward output)."""
    from diffbir_tpu.ops.fused_resblock import _fused_resblock_diff

    cin = cout = 64
    p = _params(jax.random.PRNGKey(0), cin, cout, skip=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, cin), jnp.float32)
    e = jax.random.normal(jax.random.PRNGKey(2), (1, cout), jnp.float32)

    def loss(force, x, e, p):
        return jnp.sum(_fused_resblock_diff(x, e, p, 32, 1e-5, force) ** 2)

    g_int = jax.grad(lambda *a: loss("interpret", *a), argnums=(0, 2))(x, e, p)
    g_xla = jax.grad(lambda *a: loss("xla", *a), argnums=(0, 2))(x, e, p)
    for a, b in zip(jax.tree_util.tree_leaves(g_int),
                    jax.tree_util.tree_leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-4)


def test_module_fused_trains():
    """ResBlock(fused=True) under jax.grad: same grads as the unfused
    module (the training path no longer needs to avoid the fused flag)."""
    cin, cout = 64, 128
    mod = ResBlock(cout)
    mod_f = ResBlock(cout, fused=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, cin), jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(2), (2, 32), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x, emb)
    params = jax.tree_util.tree_map(lambda a: a + 0.05, params)

    def loss(m, p):
        return jnp.mean(m.apply(p, x, emb) ** 2)

    g = jax.jit(jax.grad(lambda p: loss(mod, p)))(params)
    gf = jax.jit(jax.grad(lambda p: loss(mod_f, p)))(params)
    flat_g = jax.tree_util.tree_flatten_with_path(g)[0]
    flat_gf = dict(jax.tree_util.tree_flatten_with_path(gf)[0])
    assert len(flat_g) == len(flat_gf)
    for k, v in flat_g:
        np.testing.assert_allclose(np.asarray(flat_gf[k]), np.asarray(v),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(k))


def test_stage2_train_step_with_fused_resblock():
    """One stage-2 train step with fused_resblock=True: loss/grads match the
    unfused step (CPU XLA-fallback forward; custom-VJP backward)."""
    from diffbir_tpu.models.cldm import ControlLDM
    from diffbir_tpu.schedule import Schedule
    from diffbir_tpu.train.stage2 import (
        init_train_state, make_optimizer, make_train_step)

    schedule = Schedule.create(timesteps=50)
    base = ControlLDM.tiny()
    fused = ControlLDM.tiny(fused_resblock=True)
    params = jax.jit(base.init_params, static_argnums=1)(
        jax.random.PRNGKey(0), (8, 8))
    batch = {
        "gt": jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 2 - 1,
        "lq": jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3)),
        "tokens": jnp.zeros((2, 77), jnp.int32),
    }
    rng = jax.random.PRNGKey(3)
    metrics = {}
    for tag, model in (("base", base), ("fused", fused)):
        opt = make_optimizer(1e-4)
        state = init_train_state(params, opt)
        step = jax.jit(make_train_step(model, schedule, opt))
        _, m = step(state, batch, rng)
        metrics[tag] = {k: float(v) for k, v in m.items()}
    assert np.isfinite(metrics["fused"]["loss"])
    np.testing.assert_allclose(metrics["fused"]["loss"],
                               metrics["base"]["loss"], rtol=1e-4)
    np.testing.assert_allclose(metrics["fused"]["grad_norm"],
                               metrics["base"]["grad_norm"], rtol=1e-3)


def test_table_dispatch_policy(monkeypatch):
    """Measured per-site dispatch (v5e microbench 2026-08-18): winners use
    the kernel, measured losers use XLA, unmeasured shapes defer to the
    VMEM/MIN_HW heuristic, and DIFFBIR_TPU_FUSED_TABLE=0 disables the table
    (microbench policy-discovery mode)."""
    from diffbir_tpu.ops import fused_resblock as fr

    monkeypatch.delenv("DIFFBIR_TPU_FUSED_TABLE", raising=False)
    assert fr._table_dispatch(320, 320, 4096, quant=False) is True
    assert fr._table_dispatch(320, 640, 1024, quant=False) is False
    # 2560-in decoder concat: wins in float this session, loses with int8
    assert fr._table_dispatch(2560, 1280, 256, quant=False) is True
    assert fr._table_dispatch(2560, 1280, 256, quant=True) is False
    # a high MIN_WIN bar drops marginal winners
    monkeypatch.setenv("DIFFBIR_TPU_FUSED_MIN_WIN", "1.3")
    assert fr._table_dispatch(640, 640, 1024, quant=False) is False
    assert fr._table_dispatch(320, 320, 4096, quant=False) is True
    monkeypatch.delenv("DIFFBIR_TPU_FUSED_MIN_WIN")
    # unmeasured shape -> heuristic
    assert fr._table_dispatch(128, 128, 256, quant=False) is None
    monkeypatch.setenv("DIFFBIR_TPU_FUSED_TABLE", "0")
    assert fr._table_dispatch(320, 320, 4096, quant=False) is None
