"""int8 weight-only dense serving mode for the denoise step (quant_dense).

The step is HBM-bound (CLAUDE.md cost analysis); int8 dense weights halve
the weight traffic of the transformer/emb projection sites. This mode is
opt-in serving only (ControlLDM.sd21(quant_dense=True) +
quantize_dense_params on a float checkpoint tree); training and the parity
gates stay bf16/fp32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffbir_tpu.models.cldm import (
    ControlLDM, quantize_conv_params, quantize_dense_params)


@pytest.fixture(scope="module")
def float_setup():
    cldm = ControlLDM.tiny()
    params = jax.jit(cldm.init_params, static_argnums=1)(jax.random.PRNGKey(0), (8, 8))
    # perturb zero-init sites so outputs are non-trivial
    params = jax.tree_util.tree_map(lambda a: a + 0.01 if a.dtype != jnp.int8 else a, params)
    return cldm, params


def _inputs():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    t = jnp.full((2,), 500.0)
    cond = {
        "c_txt": jax.random.normal(jax.random.PRNGKey(2), (2, 77, 64)) * 0.2,
        "c_img": jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 4)) * 0.2,
    }
    return x, t, cond


def test_quant_tree_matches_quant_model(float_setup):
    """quantize_dense_params output == the tree sd21(quant_dense=True) expects."""
    cldm, params = float_setup
    qcldm = ControlLDM.tiny(quant_dense=True)
    pq = quantize_dense_params(params)
    expect = qcldm.eval_shapes((8, 8))
    got_flat = jax.tree_util.tree_flatten_with_path(pq["unet"])[0]
    exp_flat = jax.tree_util.tree_flatten_with_path(expect["unet"])[0]
    got = {jax.tree_util.keystr(k): (v.shape, v.dtype) for k, v in got_flat}
    exp = {jax.tree_util.keystr(k): (v.shape, v.dtype) for k, v in exp_flat}
    assert got == exp
    # int8 leaves actually exist (the transform did something)
    n_q = sum(1 for _, (s, d) in got.items() if d == jnp.int8)
    assert n_q >= 10, n_q


def test_quant_forward_close_to_float(float_setup):
    cldm, params = float_setup
    qcldm = ControlLDM.tiny(quant_dense=True)
    pq = quantize_dense_params(params)
    x, t, cond = _inputs()
    out_f = np.asarray(jax.jit(lambda p: cldm(p, x, t, cond))(params))
    out_q = np.asarray(jax.jit(lambda p: qcldm(p, x, t, cond))(pq))
    assert out_q.shape == out_f.shape and np.all(np.isfinite(out_q))
    scale = np.abs(out_f).max() + 1e-6
    rel = np.abs(out_q - out_f).max() / scale
    # per-channel symmetric int8 on these shallow trees: sub-percent typical
    assert rel < 0.05, rel


def test_quant_dense_layer_exact_math():
    """QuantDense == quant_matmul reference == manual dequant matmul."""
    from diffbir_tpu.models.layers import QuantDense
    from diffbir_tpu.ops.quant_matmul import quantize_weight

    w = jax.random.normal(jax.random.PRNGKey(7), (64, 96)) * 0.3
    b = jax.random.normal(jax.random.PRNGKey(8), (96,)) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 10, 64))
    q, s = quantize_weight(w)
    params = {"params": {"kernel_q": q, "scale": s, "bias": b}}
    out = QuantDense(96).apply(params, x)
    ref = x @ (q.astype(jnp.float32) * s[None, :]) + b
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=2e-2)
    # and the quantization error itself is small
    np.testing.assert_allclose(
        np.asarray(q.astype(jnp.float32) * s[None, :]), np.asarray(w), atol=0.3 / 127 * 2
    )


def test_quant_composes_with_fused_resblock(float_setup):
    """--quant_dense + --fused_resblock together: the fused branch registers
    the same tree (QuantDense emb site included) and stays close to float."""
    cldm, params = float_setup
    qf = ControlLDM.tiny(quant_dense=True, fused_resblock=True)
    pq = quantize_dense_params(params)
    expect = qf.eval_shapes((8, 8))
    got_flat = jax.tree_util.tree_flatten_with_path(pq["unet"])[0]
    exp_flat = jax.tree_util.tree_flatten_with_path(expect["unet"])[0]
    got = {jax.tree_util.keystr(k): (v.shape, v.dtype) for k, v in got_flat}
    exp = {jax.tree_util.keystr(k): (v.shape, v.dtype) for k, v in exp_flat}
    assert got == exp
    x, t, cond = _inputs()
    out_f = np.asarray(jax.jit(lambda p: cldm(p, x, t, cond))(params))
    out_qf = np.asarray(jax.jit(lambda p: qf(p, x, t, cond))(pq))
    assert np.all(np.isfinite(out_qf))
    rel = np.abs(out_qf - out_f).max() / (np.abs(out_f).max() + 1e-6)
    assert rel < 0.05, rel


def _tree_sig(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(k): (v.shape, v.dtype) for k, v in flat}


def test_quant_conv_tree_and_forward(float_setup):
    """quantize_conv_params output == the tree tiny(fused_resblock=True,
    quant_conv=True) expects, and the forward stays close to float."""
    cldm, params = float_setup
    qc = ControlLDM.tiny(fused_resblock=True, quant_conv=True)
    pq = quantize_conv_params(params)
    expect = qc.eval_shapes((8, 8))
    for sub in ("unet", "controlnet"):
        assert _tree_sig(pq[sub]) == _tree_sig(expect[sub]), sub
    n_q = sum(1 for _, (s, d) in _tree_sig(pq["unet"]).items()
              if d == jnp.int8)
    assert n_q >= 6, n_q
    x, t, cond = _inputs()
    out_f = np.asarray(jax.jit(lambda p: cldm(p, x, t, cond))(params))
    out_q = np.asarray(jax.jit(lambda p: qc(p, x, t, cond))(pq))
    assert np.all(np.isfinite(out_q))
    rel = np.abs(out_q - out_f).max() / (np.abs(out_f).max() + 1e-6)
    assert rel < 0.05, rel


def test_quant_conv_composes_with_quant_dense(float_setup):
    """All three serving modes together: int8 dense + fused ResBlock with
    int8 convs (disjoint key sets; transforms commute)."""
    cldm, params = float_setup
    qall = ControlLDM.tiny(quant_dense=True, fused_resblock=True,
                           quant_conv=True)
    pq = quantize_conv_params(quantize_dense_params(params))
    pq2 = quantize_dense_params(quantize_conv_params(params))
    assert _tree_sig(pq["unet"]) == _tree_sig(pq2["unet"])
    expect = qall.eval_shapes((8, 8))
    assert _tree_sig(pq["unet"]) == _tree_sig(expect["unet"])
    x, t, cond = _inputs()
    out_f = np.asarray(jax.jit(lambda p: cldm(p, x, t, cond))(params))
    out_q = np.asarray(jax.jit(lambda p: qall(p, x, t, cond))(pq))
    rel = np.abs(out_q - out_f).max() / (np.abs(out_f).max() + 1e-6)
    assert rel < 0.05, rel


def test_quant_conv_requires_fused():
    from diffbir_tpu.models.unet import ResBlock

    mod = ResBlock(32, quant_conv=True)  # fused=False
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 32))
    emb = jax.random.normal(jax.random.PRNGKey(2), (1, 16))
    with pytest.raises(ValueError, match="fused"):
        mod.init(jax.random.PRNGKey(0), x, emb)
