"""Fused GEGLU-MLP kernel: math parity + checkpoint-identical param tree.

Mirrors the fused-ResBlock test strategy: interpret-mode Pallas vs the
unfused module math on CPU, plus a guarantee that flipping
DIFFBIR_TPU_FUSED_FFN never changes the parameter tree (torch-key mapping,
checkpoints, sharding rules all keyed on it)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffbir_tpu.models.unet import FeedForward
from diffbir_tpu.ops.fused_ffn import _fused_ffn_impl, _xla_ffn


def _mk(n, d, mult=4, seed=0):
    g = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(g, 5)
    inner = d * mult
    x = jax.random.normal(k1, (n, d), jnp.float32)
    w1 = jax.random.normal(k2, (d, inner * 2), jnp.float32) * (d ** -0.5)
    b1 = jax.random.normal(k3, (inner * 2,), jnp.float32) * 0.1
    w2 = jax.random.normal(k4, (inner, d), jnp.float32) * (inner ** -0.5)
    b2 = jax.random.normal(k5, (d,), jnp.float32) * 0.1
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("n,d", [(256, 128), (384, 128), (130, 256)])
def test_kernel_parity_interpret(n, d):
    x, w1, b1, w2, b2 = _mk(n, d)
    ref = _xla_ffn(x, w1, b1, w2, b2)
    out = _fused_ffn_impl(x, w1, b1, w2, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_kernel_parity_bf16():
    x, w1, b1, w2, b2 = _mk(256, 128, seed=3)
    xb = x.astype(jnp.bfloat16)
    ref = _xla_ffn(xb, w1, b1, w2, b2)
    out = _fused_ffn_impl(xb, w1, b1, w2, b2, interpret=True)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    assert err < 5e-2  # bf16 rounding; kernel keeps h/gelu in fp32


def test_param_tree_identical_and_module_parity(monkeypatch):
    """Same init tree with the flag on/off, and (forced-on with the XLA
    fallback, since CPU) identical outputs for identical params."""
    ff = FeedForward(dim=128, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 128), jnp.float32)

    monkeypatch.delenv("DIFFBIR_TPU_FUSED_FFN", raising=False)
    p_off = ff.init(jax.random.PRNGKey(7), x)
    y_off = ff.apply(p_off, x)

    monkeypatch.setenv("DIFFBIR_TPU_FUSED_FFN", "1")
    p_on = ff.init(jax.random.PRNGKey(7), x)
    y_on = ff.apply(p_on, x)

    flat_off = jax.tree_util.tree_flatten_with_path(p_off)[0]
    flat_on = jax.tree_util.tree_flatten_with_path(p_on)[0]
    assert [(jax.tree_util.keystr(k), v.shape) for k, v in flat_off] == \
           [(jax.tree_util.keystr(k), v.shape) for k, v in flat_on]
    for (_, a), (_, b) in zip(flat_off, flat_on):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # on CPU the fused path takes the _xla_ffn fallback — math must match
    # the module path bit-for-bit up to dot-order (fp32 here)
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                               atol=1e-5, rtol=1e-5)


def test_gradients_flow(monkeypatch):
    monkeypatch.setenv("DIFFBIR_TPU_FUSED_FFN", "1")
    ff = FeedForward(dim=128, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 128), jnp.float32)
    p = ff.init(jax.random.PRNGKey(8), x)

    def loss(p, x):
        return jnp.sum(ff.apply(p, x) ** 2)

    g = jax.grad(loss)(p, x)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
