"""Pallas flash-attention kernel correctness (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffbir_tpu.ops.attention import xla_attention
from diffbir_tpu.ops.flash_attention import (
    _flash_attention_impl,
    _flash_attention_impl_packed,
    flash_attention,
    supported,
)


@pytest.mark.parametrize("sq,skv", [(256, 256), (256, 77)])
def test_flash_matches_xla(sq, skv):
    k = jax.random.PRNGKey(0)
    q = jax.random.normal(k, (1, sq, 2, 64), jnp.float32)
    kk = jax.random.normal(jax.random.PRNGKey(1), (1, skv, 2, 64), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (1, skv, 2, 64), jnp.float32)
    ref = xla_attention(q, kk, v)
    out = _flash_attention_impl(q, kk, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("sq,skv,h", [(256, 256, 2), (256, 77, 3), (512, 512, 5)])
def test_flash_packed_matches_xla(sq, skv, h):
    """Packed [B,S,H*D] kernel (per-head lane slices) vs XLA reference.

    fp32 inputs keep the exact logit-scaling path, so tolerance matches the
    folded kernel's."""
    k = jax.random.PRNGKey(0)
    q = jax.random.normal(k, (2, sq, h, 64), jnp.float32)
    kk = jax.random.normal(jax.random.PRNGKey(1), (2, skv, h, 64), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (2, skv, h, 64), jnp.float32)
    ref = xla_attention(q, kk, v)
    out = _flash_attention_impl_packed(q, kk, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_packed_bf16_close():
    """bf16 path pre-scales q in-kernel (one extra bf16 rounding)."""
    k = jax.random.PRNGKey(0)
    q = jax.random.normal(k, (1, 256, 2, 64), jnp.bfloat16)
    kk = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 2, 64), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 256, 2, 64), jnp.bfloat16)
    ref = xla_attention(q.astype(jnp.float32), kk.astype(jnp.float32),
                        v.astype(jnp.float32))
    out = _flash_attention_impl_packed(q, kk, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=3e-2, rtol=3e-2
    )


def test_flash_gradient_via_custom_vjp():
    # backward path must exist (differentiates the XLA formulation)
    k = jax.random.PRNGKey(0)
    q = jax.random.normal(k, (1, 128, 1, 64), jnp.float32)
    kk = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 1, 64), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 128, 1, 64), jnp.float32)

    def loss_flash(q):
        # interpret-mode forward through the vjp-wrapped op
        return jnp.sum(flash_attention(q, kk, v) ** 2)

    def loss_xla(q):
        return jnp.sum(xla_attention(q, kk, v) ** 2)

    # CPU: flash forward runs the pallas interpreter only if invoked directly;
    # here we only check the registered vjp agrees with xla's gradient.
    g_x = jax.grad(loss_xla)(q)
    try:
        g_f = jax.grad(loss_flash)(q)
    except Exception:
        pytest.skip("pallas compile unavailable on this platform")
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_x), atol=1e-4, rtol=1e-3)


def test_supported_gate():
    q = jnp.zeros((1, 4096, 5, 64))
    k77 = jnp.zeros((1, 77, 5, 64))
    assert supported(q, q, q)
    assert supported(q, k77, k77)
    assert not supported(q, q, q, mask=jnp.ones((1, 1, 1, 1), bool))
    q_small = jnp.zeros((1, 64, 5, 64))
    assert not supported(q_small, q_small, q_small)  # sq < 128
    # wide single-head (VAE mid-block) and ragged q lengths are supported
    q_wide = jnp.zeros((1, 4096, 1, 512))
    assert supported(q_wide, q_wide, q_wide)
    q_ragged = jnp.zeros((1, 2500, 2, 64))
    assert supported(q_ragged, q_ragged, q_ragged)


def test_flash_wide_head_matches_xla():
    """d=512 single-head (VAE mid-block shape) with its shrunken blocks."""
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 256, 1, 512), jnp.float32)
    kk = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 1, 512), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 256, 1, 512), jnp.float32)
    ref = xla_attention(q, kk, v)
    out = _flash_attention_impl(q, kk, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_ragged_q_matches_xla(monkeypatch):
    """sq that doesn't divide the q block: zero-pad + crop path."""
    monkeypatch.setenv("DIFFBIR_TPU_FLASH_BQ", "128")
    monkeypatch.setenv("DIFFBIR_TPU_FLASH_BK", "128")
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 200, 2, 64), jnp.float32)
    kk = jax.random.normal(jax.random.PRNGKey(1), (1, 200, 2, 64), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 200, 2, 64), jnp.float32)
    ref = xla_attention(q, kk, v)
    out = _flash_attention_impl(q, kk, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_bwd_ragged_q_matches_xla_grads(monkeypatch):
    """Padded q-side rows (q=dO=0) must not pollute dk/dv; dq is cropped."""
    from diffbir_tpu.ops.flash_attention import (
        _flash_attention_bwd_impl,
        _flash_attention_impl,
    )

    monkeypatch.setenv("DIFFBIR_TPU_FLASH_BQ", "128")
    monkeypatch.setenv("DIFFBIR_TPU_FLASH_BK", "128")
    monkeypatch.setenv("DIFFBIR_TPU_FLASH_BWD_BQ", "128")
    monkeypatch.setenv("DIFFBIR_TPU_FLASH_BWD_BK", "128")
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 200, 2, 64), jnp.float32)
    kk = jax.random.normal(jax.random.PRNGKey(1), (1, 200, 2, 64), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 200, 2, 64), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(3), (1, 200, 2, 64), jnp.float32)

    o, lse = _flash_attention_impl(q, kk, v, interpret=True, return_lse=True)
    dq, dk, dv = _flash_attention_bwd_impl(q, kk, v, o, lse, g, interpret=True)
    _, vjp = jax.vjp(xla_attention, q, kk, v)
    rq, rk, rv = vjp(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("sq,skv", [(256, 256), (256, 77)])
def test_flash_bwd_kernels_match_xla_grads(sq, skv):
    """Pallas dq/dkv kernels (interpret mode) vs jax.vjp of the XLA
    formulation — incl. the padded-kv mask path (skv=77 -> pad 128)."""
    from diffbir_tpu.ops.flash_attention import (
        _flash_attention_bwd_impl,
        _flash_attention_impl,
    )

    q = jax.random.normal(jax.random.PRNGKey(0), (1, sq, 2, 64), jnp.float32)
    kk = jax.random.normal(jax.random.PRNGKey(1), (1, skv, 2, 64), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (1, skv, 2, 64), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(3), (1, sq, 2, 64), jnp.float32)

    o, lse = _flash_attention_impl(q, kk, v, interpret=True, return_lse=True)
    dq, dk, dv = _flash_attention_bwd_impl(q, kk, v, o, lse, g, interpret=True)

    _, vjp = jax.vjp(xla_attention, q, kk, v)
    rq, rk, rv = vjp(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=5e-4, rtol=1e-3)


def test_flash_lse_output():
    """The lse side-output equals log(sum(exp(qk^T * scale))) per row."""
    from diffbir_tpu.ops.flash_attention import _flash_attention_impl

    q = jax.random.normal(jax.random.PRNGKey(4), (1, 128, 1, 64), jnp.float32)
    o, lse = _flash_attention_impl(q, q, q, interpret=True, return_lse=True)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, q) * (64 ** -0.5)
    ref = jax.nn.logsumexp(s, axis=-1)[0, 0]  # (sq,)
    np.testing.assert_allclose(np.asarray(lse[0, :, 0]), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
