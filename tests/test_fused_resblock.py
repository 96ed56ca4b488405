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
