import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffbir_tpu.models.unet import ControlNet, UNetModel

TINY = dict(
    model_channels=32,
    num_head_channels=16,
    channel_mult=(1, 2),
    attention_resolutions=(2, 1),
    context_dim=64,
)


@pytest.fixture(scope="module")
def tiny_unet():
    unet = UNetModel(**TINY)
    x = jnp.zeros((1, 16, 16, 4))
    t = jnp.array([500.0])
    ctx = jnp.zeros((1, 7, 64))
    params = jax.jit(unet.init)(jax.random.PRNGKey(0), x, t, ctx)
    return unet, params


@pytest.fixture(scope="module")
def tiny_controlnet():
    cn = ControlNet(**TINY)
    x = jnp.zeros((1, 16, 16, 4))
    t = jnp.array([500.0])
    ctx = jnp.zeros((1, 7, 64))
    params = jax.jit(cn.init)(jax.random.PRNGKey(1), x, x, t, ctx)
    return cn, params


def test_unet_shape_and_zero_init(tiny_unet):
    unet, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 4))
    t = jnp.array([10.0, 900.0])
    ctx = jax.random.normal(jax.random.PRNGKey(3), (2, 7, 64))
    out = jax.jit(unet.apply)(params, x, t, ctx)
    assert out.shape == (2, 16, 16, 4)
    # final conv is zero-initialized -> output exactly zero at init
    assert float(jnp.abs(out).max()) == 0.0


def test_controlnet_residual_count_and_zero_init(tiny_unet, tiny_controlnet):
    unet, params = tiny_unet
    cn, cparams = tiny_controlnet
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 4))
    t = jnp.array([123.0])
    ctx = jax.random.normal(jax.random.PRNGKey(5), (1, 7, 64))
    ctrl = jax.jit(cn.apply)(cparams, x, x, t, ctx)
    # stem + 2 res (level0) + down + 2 res (level1) + middle = 7 for 2 levels
    assert len(ctrl) == 7
    # zero-conv init -> all residuals exactly zero
    assert all(float(jnp.abs(c).max()) == 0.0 for c in ctrl)
    # shapes: level0 at 16x16 (ch 32), level1 at 8x8 (ch 64)
    assert ctrl[0].shape == (1, 16, 16, 32)
    assert ctrl[-1].shape == (1, 8, 8, 64)


def test_control_injection_changes_features(tiny_unet, tiny_controlnet):
    unet, params = tiny_unet
    cn, cparams = tiny_controlnet
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 16, 16, 4))
    t = jnp.array([400.0])
    ctx = jax.random.normal(jax.random.PRNGKey(7), (1, 7, 64))
    ctrl = jax.jit(cn.apply)(cparams, x, x, t, ctx)
    # add a nonzero middle residual; with a perturbed (non-zero) output conv,
    # the controlled forward must differ from the uncontrolled one.
    ctrl = tuple(c + 1.0 for c in ctrl)
    params_p = jax.tree_util.tree_map(
        lambda a: a + 0.01 * jnp.ones_like(a), params
    )
    out0 = jax.jit(unet.apply)(params_p, x, t, ctx)
    out1 = jax.jit(unet.apply)(params_p, x, t, ctx, control=ctrl)
    assert float(jnp.abs(out1 - out0).max()) > 1e-6


def test_timestep_embedding_matches_reference_formula():
    from diffbir_tpu.models.layers import timestep_embedding

    t = jnp.array([0.0, 1.0, 999.0])
    emb = timestep_embedding(t, 16)
    half = 8
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = np.asarray(t)[:, None] * freqs[None]
    ref = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    # fp32 trig at t=999 loses ~1e-3 abs vs float64 reference — acceptable
    np.testing.assert_allclose(np.asarray(emb), ref, rtol=1e-3, atol=2e-3)


def test_groupnorm_fp32_matches_torch():
    torch = pytest.importorskip("torch")
    from diffbir_tpu.models.layers import GroupNorm32

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 16)).astype(np.float32)
    gn = GroupNorm32(num_groups=4, eps=1e-5)
    params = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # randomize scale/bias
    scale = rng.standard_normal(16).astype(np.float32)
    bias = rng.standard_normal(16).astype(np.float32)
    params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
    ours = np.asarray(gn.apply(params, jnp.asarray(x)))

    tgn = torch.nn.GroupNorm(4, 16, eps=1e-5)
    with torch.no_grad():
        tgn.weight.copy_(torch.from_numpy(scale))
        tgn.bias.copy_(torch.from_numpy(bias))
        # torch is NCHW
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        theirs = tgn(tx).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
