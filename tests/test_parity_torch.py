"""Golden-value parity vs the torch reference on random-init small configs.

These are the strongest correctness tests in the suite: identical weights,
identical inputs, outputs must agree to fp32 tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffbir_tpu.weights.convert import fill_flax_params
from tests.ref_loader import load_reference_model_pkg, reference_available, torch_sd_to_numpy

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


@pytest.fixture(scope="module")
def ref():
    return load_reference_model_pkg()


def _nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def _nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_unet_parity(ref):
    import torch

    torch.manual_seed(0)
    cfg = dict(
        image_size=32, in_channels=4, model_channels=32, out_channels=4,
        num_res_blocks=1, attention_resolutions=[2, 1], channel_mult=[1, 2],
        num_head_channels=16, use_spatial_transformer=True,
        use_linear_in_transformer=True, transformer_depth=1, context_dim=48,
        legacy=False,
    )
    tm = ref.ControlledUnetModel(**cfg).eval()
    # perturb zero-init params (incl. the final out conv) so parity is non-trivial
    with torch.no_grad():
        for _, p in tm.named_parameters():
            if p.abs().sum() == 0:
                p.normal_(0, 0.02)

    from diffbir_tpu.models.unet import UNetModel

    jm = UNetModel(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=(2, 1), channel_mult=(1, 2), num_head_channels=16,
        transformer_depth=1, context_dim=48,
    )
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 16, 4)).astype(np.float32)
    t = np.array([37.0, 800.0], np.float32)
    ctx = rng.standard_normal((2, 7, 48)).astype(np.float32)

    shapes = jax.eval_shape(jm.init, jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx))
    params, missing, used = fill_flax_params(shapes, torch_sd_to_numpy(tm))
    assert not missing

    ours = np.asarray(jax.jit(jm.apply)(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)))
    with torch.no_grad():
        theirs = tm(
            torch.from_numpy(_nchw(x)), torch.from_numpy(t).long() * 0 + torch.tensor([37, 800]),
            torch.from_numpy(ctx),
        ).numpy()
    np.testing.assert_allclose(ours, _nhwc(theirs), atol=2e-4, rtol=1e-3)


def test_controlnet_parity(ref):
    import torch

    torch.manual_seed(1)
    cfg = dict(
        image_size=32, in_channels=4, hint_channels=4, model_channels=32,
        num_res_blocks=1, attention_resolutions=[2, 1], channel_mult=[1, 2],
        num_head_channels=16, use_spatial_transformer=True,
        use_linear_in_transformer=True, transformer_depth=1, context_dim=48,
        legacy=False,
    )
    tm = ref.ControlNet(**cfg).eval()
    # perturb zero convs so the parity check is non-trivial
    with torch.no_grad():
        for n, p in tm.named_parameters():
            if p.abs().sum() == 0:
                p.normal_(0, 0.02)

    from diffbir_tpu.models.unet import ControlNet

    jm = ControlNet(
        in_channels=4, hint_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(2, 1), channel_mult=(1, 2), num_head_channels=16,
        transformer_depth=1, context_dim=48,
    )
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 16, 16, 4)).astype(np.float32)
    hint = rng.standard_normal((1, 16, 16, 4)).astype(np.float32)
    ctx = rng.standard_normal((1, 7, 48)).astype(np.float32)

    shapes = jax.eval_shape(
        jm.init, jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(hint),
        jnp.array([5.0]), jnp.asarray(ctx),
    )
    params, missing, _ = fill_flax_params(shapes, torch_sd_to_numpy(tm))
    assert not missing

    ours = jax.jit(jm.apply)(params, jnp.asarray(x), jnp.asarray(hint), jnp.array([5.0]), jnp.asarray(ctx))
    with torch.no_grad():
        theirs = tm(
            torch.from_numpy(_nchw(x)), torch.from_numpy(_nchw(hint)),
            torch.tensor([5]), torch.from_numpy(ctx),
        )
    # stem + res(level0) + down + res(level1) + middle = 5
    assert len(ours) == len(theirs) == 5
    for o, t_ in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(o), _nhwc(t_.numpy()), atol=2e-4, rtol=1e-3)


def test_vae_parity(ref):
    import torch

    torch.manual_seed(2)
    ddconfig = dict(
        double_z=True, z_channels=3, resolution=64, in_channels=3, out_ch=3,
        ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[], dropout=0.0,
    )
    tm = ref.AutoencoderKL(ddconfig=ddconfig, embed_dim=3).eval()

    from diffbir_tpu.models.vae import AutoencoderKL

    jm = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=3, embed_dim=3)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)

    shapes = jax.eval_shape(jm.init, jax.random.PRNGKey(0), jnp.asarray(x))
    params, missing, _ = fill_flax_params(shapes, torch_sd_to_numpy(tm))
    assert not missing

    ours_mean, ours_logvar = jax.jit(
        lambda p, x: jm.apply(p, x, method=jm.encode_moments)
    )(params, jnp.asarray(x))
    with torch.no_grad():
        post = tm.encode(torch.from_numpy(_nchw(x)))
        t_mean, t_logvar = post.mean.numpy(), post.logvar.numpy()
    np.testing.assert_allclose(np.asarray(ours_mean), _nhwc(t_mean), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ours_logvar), _nhwc(t_logvar), atol=2e-4, rtol=1e-3)

    z = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    ours_dec = jax.jit(lambda p, z: jm.apply(p, z, method=jm.decode))(params, jnp.asarray(z))
    with torch.no_grad():
        t_dec = tm.decode(torch.from_numpy(_nchw(z))).numpy()
    np.testing.assert_allclose(np.asarray(ours_dec), _nhwc(t_dec), atol=2e-4, rtol=1e-3)


def test_clip_parity(ref):
    import torch

    torch.manual_seed(3)
    tm = ref.FrozenOpenCLIPEmbedder(
        embed_dim=32,
        vision_cfg=dict(image_size=32, layers=1, width=16, head_width=8, patch_size=16),
        text_cfg=dict(context_length=77, vocab_size=128, width=32, heads=4, layers=3),
        layer="penultimate",
    ).eval()

    from diffbir_tpu.models.clip import CLIPTextEncoder

    jm = CLIPTextEncoder(vocab_size=128, width=32, heads=4, layers=3, layer="penultimate")
    tokens = np.random.default_rng(3).integers(0, 128, (2, 77)).astype(np.int64)

    shapes = jax.eval_shape(jm.init, jax.random.PRNGKey(0), jnp.asarray(tokens.astype(np.int32)))
    sd = torch_sd_to_numpy(tm)
    # strip the FrozenOpenCLIPEmbedder 'model.' wrapper
    sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}
    params, missing, _ = fill_flax_params(shapes, sd)
    assert not missing

    ours = np.asarray(jax.jit(jm.apply)(params, jnp.asarray(tokens.astype(np.int32))))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(tokens)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)
