import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffbir_tpu.weights.convert import fill_flax_params
from tests.ref_loader import load_reference_model_pkg, reference_available, torch_sd_to_numpy

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


def test_swinir_parity_unshuffle():
    import torch

    ref = load_reference_model_pkg()
    torch.manual_seed(0)
    tm = ref.SwinIR(
        img_size=8, patch_size=1, in_chans=3, embed_dim=24,
        depths=[2, 2], num_heads=[4, 4], window_size=4, mlp_ratio=2,
        sf=8, img_range=1.0, upsampler="nearest+conv", resi_connection="1conv",
        unshuffle=True, unshuffle_scale=8, drop_path_rate=0.0,
    ).eval()

    from diffbir_tpu.models.swinir import SwinIR

    jm = SwinIR(
        in_chans=3, embed_dim=24, depths=(2, 2), num_heads=(4, 4),
        window_size=4, mlp_ratio=2.0, sf=8, upsampler="nearest+conv",
        unshuffle=True, unshuffle_scale=8,
    )
    rng = np.random.default_rng(0)
    # 32x32 input -> unshuffle to 4x4 feature map, window 4 (no shift path also hit)
    x = rng.random((1, 32, 32, 3)).astype(np.float32)

    shapes = jax.eval_shape(jm.init, jax.random.PRNGKey(0), jnp.asarray(x))
    params, missing, used = fill_flax_params(shapes, torch_sd_to_numpy(tm))
    assert not missing

    ours = np.asarray(jax.jit(jm.apply)(params, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    assert ours.shape == theirs.shape == (1, 32, 32, 3)
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-3)


def test_swinir_parity_shifted_windows():
    """Bigger feature map so shifted windows + masks actually engage."""
    import torch

    ref = load_reference_model_pkg()
    torch.manual_seed(1)
    tm = ref.SwinIR(
        img_size=16, patch_size=1, in_chans=3, embed_dim=16,
        depths=[2], num_heads=[2], window_size=4, mlp_ratio=2,
        sf=8, img_range=1.0, upsampler="nearest+conv", resi_connection="1conv",
        unshuffle=True, unshuffle_scale=8, drop_path_rate=0.0,
    ).eval()

    from diffbir_tpu.models.swinir import SwinIR

    jm = SwinIR(
        in_chans=3, embed_dim=16, depths=(2,), num_heads=(2,),
        window_size=4, mlp_ratio=2.0, sf=8, upsampler="nearest+conv",
        unshuffle=True, unshuffle_scale=8,
    )
    rng = np.random.default_rng(1)
    x = rng.random((1, 128, 96, 3)).astype(np.float32)  # 16x12 feature map

    shapes = jax.eval_shape(jm.init, jax.random.PRNGKey(0), jnp.asarray(x))
    params, missing, _ = fill_flax_params(shapes, torch_sd_to_numpy(tm))
    assert not missing

    ours = np.asarray(jax.jit(jm.apply)(params, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-3)


def test_swinir_drop_path_training_mode():
    from diffbir_tpu.models.swinir import SwinIR

    jm = SwinIR(
        in_chans=3, embed_dim=16, depths=(2,), num_heads=(2,), window_size=4,
        mlp_ratio=2.0, sf=8, unshuffle=True, unshuffle_scale=8, drop_path_rate=0.5,
    )
    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3)), jnp.float32)
    params = jax.jit(jm.init)(jax.random.PRNGKey(0), x)
    det = jm.apply(params, x)  # deterministic default: no rng needed
    tr1 = jm.apply(params, x, deterministic=False, rngs={"drop_path": jax.random.PRNGKey(1)})
    tr2 = jm.apply(params, x, deterministic=False, rngs={"drop_path": jax.random.PRNGKey(2)})
    assert np.any(np.asarray(tr1) != np.asarray(tr2))  # stochastic
    assert np.all(np.isfinite(np.asarray(tr1)))
    assert det.shape == tr1.shape
