"""Parity for RRDBNet (BSRNet) and SCUNet against the torch reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffbir_tpu.weights.convert import fill_flax_params
from tests.ref_loader import load_reference_model_pkg, reference_available, torch_sd_to_numpy

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


def test_rrdbnet_parity():
    import torch

    ref = load_reference_model_pkg()
    torch.manual_seed(0)
    tm = ref.RRDBNet(in_nc=3, out_nc=3, nf=16, nb=2, gc=8, sf=4).eval()

    from diffbir_tpu.models.bsrnet import RRDBNet

    jm = RRDBNet(nf=16, nb=2, gc=8, sf=4)
    rng = np.random.default_rng(0)
    x = rng.random((1, 16, 20, 3)).astype(np.float32)

    shapes = jax.eval_shape(jm.init, jax.random.PRNGKey(0), jnp.asarray(x))
    params, missing, _ = fill_flax_params(shapes, torch_sd_to_numpy(tm))
    assert not missing

    ours = np.asarray(jax.jit(jm.apply)(params, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    assert ours.shape == theirs.shape == (1, 64, 80, 3)
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-3)


def test_scunet_parity():
    import torch

    ref = load_reference_model_pkg()
    torch.manual_seed(1)
    tm = ref.SCUNet(in_nc=3, config=[1, 1, 1, 1, 1, 1, 1], dim=64, input_resolution=256).eval()

    from diffbir_tpu.models.scunet import SCUNet

    jm = SCUNet(config=(1, 1, 1, 1, 1, 1, 1), dim=64)
    rng = np.random.default_rng(1)
    x = rng.random((1, 80, 96, 3)).astype(np.float32)  # non-x64, hits pad path

    shapes = jax.eval_shape(jm.init, jax.random.PRNGKey(0), jnp.asarray(x))
    params, missing, _ = fill_flax_params(shapes, torch_sd_to_numpy(tm))
    assert not missing

    ours = np.asarray(jax.jit(jm.apply)(params, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-3)


def test_scunet_parity_shifted():
    """config=2 engages the SW (shifted) blocks."""
    import torch

    ref = load_reference_model_pkg()
    torch.manual_seed(2)
    tm = ref.SCUNet(in_nc=3, config=[2, 2, 2, 2, 2, 2, 2], dim=64, input_resolution=256).eval()

    from diffbir_tpu.models.scunet import SCUNet

    jm = SCUNet(config=(2, 2, 2, 2, 2, 2, 2), dim=64)
    rng = np.random.default_rng(2)
    x = rng.random((1, 64, 64, 3)).astype(np.float32)

    shapes = jax.eval_shape(jm.init, jax.random.PRNGKey(0), jnp.asarray(x))
    params, missing, _ = fill_flax_params(shapes, torch_sd_to_numpy(tm))
    assert not missing

    ours = np.asarray(jax.jit(jm.apply)(params, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=1e-3, rtol=1e-3)
