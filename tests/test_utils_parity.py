"""Parity for image-space utils (wavelet color fix, PSNR, tiling weights)."""

import importlib.util
import pathlib
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from diffbir_tpu.tiling import gaussian_weights
from diffbir_tpu.utils.common import psnr, wavelet_reconstruction

REF = pathlib.Path("/root/reference/diffbir/utils/common.py")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference not mounted")


@pytest.fixture(scope="module")
def ref_common():
    import types

    # stub deps the module pulls in but we don't exercise
    if "tqdm" not in sys.modules:
        tqdm_mod = types.ModuleType("tqdm")
        tqdm_mod.tqdm = lambda x, **k: x
        sys.modules["tqdm"] = tqdm_mod
    spec = importlib.util.spec_from_file_location("ref_common", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_wavelet_reconstruction_parity(ref_common):
    import torch

    g = np.random.default_rng(0)
    content = g.random((1, 64, 64, 3)).astype(np.float32)
    style = g.random((1, 64, 64, 3)).astype(np.float32)
    ours = np.asarray(wavelet_reconstruction(jnp.asarray(content), jnp.asarray(style)))
    with torch.no_grad():
        theirs = ref_common.wavelet_reconstruction(
            torch.from_numpy(content.transpose(0, 3, 1, 2)),
            torch.from_numpy(style.transpose(0, 3, 1, 2)),
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_psnr_parity(ref_common):
    import torch

    g = np.random.default_rng(1)
    a = g.random((2, 32, 32, 3)).astype(np.float32)
    b = np.clip(a + g.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    ours = np.asarray(psnr(jnp.asarray(a), jnp.asarray(b), crop_border=2, test_y=True))
    with torch.no_grad():
        theirs = ref_common.calculate_psnr_pt(
            torch.from_numpy(a.transpose(0, 3, 1, 2)),
            torch.from_numpy(b.transpose(0, 3, 1, 2)),
            crop_border=2, test_y_channel=True,
        ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3)


def test_gaussian_weights_parity(ref_common):
    ours = gaussian_weights(32, 24)
    theirs = ref_common.gaussian_weights(32, 24)
    np.testing.assert_allclose(ours, theirs, rtol=1e-10)


def test_make_tiled_fn_parity(ref_common):
    """Gaussian-blended tiling must match the reference's tiled execution
    exactly for an arbitrary (linear) tile function."""
    import torch

    from diffbir_tpu.tiling import make_tiled_fn

    g = np.random.default_rng(3)
    x = g.random((1, 40, 56, 3)).astype(np.float32)

    def t_fn(t):  # torch NCHW
        return t * 2.0 + 1.0

    ref_tiled = ref_common.make_tiled_fn(t_fn, size=16, stride=8, progress=False)
    with torch.no_grad():
        theirs = ref_tiled(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    j_fn = lambda t: t * 2.0 + 1.0  # noqa: E731
    ours = make_tiled_fn(j_fn, size=16, stride=8)(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.transpose(0, 2, 3, 1), atol=1e-5, rtol=1e-5
    )


def test_make_tiled_fn_upscale_parity(ref_common):
    import torch

    from diffbir_tpu.tiling import make_tiled_fn

    g = np.random.default_rng(4)
    x = g.random((1, 32, 48, 3)).astype(np.float32)

    def t_up(t):
        return torch.repeat_interleave(torch.repeat_interleave(t, 2, -2), 2, -1)

    ref_tiled = ref_common.make_tiled_fn(
        t_up, size=16, stride=8, scale_type="up", scale=2, progress=False
    )
    with torch.no_grad():
        theirs = ref_tiled(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    def j_up(t):
        return jnp.repeat(jnp.repeat(t, 2, 1), 2, 2)

    ours = make_tiled_fn(j_up, size=16, stride=8, scale_type="up", scale=2)(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.transpose(0, 2, 3, 1), atol=1e-5, rtol=1e-5
    )
