"""RAM++ captioner port: smoke + swin-backbone parity vs the reference."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffbir_tpu.captioners.ram import RAMPlus
from tests.ref_loader import load_reference_model_pkg, reference_available


def test_ramplus_tiny_forward():
    m = RAMPlus(
        num_class=10, des_per_class=3, embed_dim=32, hidden=48,
        swin_embed_dim=16, swin_depths=(1, 1), swin_heads=(2, 4), swin_window=4,
        tagging_heads=4, tagging_layers=1, tagging_intermediate=96,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    logits = jax.jit(m.apply)(params, x)
    assert logits.shape == (1, 10)
    assert np.all(np.isfinite(np.asarray(logits)))


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_swin_classifier_parity():
    import torch

    load_reference_model_pkg()  # installs the timm stub
    # load by file path: the ram package __init__ pulls torchvision
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_ram_swin", "/root/reference/ram/models/swin_transformer.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    SwinTransformer = mod.SwinTransformer

    torch.manual_seed(0)
    tm = SwinTransformer(
        img_size=32, patch_size=4, in_chans=3, embed_dim=16,
        depths=[1, 1], num_heads=[2, 4], window_size=4, mlp_ratio=4.0,
        qkv_bias=True, drop_rate=0.0, drop_path_rate=0.0, ape=False,
        patch_norm=True, use_checkpoint=False,
    ).eval()

    from diffbir_tpu.captioners.swin_cls import SwinClassifier
    from diffbir_tpu.weights.convert import fill_flax_params
    from tests.ref_loader import torch_sd_to_numpy

    jm = SwinClassifier(
        img_size=32, embed_dim=16, depths=(1, 1), num_heads=(2, 4), window_size=4
    )
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    shapes = jax.eval_shape(jm.init, jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {
        k: v for k, v in torch_sd_to_numpy(tm).items()
        if "relative_position_index" not in k and "attn_mask" not in k
    }
    params, missing, _ = fill_flax_params(shapes, sd, strict=True)
    assert not missing

    ours = np.asarray(jax.jit(jm.apply)(params, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-3)
