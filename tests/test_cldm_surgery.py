"""ControlLDM checkpoint surgery semantics (cldm.py:33-90 equivalents)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffbir_tpu.models.cldm import ControlLDM


@pytest.fixture(scope="module")
def tiny():
    cldm = ControlLDM.tiny()
    params = jax.jit(cldm.init_params, static_argnums=1)(jax.random.PRNGKey(3), (8, 8))
    return cldm, params


def test_controlnet_from_unet_zero_pad(tiny):
    cldm, params = tiny
    out = cldm.load_controlnet_from_unet(params)
    cn = out["controlnet"]["params"]
    un = params["unet"]["params"]
    # input conv: first 4 input channels copied from the unet, hint channels zero
    k_cn = np.asarray(cn["input_blocks.0.0"]["kernel"])
    k_un = np.asarray(un["input_blocks.0.0"]["kernel"])
    np.testing.assert_array_equal(k_cn[:, :, :4, :], k_un)
    assert np.all(k_cn[:, :, 4:, :] == 0)
    # shared encoder blocks copied verbatim
    np.testing.assert_array_equal(
        np.asarray(cn["input_blocks.1.0"]["in_layers.2"]["kernel"]),
        np.asarray(un["input_blocks.1.0"]["in_layers.2"]["kernel"]),
    )
    # zero convs remain zero (scratch init)
    assert np.all(np.asarray(cn["zero_convs.0.0"]["kernel"]) == 0)
    assert np.all(np.asarray(cn["middle_block_out.0"]["kernel"]) == 0)


def test_controlnet_from_unet_matches_unet_outputs(tiny):
    """With zero convs, a from-unet controlnet's internal blocks mirror the
    unet: its residuals are exactly zero at init (zero convs) and the
    controlled forward equals the uncontrolled one."""
    cldm, params = tiny
    params2 = cldm.load_controlnet_from_unet(params)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 4))
    t = jnp.array([100.0])
    cond = {
        "c_txt": jax.random.normal(jax.random.PRNGKey(5), (1, 77, 64)),
        "c_img": jax.random.normal(jax.random.PRNGKey(6), (1, 8, 8, 4)),
    }
    controlled = cldm(params2, x, t, cond)
    plain = cldm.unet.apply(params2["unet"], x, t, cond["c_txt"])
    np.testing.assert_allclose(
        np.asarray(controlled), np.asarray(plain), atol=1e-6
    )


def test_load_pretrained_sd_key_mapping(tiny):
    """Round-trip: export tiny unet as torch-style keys, reload via surgery."""
    from diffbir_tpu.weights.convert import SD_MODULE_MAP

    cldm, params = tiny
    # build a fake SD checkpoint from the existing params
    sd = {}
    for mod, prefix in SD_MODULE_MAP.items():
        flat = jax.tree_util.tree_flatten_with_path(params[mod])[0]
        for path, leaf in flat:
            keys = tuple(k.key for k in path)
            if keys and keys[0] == "params":
                keys = keys[1:]
            *mods, leafname = keys
            tkey = ".".join(mods)
            v = np.asarray(leaf)
            if leafname == "kernel":
                v = v.transpose(3, 2, 0, 1) if v.ndim == 4 else v.T
                name = "weight"
            elif leafname in ("scale", "embedding"):
                name = "weight"
            else:
                name = leafname
                if leafname == "in_proj_weight":
                    v = v.T
            sd[f"{prefix}{tkey}.{name}" if tkey else f"{prefix}{name}"] = v
    loaded = cldm.load_pretrained_sd(params, sd, strict=True)
    for mod in ("unet", "vae", "clip"):
        a = jax.tree_util.tree_leaves(params[mod])
        b = jax.tree_util.tree_leaves(loaded[mod])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_flax_torch_roundtrip(tiny):
    """flax -> torch sd -> flax must be the identity (layout inverses)."""
    from diffbir_tpu.weights.convert import fill_flax_params, flax_to_torch_state_dict

    cldm, params = tiny
    sd = flax_to_torch_state_dict(params["controlnet"])
    refilled, missing, _ = fill_flax_params(params["controlnet"], sd, strict=True)
    assert not missing
    for a, b in zip(
        jax.tree_util.tree_leaves(params["controlnet"]),
        jax.tree_util.tree_leaves(refilled),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
