"""Minimum end-to-end slice: cleaner(stub) -> ControlLDM -> sampler -> decode.

CPU-runnable tiny config; checks shapes, dtype, determinism, and that the
sampler/CFG/noise-aug paths all execute.
"""

import numpy as np
import pytest

import jax

from diffbir_tpu.models.cldm import ControlLDM
from diffbir_tpu.pipeline import IdentityCleanerPipeline
from diffbir_tpu.schedule import Schedule


@pytest.fixture(scope="module")
def tiny_pipe():
    cldm = ControlLDM.tiny()
    params = jax.jit(cldm.init_params, static_argnums=1)(
        jax.random.PRNGKey(0), (8, 8)
    )
    schedule = Schedule.create(timesteps=100, parameterization="eps")
    return IdentityCleanerPipeline(
        None, cldm, params, schedule, tokenizer=None, min_cond_size=64
    )


def test_e2e_spaced(tiny_pipe):
    lq = np.random.default_rng(0).integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    out = tiny_pipe.run(lq, steps=3, cfg_scale=2.0, sampler_type="spaced", seed=7)
    assert out.shape == (1, 64, 64, 3) and out.dtype == np.uint8
    # deterministic for a fixed seed
    out2 = tiny_pipe.run(lq, steps=3, cfg_scale=2.0, sampler_type="spaced", seed=7)
    np.testing.assert_array_equal(out, out2)
    # different seed changes the sample
    out3 = tiny_pipe.run(lq, steps=3, cfg_scale=2.0, sampler_type="spaced", seed=8)
    assert np.any(out3 != out)


def test_e2e_ddim_no_cfg(tiny_pipe):
    lq = np.random.default_rng(1).integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    out = tiny_pipe.run(
        lq, steps=4, cfg_scale=1.0, sampler_type="ddim",
        start_point_type="cond", noise_aug=10,
    )
    assert out.shape == (2, 64, 64, 3)


def test_e2e_nonsquare_padding(tiny_pipe):
    # 72x96 -> cleaner keeps size (>=64), pad to 128x128 multiples of 64 inside
    lq = np.random.default_rng(2).integers(0, 255, (1, 72, 96, 3), dtype=np.uint8)
    out = tiny_pipe.run(lq, steps=2, cfg_scale=1.5, sampler_type="spaced")
    assert out.shape == (1, 72, 96, 3)
