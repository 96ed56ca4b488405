"""Denoise-scan invariant hoisting: exactness of the params-walk builders.

The pipeline precomputes (a) every cross-attention site's context k/v
projection (loop-invariant: the prompt never changes across the scan) and
(b) every ResBlock's temb projection for the whole sampler t-grid, then
feeds them to the model via the "hoisted" flax collection
(models/cldm.py::hoist_context_kv / hoist_emb_tables). These tests pin the
builders to the module math bit-for-bit using the modules' own priming mode
(mutable=["hoisted"]) as the oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffbir_tpu.models.cldm import ControlLDM, merge_hoisted
from diffbir_tpu.sampler.spaced import SpacedSampler
from diffbir_tpu.schedule import Schedule


@pytest.fixture(scope="module")
def cldm_and_params():
    cldm = ControlLDM.tiny()
    params = jax.jit(cldm.init_params, static_argnums=1)(
        jax.random.PRNGKey(0), (8, 8)
    )
    return cldm, params


def _forward_args(cldm, batch=2, hw=8, tval=417.0):
    g = np.random.default_rng(0)
    x = jnp.asarray(g.standard_normal((batch, hw, hw, 4)), jnp.float32)
    t = jnp.full((batch,), tval, jnp.float32)
    ctx = jnp.asarray(
        g.standard_normal((batch, cldm.clip.context_length, cldm.clip.width)),
        jnp.float32,
    )
    hint = jnp.asarray(g.standard_normal((batch, hw, hw, 4)), jnp.float32)
    return x, t, ctx, hint


def test_walk_matches_primed_forward(cldm_and_params):
    """hoist_context_kv / hoist_emb_tables == the values the modules
    themselves record in priming mode (mutable collection)."""
    cldm, params = cldm_and_params
    x, t, ctx, hint = _forward_args(cldm)

    _, primed_u = cldm.unet.apply(
        params["unet"], x, t, ctx, mutable=["hoisted"]
    )
    _, primed_c = cldm.controlnet.apply(
        params["controlnet"], x, hint, t, ctx, mutable=["hoisted"]
    )
    kv = cldm.hoist_context_kv(params, ctx)
    emb = cldm.hoist_emb_tables(params, np.asarray([float(t[0])]))

    for name, primed in (("unet", primed_u), ("controlnet", primed_c)):
        oracle = primed["hoisted"]
        built = merge_hoisted(
            kv[name],
            jax.tree_util.tree_map(lambda tab: tab[0], emb[name]),
        )
        flat_o = dict(jax.tree_util.tree_flatten_with_path(oracle)[0])
        flat_b = dict(jax.tree_util.tree_flatten_with_path(built)[0])
        assert set(map(str, flat_o)) == set(map(str, flat_b)), name
        for path, val_o in flat_o.items():
            val_b = flat_b[path]
            if "emb_out" in str(path):
                # oracle is [B, co] (batch-identical rows); table row [1, co]
                assert np.array_equal(np.asarray(val_o[0]), np.asarray(val_b[0])), (
                    name, path)
            else:
                assert np.array_equal(np.asarray(val_o), np.asarray(val_b)), (
                    name, path)


def test_hoisted_forward_is_exact(cldm_and_params):
    """cldm(...) with the hoisted collection == plain cldm(...) bitwise."""
    cldm, params = cldm_and_params
    x, t, ctx, hint = _forward_args(cldm)
    cond = {"c_txt": ctx, "c_img": hint}

    ref = jax.jit(lambda p, a, b, c: cldm(p, a, b, c))(params, x, t, cond)

    kv = cldm.hoist_context_kv(params, ctx)
    emb = cldm.hoist_emb_tables(params, np.asarray([float(t[0])]))
    hoisted = {
        k: merge_hoisted(
            kv[k], jax.tree_util.tree_map(lambda tab: tab[0], emb[k])
        )
        for k in kv
    }
    out = jax.jit(
        lambda p, a, b, c, h: cldm(p, a, b, c, hoisted=h)
    )(params, x, t, cond, hoisted)
    assert np.array_equal(np.asarray(ref), np.asarray(out))


def test_hoist_quant_dense_layout(cldm_and_params):
    """The walks handle the int8 serving layout (kernel_q/scale)."""
    from diffbir_tpu.models.cldm import quantize_dense_params

    cldm, params = cldm_and_params
    qcldm = ControlLDM.tiny(quant_dense=True)
    qparams = quantize_dense_params(params)
    x, t, ctx, hint = _forward_args(cldm)
    cond = {"c_txt": ctx, "c_img": hint}

    ref = jax.jit(lambda p, a, b, c: qcldm(p, a, b, c))(qparams, x, t, cond)
    kv = qcldm.hoist_context_kv(qparams, ctx)
    emb = qcldm.hoist_emb_tables(qparams, np.asarray([float(t[0])]))
    hoisted = {
        k: merge_hoisted(
            kv[k], jax.tree_util.tree_map(lambda tab: tab[0], emb[k])
        )
        for k in kv
    }
    out = jax.jit(
        lambda p, a, b, c, h: qcldm(p, a, b, c, hoisted=h)
    )(qparams, x, t, cond, hoisted)
    assert np.array_equal(np.asarray(ref), np.asarray(out))


def test_spaced_model_ts_matches_scan_grid():
    sched = Schedule.create(
        timesteps=1000, beta_schedule="linear", linear_start=0.00085,
        linear_end=0.0120, parameterization="v", zero_snr=True,
    )
    s = SpacedSampler(sched.betas, "v", rescale_cfg=False)
    ts = s.model_ts(10)
    assert ts is not None and len(ts) == 10
    # the scan looks t up by exact value: the published grid must contain
    # every t the sampler will pass (sample() uses timesteps[order])
    from diffbir_tpu.schedule import make_spaced_coeffs

    c = make_spaced_coeffs(s.training_betas, 10)
    used = c.timesteps[np.arange(10)[::-1]].astype(np.float32)
    assert set(used.tolist()) <= set(np.asarray(ts, np.float32).tolist())


@pytest.mark.parametrize(
    "sampler_type,n_steps",
    [("spaced", 3), ("ddim", 5), ("dpm++_m2", 4),
     ("edm_dpm++_3m_sde", 4), ("edm_heun", 3)],
)
def test_pipeline_hoist_ab(monkeypatch, sampler_type, n_steps):
    """Full tiny pipeline: DIFFBIR_TPU_HOIST=1 vs 0 produce identical
    restorations (the hoist is exact math, not an approximation)."""
    from diffbir_tpu.pipeline import IdentityCleanerPipeline

    cldm = ControlLDM.tiny()
    params = jax.jit(cldm.init_params, static_argnums=1)(
        jax.random.PRNGKey(0), (8, 8)
    )
    schedule = Schedule.create(timesteps=100, parameterization="eps")
    lq = np.random.default_rng(3).integers(
        0, 255, (1, 64, 64, 3), dtype=np.uint8
    )

    outs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("DIFFBIR_TPU_HOIST", flag)
        pipe = IdentityCleanerPipeline(
            None, cldm, params, schedule, tokenizer=None, min_cond_size=64
        )
        outs[flag] = pipe.run(
            lq, steps=n_steps, cfg_scale=2.0, sampler_type=sampler_type,
            seed=11,
        )
    np.testing.assert_array_equal(outs["1"], outs["0"])


@pytest.mark.parametrize("turbo_encoder", [False, True])
def test_pipeline_hoist_ab_turbo(monkeypatch, turbo_encoder):
    """Turbo path (interval-cached ControlNet [+ encoder propagation]):
    hoist on/off identical — the hoisted collection rides both the refresh
    and cached branches of the lax.cond."""
    from diffbir_tpu.pipeline import IdentityCleanerPipeline

    cldm = ControlLDM.tiny()
    params = jax.jit(cldm.init_params, static_argnums=1)(
        jax.random.PRNGKey(0), (8, 8)
    )
    schedule = Schedule.create(timesteps=100, parameterization="eps")
    lq = np.random.default_rng(5).integers(
        0, 255, (1, 64, 64, 3), dtype=np.uint8
    )

    outs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("DIFFBIR_TPU_HOIST", flag)
        pipe = IdentityCleanerPipeline(
            None, cldm, params, schedule, tokenizer=None, min_cond_size=64
        )
        outs[flag] = pipe.run(
            lq, steps=4, cfg_scale=2.0, sampler_type="spaced", seed=11,
            control_interval=2, turbo_encoder=turbo_encoder,
        )
    np.testing.assert_array_equal(outs["1"], outs["0"])
