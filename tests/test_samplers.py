"""Sampler zoo smoke + consistency tests on the tiny ControlLDM."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffbir_tpu.models.cldm import ControlLDM
from diffbir_tpu.sampler import DDIMSampler, SpacedSampler
from diffbir_tpu.sampler.dpms import DPMSolverSampler
from diffbir_tpu.sampler.edm import EDMSampler
from diffbir_tpu.schedule import Schedule


@pytest.fixture(scope="module")
def setup():
    cldm = ControlLDM.tiny()
    params = jax.jit(cldm.init_params, static_argnums=1)(jax.random.PRNGKey(0), (8, 8))
    # perturb zero-init convs so the model output is non-trivial
    params = jax.tree_util.tree_map(lambda a: a + 0.01, params)
    schedule = Schedule.create(timesteps=100, parameterization="eps")
    cond = {
        "c_txt": jnp.ones((1, 77, 64)) * 0.1,
        "c_img": jnp.ones((1, 8, 8, 4)) * 0.2,
    }
    uncond = {
        "c_txt": jnp.zeros((1, 77, 64)),
        "c_img": cond["c_img"],
    }

    def model_fn(x, t, c):
        return cldm(params, x, t, c)

    return schedule, model_fn, cond, uncond


X_SHAPE = (1, 8, 8, 4)


def _run(sampler, model_fn, cond, uncond, steps=3, cfg=2.0):
    x_T = jax.random.normal(jax.random.PRNGKey(5), X_SHAPE)
    out = sampler.sample(model_fn, x_T, cond, uncond, cfg, steps, jax.random.PRNGKey(6))
    out = np.asarray(out)
    assert out.shape == X_SHAPE
    assert np.all(np.isfinite(out))
    return out


def test_spaced(setup):
    schedule, model_fn, cond, uncond = setup
    s = SpacedSampler(schedule.betas, "eps", rescale_cfg=False)
    _run(s, model_fn, cond, uncond)


def test_spaced_v_zsnr(setup):
    _, model_fn, cond, uncond = setup
    sched = Schedule.create(timesteps=100, parameterization="v", zero_snr=True)
    s = SpacedSampler(sched.betas, "v", rescale_cfg=True)
    _run(s, model_fn, cond, uncond)


def test_ddim(setup):
    schedule, model_fn, cond, uncond = setup
    s = DDIMSampler(schedule.betas, "eps", rescale_cfg=False, eta=0.0)
    # steps must divide T cleanly (the reference's +1 timestep shift
    # overflows otherwise, ddim_sampler.py:33)
    out1 = _run(s, model_fn, cond, uncond, steps=4)
    out2 = _run(s, model_fn, cond, uncond, steps=4)
    np.testing.assert_array_equal(out1, out2)  # eta=0 deterministic


@pytest.mark.parametrize(
    "solver",
    [
        "edm_euler", "edm_euler_a", "edm_heun", "edm_dpm_2", "edm_dpm_2_a",
        "edm_lms", "edm_dpm++_2s_a", "edm_dpm++_sde", "edm_dpm++_2m",
        "edm_dpm++_2m_sde", "edm_dpm++_3m_sde",
    ],
)
def test_edm_solvers(setup, solver):
    schedule, model_fn, cond, uncond = setup
    s = EDMSampler(
        schedule.betas, "eps", rescale_cfg=False, solver_type=solver,
        s_churn=0.5 if "euler" == solver[4:] else 0.0,
    )
    _run(s, model_fn, cond, uncond, steps=4)


def test_dpm_solver_m2(setup):
    schedule, model_fn, cond, uncond = setup
    s = DPMSolverSampler(schedule.betas, "eps", rescale_cfg=False, model_spec="dpm++_m2")
    _run(s, model_fn, cond, uncond, steps=4)


def test_dpm_solver_orders(setup):
    schedule, model_fn, cond, uncond = setup
    for spec in ["dpm++_m1", "dpm++_m3", "dpm_m2"]:
        s = DPMSolverSampler(schedule.betas, "eps", rescale_cfg=False, model_spec=spec)
        _run(s, model_fn, cond, uncond, steps=4)


def test_edm_v_param(setup):
    _, model_fn, cond, uncond = setup
    sched = Schedule.create(timesteps=100, parameterization="v", zero_snr=True)
    s = EDMSampler(sched.betas, "v", rescale_cfg=True, solver_type="edm_dpm++_3m_sde")
    _run(s, model_fn, cond, uncond, steps=4)


def test_dpm_solver_singlestep(setup):
    schedule, model_fn, cond, uncond = setup
    for spec in ["dpm++_s2", "dpm++_s3", "dpm_s2"]:
        s = DPMSolverSampler(schedule.betas, "eps", rescale_cfg=False, model_spec=spec)
        _run(s, model_fn, cond, uncond, steps=6)


def test_3m_sde_scan_matches_unrolled(setup):
    """The scan-compiled default solver must equal the unrolled form (eta=0)."""
    schedule, model_fn, cond, uncond = setup
    s = EDMSampler(
        schedule.betas, "eps", rescale_cfg=False, solver_type="edm_dpm++_3m_sde",
        eta=0.0,
    )
    x_T = jax.random.normal(jax.random.PRNGKey(11), X_SHAPE)
    out_scan = s.sample(model_fn, x_T, cond, uncond, 2.0, 6, jax.random.PRNGKey(12))

    # drive the unrolled implementation through the same denoiser plumbing
    sigmas, ts = s.make_schedule(6)
    bs = X_SHAPE[0]

    def denoiser(x, sigma, rescaled_cfg):
        sigma = float(sigma)
        c_in = 1.0 / (sigma**2 + 1.0) ** 0.5
        t_model = s._model_t(sigma, sigmas, ts)
        t_vec = jnp.full((bs,), t_model, jnp.float32)
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t_vec, t_vec], axis=0)
        c2 = {k: jnp.concatenate([cond[k], uncond[k]], axis=0) for k in cond}
        out = model_fn((x2 * c_in).astype(x2.dtype), t2, c2) * (-sigma) + x2
        o_c, o_u = jnp.split(out, 2, axis=0)
        return o_u + rescaled_cfg * (o_c - o_u)

    def cfg_at(sigma):
        t_model = s._model_t(float(sigma), sigmas, ts)
        return float(s.cfg_scales(2.0, np.array([t_model]))[0])

    x0 = x_T * np.sqrt(1.0 + sigmas[0] ** 2)
    out_unrolled = s._solve_dpmpp_3m_sde_unrolled(
        denoiser, x0, sigmas, cfg_at, jax.random.PRNGKey(12)
    )
    np.testing.assert_allclose(
        np.asarray(out_scan), np.asarray(out_unrolled), atol=1e-3, rtol=1e-3
    )


def test_2m_sde_and_euler_a_scan_match_unrolled(setup):
    """Scan versions equal the unrolled forms when eta=0 (deterministic)."""
    schedule, model_fn, cond, uncond = setup
    x_T = jax.random.normal(jax.random.PRNGKey(21), X_SHAPE)
    for solver, unrolled_name in [
        ("edm_dpm++_2m_sde", "_solve_dpmpp_2m_sde"),
        ("edm_euler_a", "_solve_euler_a"),
    ]:
        s = EDMSampler(schedule.betas, "eps", rescale_cfg=False,
                       solver_type=solver, eta=0.0)
        out_scan = s.sample(model_fn, x_T, cond, uncond, 2.0, 6, jax.random.PRNGKey(22))
        sigmas, ts = s.make_schedule(6)
        bs = X_SHAPE[0]

        def denoiser(x, sigma, rescaled_cfg, s=s, sigmas=sigmas, ts=ts):
            sigma = float(sigma)
            c_in = 1.0 / (sigma**2 + 1.0) ** 0.5
            t_model = s._model_t(sigma, sigmas, ts)
            t_vec = jnp.full((bs,), t_model, jnp.float32)
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t_vec, t_vec], axis=0)
            c2 = {k: jnp.concatenate([cond[k], uncond[k]], axis=0) for k in cond}
            out = model_fn((x2 * c_in).astype(x2.dtype), t2, c2) * (-sigma) + x2
            o_c, o_u = jnp.split(out, 2, axis=0)
            return o_u + rescaled_cfg * (o_c - o_u)

        def cfg_at(sigma, s=s, sigmas=sigmas, ts=ts):
            t_model = s._model_t(float(sigma), sigmas, ts)
            return float(s.cfg_scales(2.0, np.array([t_model]))[0])

        x0 = x_T * np.sqrt(1.0 + sigmas[0] ** 2)
        out_unrolled = getattr(s, unrolled_name)(
            denoiser, x0, sigmas, cfg_at, jax.random.PRNGKey(22)
        )
        np.testing.assert_allclose(
            np.asarray(out_scan), np.asarray(out_unrolled), atol=1e-3, rtol=1e-3,
            err_msg=solver,
        )


def test_dpm_fast_and_adaptive(setup):
    schedule, model_fn, cond, uncond = setup
    for solver in ["edm_dpm_fast", "edm_dpm_adaptive"]:
        s = EDMSampler(
            schedule.betas, "eps", rescale_cfg=False, solver_type=solver,
            eta=0.0, order=3,
        )
        x_T = jax.random.normal(jax.random.PRNGKey(31), X_SHAPE)
        out = s.sample(model_fn, x_T, cond, uncond, 1.5, 6, jax.random.PRNGKey(32))
        out = np.asarray(out)
        assert out.shape == X_SHAPE and np.all(np.isfinite(out)), solver


@pytest.mark.parametrize("order,eta", [(3, 0.0), (2, 0.0), (3, 1.0)])
def test_dpm_adaptive_jit(setup, order, eta):
    """dpm_adaptive under jit (lax.while_loop PID controller) matches the
    eager host-loop solver. At eta=0 both are deterministic; the only
    divergence source is fp32-vs-float64 controller scalars, so the
    trajectories agree tightly. eta>0 checks the jitted SDE path stays
    finite and in-range (the rng consumption pattern matches eager, but
    controller rounding can shift an accept decision, so no exact
    comparison)."""
    schedule, model_fn, cond, uncond = setup
    s = EDMSampler(
        schedule.betas, "eps", rescale_cfg=False,
        solver_type="edm_dpm_adaptive", eta=eta, order=order,
    )
    x_T = jax.random.normal(jax.random.PRNGKey(41), X_SHAPE)

    @jax.jit
    def jitted(x_T, rng):
        return s.sample(model_fn, x_T, cond, uncond, 1.5, 6, rng)

    out_jit = np.asarray(jitted(x_T, jax.random.PRNGKey(42)))
    assert out_jit.shape == X_SHAPE and np.all(np.isfinite(out_jit))
    out_eager = np.asarray(
        s.sample(model_fn, x_T, cond, uncond, 1.5, 6, jax.random.PRNGKey(42))
    )
    if eta == 0.0:
        np.testing.assert_allclose(out_jit, out_eager, atol=2e-3, rtol=2e-3)
    else:
        # same support/scale even when an accept decision shifts
        assert np.abs(out_jit).max() < 10 * max(np.abs(out_eager).max(), 1.0)


def test_dpm_adaptive_jit_with_guidance(setup):
    """The traced gnudge path (lax.cond gate) compiles and runs."""
    from diffbir_tpu.utils.cond_fn import MSEGuidance

    schedule, model_fn, cond, uncond = setup
    s = EDMSampler(
        schedule.betas, "eps", rescale_cfg=False,
        solver_type="edm_dpm_adaptive", eta=0.0, order=3,
    )
    cf = MSEGuidance(scale=0.05, t_start=601, t_stop=-1, space="latent", repeat=1)
    x_T = jax.random.normal(jax.random.PRNGKey(43), X_SHAPE)
    target = jnp.zeros(X_SHAPE)

    @jax.jit
    def jitted(x_T, rng, target):
        return s.sample(
            model_fn, x_T, cond, uncond, 1.5, 6, rng,
            cond_fn=cf, guidance_target=target,
        )

    out = np.asarray(jitted(x_T, jax.random.PRNGKey(44), target))
    assert out.shape == X_SHAPE and np.all(np.isfinite(out))
    # guidance moved the trajectory
    base = np.asarray(
        s.sample(model_fn, x_T, cond, uncond, 1.5, 6, jax.random.PRNGKey(44))
    )
    assert np.abs(out - base).max() > 1e-6
