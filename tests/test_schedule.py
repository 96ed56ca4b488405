import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffbir_tpu import schedule as S


def test_linear_betas_endpoints():
    betas = S.make_beta_schedule("linear", 1000, 1e-4, 2e-2)
    assert betas.shape == (1000,)
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(2e-2)
    assert np.all(np.diff(betas) > 0)


def test_cosine_betas_bounded():
    betas = S.make_beta_schedule("cosine", 1000)
    assert np.all(betas > 0) and np.all(betas <= 0.999)


def test_zero_snr_terminal():
    betas = S.make_beta_schedule("linear", 1000, 1e-4, 2e-2)
    z = S.enforce_zero_terminal_snr(betas)
    ac = np.cumprod(1 - z)
    # terminal alpha_bar must be ~0 (zero SNR), initial unchanged
    assert abs(ac[-1]) < 1e-12
    assert np.sqrt(ac[0]) == pytest.approx(np.sqrt(1 - betas[0]), rel=1e-10)


@pytest.mark.parametrize("spec,expect_n", [("50", 50), ("10", 10), ("ddim25", 25)])
def test_space_timesteps_counts(spec, expect_n):
    ts = S.space_timesteps(1000, spec)
    assert len(ts) == expect_n
    assert len(set(ts.tolist())) == len(ts)
    assert ts.min() >= 0 and ts.max() < 1000
    assert np.all(np.diff(ts) > 0)  # sorted


def test_space_timesteps_includes_ends():
    ts = S.space_timesteps(1000, "50")
    assert 0 in ts and 999 in ts


def test_q_sample_and_v_roundtrip():
    sched = S.Schedule.create(timesteps=1000, parameterization="v")
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 8, 8, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    t = jnp.array([10, 500])
    x_t = sched.q_sample(x0, t, noise)
    v = sched.get_v(x0, noise, t)
    # pred_x0 from v must recover x0 exactly (identity: a*(a x0+s e) - s*(a e - s x0) = x0)
    rec = sched.pred_x0(x_t, t, v)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=1e-5)


def test_pred_x0_eps():
    sched = S.Schedule.create(timesteps=1000, parameterization="eps")
    x0 = jnp.ones((1, 4, 4, 4))
    noise = jnp.full((1, 4, 4, 4), 0.5)
    t = jnp.array([300])
    x_t = sched.q_sample(x0, t, noise)
    rec = sched.pred_x0(x_t, t, noise)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=1e-5)


def test_spaced_coeffs_match_definition():
    betas = S.make_beta_schedule("linear", 1000)
    c = S.make_spaced_coeffs(betas, 50)
    assert len(c.timesteps) == 50
    ac_train = np.cumprod(1 - betas)
    # alphas_cumprod of the respaced chain equals the training alphas_cumprod
    # at the selected timesteps (telescoping product property).
    np.testing.assert_allclose(
        c.sqrt_alphas_cumprod**2, ac_train[c.timesteps], rtol=1e-10
    )
    # posterior coefficients sum rule: coef1*x0 + coef2*x_t is a convex-ish
    # combination; check coef identities at a step.
    i = 20
    b = 1 - ac_train[c.timesteps[i]] / ac_train[c.timesteps[i - 1]]
    a_prev = ac_train[c.timesteps[i - 1]]
    a_cur = ac_train[c.timesteps[i]]
    np.testing.assert_allclose(
        c.posterior_mean_coef1[i], b * np.sqrt(a_prev) / (1 - a_cur), rtol=1e-10
    )


def test_ddim_params():
    betas = S.make_beta_schedule("linear", 1000)
    ts, alphas, alphas_prev, sigmas = S.make_ddim_params(betas, 50, eta=0.0)
    assert len(ts) == 50 and ts[0] == 1
    assert np.all(sigmas == 0)
    ac = np.cumprod(1 - betas)
    np.testing.assert_allclose(alphas, ac[ts], rtol=1e-12)
    assert alphas_prev[0] == ac[0]


def test_cfg_scale_schedule():
    # no rescale: constant
    out = S.cfg_scale_schedule(4.0, np.array([0, 500, 999]), rescale=False)
    np.testing.assert_allclose(out, 4.0)
    # rescale: monotone increasing as t decreases; at t=1000 -> 1.0
    out = S.cfg_scale_schedule(4.0, np.array([1000, 500, 0]), rescale=True)
    assert out[0] == pytest.approx(1.0)
    assert out[0] < out[1] < out[2] <= 5.0


@pytest.mark.parametrize("param", ["eps", "v", "x0"])
def test_schedule_target(param):
    sched = S.Schedule.create(timesteps=100, parameterization=param)
    x0 = jnp.ones((1, 2, 2, 1))
    noise = jnp.zeros((1, 2, 2, 1))
    t = jnp.array([50])
    tgt = sched.target(x0, noise, t)
    assert tgt.shape == x0.shape


# Parity with the torch reference implementation where importable.
def test_parity_with_reference_gaussian_diffusion():
    import importlib.util, pathlib, sys

    ref = pathlib.Path("/root/reference/diffbir/model/gaussian_diffusion.py")
    if not ref.exists():
        pytest.skip("reference not mounted")
    try:
        import torch  # noqa: F401
    except ImportError:
        pytest.skip("torch unavailable")
    spec = importlib.util.spec_from_file_location("ref_gd", ref)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    for kind in ["linear", "cosine", "sqrt_linear", "sqrt"]:
        if kind == "cosine":
            # reference cosine path calls .pow on numpy (torch-ism bug); skip
            continue
        ours = S.make_beta_schedule(kind, 321)
        theirs = mod.make_beta_schedule(kind, 321)
        np.testing.assert_allclose(ours, theirs, rtol=1e-12)

    betas = S.make_beta_schedule("linear", 1000)
    np.testing.assert_allclose(
        S.enforce_zero_terminal_snr(betas),
        mod.enforce_zero_terminal_snr(betas),
        rtol=0,
        atol=1e-9,
    )


def test_zero_snr_tables_finite_no_warnings():
    """Zero-terminal-SNR schedules (ac[-1] == 0) must yield finite spaced/EDM
    tables with no RuntimeWarnings (VERDICT r1 weak #3)."""
    import warnings

    from diffbir_tpu.sampler.edm import EDMSampler

    betas = S.enforce_zero_terminal_snr(S.make_beta_schedule("linear", 1000))
    assert np.cumprod(1 - betas)[-1] == 0.0
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        for steps in (10, 50):
            coeffs = S.make_spaced_coeffs(betas, steps)
            for field in (
                "sqrt_alphas_cumprod",
                "sqrt_one_minus_alphas_cumprod",
                "sqrt_recip_alphas_cumprod",
                "sqrt_recipm1_alphas_cumprod",
                "posterior_variance",
                "posterior_log_variance_clipped",
                "posterior_mean_coef1",
                "posterior_mean_coef2",
            ):
                vals = getattr(coeffs, field)
                assert np.all(np.isfinite(vals)), f"{field} not finite at {steps} steps"
        sampler = EDMSampler(betas, "v", False, solver_type="euler")
        sigmas, ts = sampler.make_schedule(10)
        assert np.all(np.isfinite(sigmas)) and np.all(np.isfinite(ts))
