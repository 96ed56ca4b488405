"""Exact-trajectory parity of deterministic samplers vs the torch reference.

A shared analytic mock model (eps = 0.05*x + 0.1*c_img) drives both the
reference sampler implementations and ours from the same x_T; deterministic
solvers (ddim eta=0, edm euler s_churn=0, dpm++_2m, lms, dpm++ multistep)
must produce matching trajectories to fp32 tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffbir_tpu.schedule import make_beta_schedule
from tests.ref_loader import load_reference_model_pkg, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference not mounted"
)

T = 1000
SHAPE = (1, 8, 8, 4)  # ours NHWC; reference NCHW (1, 4, 8, 8)


@pytest.fixture(scope="module")
def betas():
    return make_beta_schedule("linear", T, 0.00085, 0.0120)


@pytest.fixture(scope="module")
def ref_samplers():
    load_reference_model_pkg()
    import sys

    sys.path.insert(0, "/root/reference")
    from diffbir.sampler import DDIMSampler as RefDDIM
    from diffbir.sampler import DPMSolverSampler as RefDPMS
    from diffbir.sampler import EDMSampler as RefEDM

    return RefDDIM, RefDPMS, RefEDM


class TorchMock:
    """Reference-side model: eps = 0.05*x + 0.1*c_img."""

    def __call__(self, x, t, cond):
        return 0.05 * x + 0.1 * cond["c_img"]

    # EDMSampler calls model(x, t, cond) directly; SpacedSampler too.
    forward = __call__


def jax_model_fn(x, t, cond):
    return 0.05 * x + 0.1 * cond["c_img"]


def _conds():
    rng = np.random.default_rng(0)
    c_img = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    x_T = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    import torch

    t_cond = {"c_txt": torch.zeros(1, 77, 64), "c_img": torch.from_numpy(c_img)}
    t_uncond = {"c_txt": torch.zeros(1, 77, 64), "c_img": torch.from_numpy(c_img)}
    j_cond = {
        "c_txt": jnp.zeros((1, 77, 64)),
        "c_img": jnp.asarray(c_img.transpose(0, 2, 3, 1)),
    }
    return x_T, t_cond, t_uncond, j_cond


def test_ddim_parity(betas, ref_samplers):
    import torch

    RefDDIM, _, _ = ref_samplers
    x_T, t_cond, t_uncond, j_cond = _conds()
    ref = RefDDIM(betas, "eps", rescale_cfg=False, eta=0)
    with torch.no_grad():
        theirs = ref.sample(
            model=TorchMock(), device="cpu", steps=10, x_size=(1, 4, 8, 8),
            cond=t_cond, uncond=t_uncond, cfg_scale=1.0,
            x_T=torch.from_numpy(x_T), progress=False,
        ).numpy()

    from diffbir_tpu.sampler import DDIMSampler

    ours = DDIMSampler(betas, "eps", rescale_cfg=False, eta=0).sample(
        jax_model_fn, jnp.asarray(x_T.transpose(0, 2, 3, 1)), j_cond, None,
        1.0, 10, jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        np.asarray(ours), theirs.transpose(0, 2, 3, 1), atol=1e-4, rtol=1e-4
    )


@pytest.mark.parametrize("solver", ["edm_euler", "edm_dpm++_2m", "edm_lms", "edm_heun", "edm_dpm_2"])
def test_edm_deterministic_parity(betas, ref_samplers, solver):
    import torch

    _, _, RefEDM = ref_samplers
    x_T, t_cond, t_uncond, j_cond = _conds()
    ref = RefEDM(
        betas, "eps", rescale_cfg=False, solver_type=solver,
        s_churn=0, s_tmin=0, s_tmax=300, s_noise=1, eta=1, order=4,
    )
    with torch.no_grad():
        theirs = ref.sample(
            model=TorchMock(), device="cpu", steps=8, x_size=(1, 4, 8, 8),
            cond=t_cond, uncond=t_uncond, cfg_scale=1.0,
            x_T=torch.from_numpy(x_T), progress=False,
        ).numpy()

    from diffbir_tpu.sampler.edm import EDMSampler

    ours = EDMSampler(
        betas, "eps", rescale_cfg=False, solver_type=solver,
        s_churn=0, s_tmin=0, s_tmax=300, s_noise=1, eta=1, order=4,
    ).sample(
        jax_model_fn, jnp.asarray(x_T.transpose(0, 2, 3, 1)), j_cond, None,
        1.0, 8, jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        np.asarray(ours), theirs.transpose(0, 2, 3, 1), atol=2e-4, rtol=2e-4
    )


def test_dpm_multistep_parity(betas, ref_samplers):
    import torch

    _, RefDPMS, _ = ref_samplers
    x_T, t_cond, t_uncond, j_cond = _conds()
    ref = RefDPMS(betas, "eps", rescale_cfg=False, model_spec="dpm++_m2")
    with torch.no_grad():
        theirs = ref.sample(
            model=TorchMock(), device="cpu", steps=8, x_size=(1, 4, 8, 8),
            cond=t_cond, uncond=t_uncond, cfg_scale=1.0,
            x_T=torch.from_numpy(x_T), progress=False,
        ).numpy()

    from diffbir_tpu.sampler.dpms import DPMSolverSampler

    ours = DPMSolverSampler(betas, "eps", rescale_cfg=False, model_spec="dpm++_m2").sample(
        jax_model_fn, jnp.asarray(x_T.transpose(0, 2, 3, 1)), j_cond, None,
        1.0, 8, jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        np.asarray(ours), theirs.transpose(0, 2, 3, 1), atol=2e-4, rtol=2e-4
    )


@pytest.mark.parametrize("spec", ["dpm++_s2", "dpm++_s3", "dpm_m2", "dpm_m3"])
def test_dpm_more_variants_parity(betas, ref_samplers, spec):
    import torch

    _, RefDPMS, _ = ref_samplers
    x_T, t_cond, t_uncond, j_cond = _conds()
    ref = RefDPMS(betas, "eps", rescale_cfg=False, model_spec=spec)
    with torch.no_grad():
        theirs = ref.sample(
            model=TorchMock(), device="cpu", steps=9, x_size=(1, 4, 8, 8),
            cond=t_cond, uncond=t_uncond, cfg_scale=1.0,
            x_T=torch.from_numpy(x_T), progress=False,
        ).numpy()

    from diffbir_tpu.sampler.dpms import DPMSolverSampler

    ours = DPMSolverSampler(betas, "eps", rescale_cfg=False, model_spec=spec).sample(
        jax_model_fn, jnp.asarray(x_T.transpose(0, 2, 3, 1)), j_cond, None,
        1.0, 9, jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        np.asarray(ours), theirs.transpose(0, 2, 3, 1), atol=3e-4, rtol=3e-4
    )


@pytest.mark.parametrize("solver", ["edm_euler_a", "edm_dpm_2_a", "edm_dpm++_2s_a"])
def test_edm_ancestral_eta0_parity(betas, ref_samplers, solver):
    """eta=0 makes the ancestral solvers deterministic (sigma_up == 0)."""
    import torch

    _, _, RefEDM = ref_samplers
    x_T, t_cond, t_uncond, j_cond = _conds()
    ref = RefEDM(
        betas, "eps", rescale_cfg=False, solver_type=solver,
        s_churn=0, s_tmin=0, s_tmax=300, s_noise=1, eta=0, order=4,
    )
    with torch.no_grad():
        theirs = ref.sample(
            model=TorchMock(), device="cpu", steps=8, x_size=(1, 4, 8, 8),
            cond=t_cond, uncond=t_uncond, cfg_scale=1.0,
            x_T=torch.from_numpy(x_T), progress=False,
        ).numpy()

    from diffbir_tpu.sampler.edm import EDMSampler

    ours = EDMSampler(
        betas, "eps", rescale_cfg=False, solver_type=solver,
        s_churn=0, s_tmin=0, s_tmax=300, s_noise=1, eta=0, order=4,
    ).sample(
        jax_model_fn, jnp.asarray(x_T.transpose(0, 2, 3, 1)), j_cond, None,
        1.0, 8, jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        np.asarray(ours), theirs.transpose(0, 2, 3, 1), atol=2e-4, rtol=2e-4
    )


def test_v_param_cfg_parity(betas, ref_samplers):
    """v-parameterization + CFG + rescale_cfg through DDIM."""
    import torch

    RefDDIM, _, _ = ref_samplers
    x_T, t_cond, t_uncond, j_cond = _conds()

    class VMock:
        def __call__(self, x, t, cond):
            return 0.05 * x - 0.1 * cond["c_img"]

        forward = __call__

    def v_jax(x, t, cond):
        return 0.05 * x - 0.1 * cond["c_img"]

    # distinct uncond for a real CFG path
    t_uncond2 = {"c_txt": t_uncond["c_txt"], "c_img": t_uncond["c_img"] * 0.5}
    j_uncond2 = {"c_txt": j_cond["c_txt"], "c_img": j_cond["c_img"] * 0.5}
    ref = RefDDIM(betas, "v", rescale_cfg=True, eta=0)
    with torch.no_grad():
        theirs = ref.sample(
            model=VMock(), device="cpu", steps=10, x_size=(1, 4, 8, 8),
            cond=t_cond, uncond=t_uncond2, cfg_scale=3.0,
            x_T=torch.from_numpy(x_T), progress=False,
        ).numpy()

    from diffbir_tpu.sampler import DDIMSampler

    ours = DDIMSampler(betas, "v", rescale_cfg=True, eta=0).sample(
        v_jax, jnp.asarray(x_T.transpose(0, 2, 3, 1)), j_cond, j_uncond2,
        3.0, 10, jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        np.asarray(ours), theirs.transpose(0, 2, 3, 1), atol=2e-4, rtol=2e-4
    )


def test_spaced_sampler_mean_trajectory_parity(betas, ref_samplers, monkeypatch):
    """Zero the ancestral noise on both sides: the posterior-mean trajectory
    of the spaced (DDPM) sampler must match exactly."""
    import sys

    import torch

    from diffbir.sampler import SpacedSampler as RefSpaced

    x_T, t_cond, t_uncond, j_cond = _conds()
    monkeypatch.setattr(torch, "randn_like", lambda x: torch.zeros_like(x))
    ref = RefSpaced(betas, "eps", rescale_cfg=False)
    with torch.no_grad():
        theirs = ref.sample(
            model=TorchMock(), device="cpu", steps=10, x_size=(1, 4, 8, 8),
            cond=t_cond, uncond=t_uncond, cfg_scale=1.0,
            x_T=torch.from_numpy(x_T), progress=False,
        ).numpy()

    import diffbir_tpu.sampler.spaced as spaced_mod
    from diffbir_tpu.sampler import SpacedSampler

    real_normal = jax.random.normal
    monkeypatch.setattr(
        spaced_mod.jax.random, "normal",
        lambda key, shape, dtype=None: jnp.zeros(shape, dtype or jnp.float32),
    )
    try:
        ours = SpacedSampler(betas, "eps", rescale_cfg=False).sample(
            jax_model_fn, jnp.asarray(x_T.transpose(0, 2, 3, 1)), j_cond, None,
            1.0, 10, jax.random.PRNGKey(0),
        )
    finally:
        monkeypatch.setattr(spaced_mod.jax.random, "normal", real_normal)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.transpose(0, 2, 3, 1), atol=2e-4, rtol=2e-4
    )


def test_dpm_fast_parity(betas, ref_samplers):
    """edm_dpm_fast at eta=0 is deterministic — exact trajectory match."""
    import torch

    _, _, RefEDM = ref_samplers
    import diffbir.sampler.k_diffusion as kd

    x_T, t_cond, t_uncond, j_cond = _conds()

    # drive the reference sample_dpm_fast through the EDM denoiser plumbing
    ref = RefEDM(
        betas, "eps", rescale_cfg=False, solver_type="edm_euler",
        s_churn=0, s_tmin=0, s_tmax=300, s_noise=1, eta=0, order=3,
    )
    ref.make_schedule(9)
    den = ref.convert_to_denoiser(TorchMock(), t_cond, None, 1.0)
    sigmas_t = ref.sigmas
    pos = sigmas_t[sigmas_t > 0]
    with torch.no_grad():
        x0 = torch.from_numpy(x_T) * torch.sqrt(1.0 + sigmas_t[0] ** 2)
        theirs = kd.sample_dpm_fast(
            den, x0, float(pos.min()), float(pos.max()), 9, eta=0.0, disable=True,
        ).numpy()

    from diffbir_tpu.sampler.edm import EDMSampler

    ours = EDMSampler(
        betas, "eps", rescale_cfg=False, solver_type="edm_dpm_fast", eta=0.0,
    ).sample(
        jax_model_fn, jnp.asarray(x_T.transpose(0, 2, 3, 1)), j_cond, None,
        1.0, 9, jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        np.asarray(ours), theirs.transpose(0, 2, 3, 1), atol=3e-4, rtol=3e-4
    )


def test_dpm_adaptive_parity(betas, ref_samplers):
    """edm_dpm_adaptive at eta=0 is deterministic — locks the PID controller
    and the shared-eval order-3 low/high estimates (x_low = 2_step(r1=1/3))."""
    import torch

    _, _, RefEDM = ref_samplers
    import diffbir.sampler.k_diffusion as kd

    x_T, t_cond, t_uncond, j_cond = _conds()

    ref = RefEDM(
        betas, "eps", rescale_cfg=False, solver_type="edm_euler",
        s_churn=0, s_tmin=0, s_tmax=300, s_noise=1, eta=0, order=3,
    )
    ref.make_schedule(10)
    den = ref.convert_to_denoiser(TorchMock(), t_cond, None, 1.0)
    sigmas_t = ref.sigmas
    pos = sigmas_t[sigmas_t > 0]
    with torch.no_grad():
        x0 = torch.from_numpy(x_T) * torch.sqrt(1.0 + sigmas_t[0] ** 2)
        theirs = kd.sample_dpm_adaptive(
            den, x0, float(pos.min()), float(pos.max()), order=3, eta=0.0,
            disable=True,
        ).numpy()

    from diffbir_tpu.sampler.edm import EDMSampler

    ours = EDMSampler(
        betas, "eps", rescale_cfg=False, solver_type="edm_dpm_adaptive",
        eta=0.0, order=3,
    ).sample(
        jax_model_fn, jnp.asarray(x_T.transpose(0, 2, 3, 1)), j_cond, None,
        1.0, 10, jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        np.asarray(ours), theirs.transpose(0, 2, 3, 1), atol=1e-3, rtol=1e-3
    )


class _SeqNoise:
    """Deterministic stand-in for the reference BrownianTreeNoiseSampler:
    returns precomputed standard normals in call order (the reference's
    noise_sampler protocol, k_diffusion.py:97-121). Feeding the SAME draws
    to our ``noise_table`` injection mode makes the SDE solvers exactly
    comparable without torchsde."""

    def __init__(self, draws):
        self.draws, self.i = draws, 0

    def __call__(self, sigma_from, sigma_to):
        import torch

        v = self.draws[self.i]
        self.i += 1
        return torch.from_numpy(v)


def _sde_setup(betas, ref_samplers, steps):
    import torch

    _, _, RefEDM = ref_samplers
    x_T, t_cond, _, j_cond = _conds()
    ref = RefEDM(
        betas, "eps", rescale_cfg=False, solver_type="edm_euler",
        s_churn=0, s_tmin=0, s_tmax=300, s_noise=1, eta=1, order=4,
    )
    ref.make_schedule(steps)
    den = ref.convert_to_denoiser(TorchMock(), t_cond, None, 1.0)
    sigmas_t = ref.sigmas
    x0 = torch.from_numpy(x_T) * torch.sqrt(1.0 + sigmas_t[0] ** 2)
    return x_T, j_cond, den, sigmas_t, x0


@pytest.mark.parametrize("solver,draws_per_step", [
    ("edm_dpm++_2m_sde", 1),
    ("edm_dpm++_3m_sde", 1),
    ("edm_dpm++_sde", 2),
])
def test_sde_exact_trajectory_parity(betas, ref_samplers, solver, draws_per_step):
    """Exact-trajectory parity for the SDE solvers at eta=1: both sides
    consume identical injected normals, so drift AND diffusion math must
    match (reference k_diffusion.py:548-707)."""
    import torch

    import diffbir.sampler.k_diffusion as kd

    steps = 8
    x_T, j_cond, den, sigmas_t, x0 = _sde_setup(betas, ref_samplers, steps)
    rng = np.random.default_rng(7)
    n_calls = draws_per_step * (steps - 1)
    draws = rng.standard_normal((n_calls, 1, 4, 8, 8)).astype(np.float32)
    fake = _SeqNoise(draws)

    kd_fn = {
        "edm_dpm++_2m_sde": kd.sample_dpmpp_2m_sde,
        "edm_dpm++_3m_sde": kd.sample_dpmpp_3m_sde,
        "edm_dpm++_sde": kd.sample_dpmpp_sde,
    }[solver]
    with torch.no_grad():
        theirs = kd_fn(
            den, x0, sigmas_t, eta=1.0, s_noise=1.0,
            noise_sampler=fake, disable=True,
        ).numpy()
    assert fake.i == n_calls  # call-order assumption holds

    # our injection table, NHWC; final row(s) are multiplied by zero
    nhwc = draws.transpose(0, 1, 3, 4, 2)
    if draws_per_step == 1:
        table = np.zeros((steps, 1, 8, 8, 4), np.float32)
        table[: steps - 1] = nhwc
    else:
        table = np.zeros((steps, 2, 1, 8, 8, 4), np.float32)
        table[: steps - 1] = nhwc.reshape(steps - 1, 2, 1, 8, 8, 4)

    from diffbir_tpu.sampler.edm import EDMSampler

    ours = EDMSampler(
        betas, "eps", rescale_cfg=False, solver_type=solver,
        eta=1.0, s_noise=1.0,
    ).sample(
        jax_model_fn, jnp.asarray(x_T.transpose(0, 2, 3, 1)), j_cond, None,
        1.0, steps, jax.random.PRNGKey(0), noise_table=jnp.asarray(table),
    )
    np.testing.assert_allclose(
        np.asarray(ours), theirs.transpose(0, 2, 3, 1), atol=2e-4, rtol=2e-4
    )
