"""Pin guidance-strength semantics across the EDM solver zoo.

VERDICT r2 weak #4: the old design applied guidance inside the denoiser at
EVERY internal eval, which high-order correctors amplify by ~dt/sigma_next
(measured 2.2e3x for heun on the first Karras step sigma 1e4 -> 0.5 — the
reference's own ``alphas_cumprod[0] = 1e-8`` pure-noise override,
/root/reference/diffbir/sampler/edm_sampler.py:88-92). The redesign
(sampler/edm.py::sample) applies exactly ONE euler-equivalent nudge per
step from the primary eval's pred_x0:

    x += (guide(pred_x0) - pred_x0) * (1 - sigma_next/sigma_hat)

These tests pin two invariants so the semantics can't drift silently:

1. cond_fn is invoked once per solver step (not once per internal eval) in
   every fixed-step unrolled solver.
2. The guidance displacement, NORMALIZED by each solver's own trajectory
   scale, is within a narrow band of euler's. (Raw trajectory norms differ
   wildly between solvers here because the pure-noise first step is
   numerically brutal for the 2nd-order sigma-space solvers — in the torch
   reference identically — so the comparison must be scale-relative.)

The model is the ideal eps-predictor for data concentrated at 0 under the
sampler's OWN t->sigma table (so model and solver agree about the
pure-noise override), making displacement ratios a property of the
guidance plumbing alone.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffbir_tpu.sampler.edm import EDMSampler
from diffbir_tpu.schedule import Schedule
from diffbir_tpu.utils.cond_fn import MSEGuidance

STEPS = 8
COND = {"c_txt": jnp.zeros((1, 77, 64)), "c_img": jnp.zeros((1, 8, 8, 4))}
TARGET = jnp.full((1, 8, 8, 4), 0.7)


class CountingGuidance(MSEGuidance):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.calls = 0

    def __call__(self, target, pred):
        self.calls += 1
        return super().__call__(target, pred)


@pytest.fixture(scope="module")
def setup():
    schedule = Schedule.create(timesteps=50)
    probe = EDMSampler(schedule.betas, "eps", False, solver_type="euler", eta=0.0)
    sig_tab, t_tab = probe.make_schedule(STEPS)
    sig_of_t = np.zeros(50)
    sig_of_t[t_tab[:-1]] = sig_tab[:-1]
    sig_of_t = jnp.asarray(sig_of_t)

    def model_fn(u, t, c):
        sig = sig_of_t[jnp.clip(t.astype(jnp.int32), 0, 49)].reshape(-1, 1, 1, 1)
        return u * sig / jnp.sqrt(sig**2 + 1)

    return schedule, model_fn


def _run(schedule, model_fn, kind, scale=None):
    s = EDMSampler(schedule.betas, "eps", False, solver_type=kind, eta=0.0)
    x_T = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, 4))
    g = None
    if scale is not None:
        g = CountingGuidance(
            scale=scale, t_start=1001, t_stop=-1, space="latent", repeat=1
        )
    out = s.sample(
        model_fn, x_T, COND, COND, 1.0, STEPS, jax.random.PRNGKey(6),
        cond_fn=g, guidance_target=TARGET if g else None,
    )
    return np.asarray(out), g


# fixed-step unrolled solvers: cond_fn must fire once per STEP, never once
# per internal eval (heun/dpm_2/2s_a/sde have 2 evals per step)
ONE_PER_STEP = [
    "euler", "heun", "dpm_2", "dpm_2_a", "lms",
    "dpm++_2s_a", "dpm++_sde", "dpm++_2m",
]  # scan-dispatched solvers (euler_a, 2m_sde, 3m_sde) trace cond_fn once


@pytest.mark.parametrize("kind", ONE_PER_STEP)
def test_guidance_applied_once_per_step(setup, kind):
    schedule, model_fn = setup
    _, g = _run(schedule, model_fn, kind, scale=1e-4)
    assert g.calls == STEPS, (kind, g.calls)


def test_normalized_strength_matches_euler(setup):
    """Displacement per unit of trajectory scale within [0.25, 1.5] of
    euler for every solver family (measured 0.43-1.13 at the redesign)."""
    schedule, model_fn = setup
    kinds = [
        "euler", "heun", "dpm_2", "lms", "dpm_fast", "dpm_adaptive",
        "dpm++_2s_a", "dpm++_2m", "dpm++_2m_sde", "dpm++_3m_sde", "euler_a",
    ]
    norm_ratio = {}
    for kind in kinds:
        base, _ = _run(schedule, model_fn, kind)
        guided, _ = _run(schedule, model_fn, kind, scale=1e-4)
        disp = float(np.linalg.norm(guided - base))
        scale = max(float(np.linalg.norm(base)), 1e-9)
        norm_ratio[kind] = disp / scale
    e = norm_ratio["euler"]
    assert e > 0
    for kind, r in norm_ratio.items():
        assert 0.25 <= r / e <= 1.5, (kind, r / e, norm_ratio)


def test_scan_path_guidance_active(setup):
    """The lax.scan fast path (dpm++_2m_sde dispatches to it) must still
    thread guidance: guided vs unguided trajectories differ, finitely.
    (Its per-step factor is the exp-integrator coefficient, bounded <=1 —
    covered by the normalized-strength band above.)"""
    schedule, model_fn = setup
    s = EDMSampler(schedule.betas, "eps", False, solver_type="dpm++_2m_sde", eta=0.0)
    x_T = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, 4))
    g = MSEGuidance(scale=1e-4, t_start=1001, t_stop=-1, space="latent", repeat=1)
    scan_out = s.sample(model_fn, x_T, COND, COND, 1.0, STEPS,
                        jax.random.PRNGKey(6), cond_fn=g, guidance_target=TARGET)
    base_scan = s.sample(model_fn, x_T, COND, COND, 1.0, STEPS, jax.random.PRNGKey(6))
    d_scan = np.asarray(scan_out - base_scan)
    assert np.all(np.isfinite(d_scan))
    assert np.linalg.norm(d_scan) > 0
