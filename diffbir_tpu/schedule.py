"""Diffusion noise-schedule math (host-side numpy precompute).

Behavioral parity targets in the reference:
- beta schedules + zero-terminal-SNR rescale + q_sample/v math:
  /root/reference/diffbir/model/gaussian_diffusion.py:9-167
- guided-diffusion respacing: /root/reference/diffbir/sampler/spaced_sampler.py:14-116
- DDIM timestep/sigma selection: /root/reference/diffbir/sampler/ddim_sampler.py:13-58

Everything here runs on host in float64 and returns numpy arrays; samplers
gather per-step rows into fp32 tables that a single ``lax.scan`` consumes.
No torch, no device work.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple, Union

import numpy as np

import jax.numpy as jnp


# --------------------------------------------------------------------------- #
# Beta schedules
# --------------------------------------------------------------------------- #
def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Training beta schedule, float64. Matches gaussian_diffusion.py:9-36."""
    if schedule == "linear":
        betas = (
            np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64)
            ** 2
        )
    elif schedule == "cosine":
        steps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(steps / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"unknown beta schedule {schedule!r}")
    return betas


def enforce_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Rescale betas so the terminal SNR is exactly zero (arXiv:2305.08891).

    Shift-and-scale sqrt(alpha_bar) so the last value is 0 while the first is
    unchanged, then convert back to betas. Matches gaussian_diffusion.py:49-72.
    """
    alphas_bar_sqrt = np.sqrt(np.cumprod(1.0 - betas, axis=0))
    a0, aT = alphas_bar_sqrt[0], alphas_bar_sqrt[-1]
    alphas_bar_sqrt = (alphas_bar_sqrt - aT) * (a0 / (a0 - aT))
    alphas_bar = alphas_bar_sqrt**2
    alphas = np.concatenate([alphas_bar[:1], alphas_bar[1:] / alphas_bar[:-1]])
    return 1.0 - alphas


# --------------------------------------------------------------------------- #
# Respacing (guided-diffusion style)
# --------------------------------------------------------------------------- #
def space_timesteps(num_timesteps: int, section_counts: Union[str, Sequence[int]]):
    """Pick a subset of the original timesteps; guided-diffusion semantics.

    ``section_counts`` is "N", "a,b,c", "ddimN", or a list of per-section step
    counts. Returns a sorted numpy int array. Matches spaced_sampler.py:14-64.
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for stride in range(1, num_timesteps):
                if len(range(0, num_timesteps, stride)) == desired:
                    return np.array(sorted(range(0, num_timesteps, stride)), np.int32)
            raise ValueError(f"no integer stride gives exactly {desired} steps")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per, extra = divmod(num_timesteps, len(section_counts))
    start, taken = 0, []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"cannot divide section of {size} steps into {count}")
        stride = 1.0 if count <= 1 else (size - 1) / (count - 1)
        cur = 0.0
        for _ in range(count):
            taken.append(start + round(cur))
            cur += stride
        start += size
    return np.array(sorted(set(taken)), np.int32)


# --------------------------------------------------------------------------- #
# Training schedule container
# --------------------------------------------------------------------------- #
@dataclasses.dataclass(frozen=True)
class Schedule:
    """Immutable training noise schedule.

    ``parameterization`` in {"eps", "v"}; "x0" also supported for losses.
    """

    betas: np.ndarray  # float64 [T]
    parameterization: str = "eps"
    loss_type: str = "l2"

    @classmethod
    def create(
        cls,
        timesteps: int = 1000,
        beta_schedule: str = "linear",
        linear_start: float = 1e-4,
        linear_end: float = 2e-2,
        cosine_s: float = 8e-3,
        zero_snr: bool = False,
        parameterization: str = "eps",
        loss_type: str = "l2",
    ) -> "Schedule":
        betas = make_beta_schedule(
            beta_schedule, timesteps, linear_start, linear_end, cosine_s
        )
        if zero_snr:
            betas = enforce_zero_terminal_snr(betas)
        return cls(betas=betas, parameterization=parameterization, loss_type=loss_type)

    @property
    def num_timesteps(self) -> int:
        return len(self.betas)

    @property
    def alphas_cumprod(self) -> np.ndarray:
        return np.cumprod(1.0 - self.betas, axis=0)

    @property
    def sqrt_alphas_cumprod(self) -> np.ndarray:
        return np.sqrt(self.alphas_cumprod)

    @property
    def sqrt_one_minus_alphas_cumprod(self) -> np.ndarray:
        return np.sqrt(1.0 - self.alphas_cumprod)

    # ---- device-side ops (tables are gathered with jnp.take) ---- #
    def _gather(self, table: np.ndarray, t, ndim: int):
        tab = jnp.asarray(table, dtype=jnp.float32)
        out = jnp.take(tab, t)
        return out.reshape(out.shape + (1,) * (ndim - out.ndim))

    def q_sample(self, x_start, t, noise):
        """Forward diffusion: x_t = sqrt(ab_t) x0 + sqrt(1-ab_t) eps."""
        a = self._gather(self.sqrt_alphas_cumprod, t, x_start.ndim)
        s = self._gather(self.sqrt_one_minus_alphas_cumprod, t, x_start.ndim)
        return a * x_start + s * noise

    def get_v(self, x, noise, t):
        """v-parameterization target: v = sqrt(ab) eps - sqrt(1-ab) x0."""
        a = self._gather(self.sqrt_alphas_cumprod, t, x.ndim)
        s = self._gather(self.sqrt_one_minus_alphas_cumprod, t, x.ndim)
        return a * noise - s * x

    def pred_x0(self, x_t, t, model_output):
        """Recover x0 from a model output under this parameterization."""
        a = self._gather(self.sqrt_alphas_cumprod, t, x_t.ndim)
        s = self._gather(self.sqrt_one_minus_alphas_cumprod, t, x_t.ndim)
        if self.parameterization == "eps":
            return (x_t - s * model_output) / a
        elif self.parameterization == "v":
            return a * x_t - s * model_output
        elif self.parameterization == "x0":
            return model_output
        raise ValueError(self.parameterization)

    def target(self, x_start, noise, t):
        if self.parameterization == "eps":
            return noise
        elif self.parameterization == "v":
            return self.get_v(x_start, noise, t)
        elif self.parameterization == "x0":
            return x_start
        raise ValueError(self.parameterization)

    def loss(self, pred, target):
        if self.loss_type == "l2":
            return jnp.mean((pred - target) ** 2)
        elif self.loss_type == "l1":
            return jnp.mean(jnp.abs(pred - target))
        raise ValueError(self.loss_type)


# --------------------------------------------------------------------------- #
# Respaced (spaced-DDPM) per-step coefficient tables
# --------------------------------------------------------------------------- #
@dataclasses.dataclass(frozen=True)
class SpacedCoeffs:
    """Per-step fp64 tables for the ancestral spaced sampler, index i = spaced
    step (0 = lowest noise). Matches spaced_sampler.py:77-116."""

    timesteps: np.ndarray  # int32 [S] — original-process t for each spaced step
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    sqrt_recip_alphas_cumprod: np.ndarray
    sqrt_recipm1_alphas_cumprod: np.ndarray
    posterior_variance: np.ndarray
    posterior_log_variance_clipped: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray


def make_spaced_coeffs(training_betas: np.ndarray, num_steps: int) -> SpacedCoeffs:
    training_alphas_cumprod = np.cumprod(1.0 - training_betas, axis=0)
    used = space_timesteps(len(training_betas), str(num_steps))
    used_set = set(int(x) for x in used)
    betas = []
    last = 1.0
    for i, ac in enumerate(training_alphas_cumprod):
        if i in used_set:
            betas.append(1 - ac / last)
            last = ac
    betas = np.array(betas, np.float64)
    alphas = 1.0 - betas
    ac = np.cumprod(alphas, axis=0)
    ac_prev = np.append(1.0, ac[:-1])
    post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
    # Zero-terminal-SNR schedules have ac[-1] == 0 exactly; the eps-space
    # reciprocal tables would be inf (harmless for v-param, where they are
    # unused, but an inf*0 -> nan landmine + RuntimeWarning spam). Clamp like
    # edm.py's make_schedule does (ac[0] = 1e-8): large finite, never inf.
    ac_recip_safe = np.maximum(ac, 1e-8)
    return SpacedCoeffs(
        timesteps=used.astype(np.int32),
        sqrt_alphas_cumprod=np.sqrt(ac),
        sqrt_one_minus_alphas_cumprod=np.sqrt(1.0 - ac),
        sqrt_recip_alphas_cumprod=np.sqrt(1.0 / ac_recip_safe),
        sqrt_recipm1_alphas_cumprod=np.sqrt(1.0 / ac_recip_safe - 1.0),
        posterior_variance=post_var,
        posterior_log_variance_clipped=np.log(np.append(post_var[1], post_var[1:])),
        posterior_mean_coef1=betas * np.sqrt(ac_prev) / (1.0 - ac),
        posterior_mean_coef2=(1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac),
    )


# --------------------------------------------------------------------------- #
# DDIM per-step tables
# --------------------------------------------------------------------------- #
def make_ddim_timesteps(
    num_ddim_steps: int, num_ddpm_steps: int, method: str = "uniform"
) -> np.ndarray:
    """DDIM timestep selection (+1 shift). Matches ddim_sampler.py:13-36."""
    if method == "uniform":
        c = num_ddpm_steps // num_ddim_steps
        steps = np.asarray(list(range(0, num_ddpm_steps, c)))
        if steps[-1] + 1 >= num_ddpm_steps:
            # the reference (ldm) formula indexes alphacums[T] out of bounds
            # for these counts (its guarding assert is commented out there);
            # fail with actionable guidance instead of a numpy IndexError
            raise ValueError(
                f"ddim uniform steps={num_ddim_steps} over T={num_ddpm_steps} "
                f"produces timestep {steps[-1] + 1} >= T; pick a step count "
                f"n with (T // n) not dividing T - 1 (e.g. 10, 20, 50)"
            )
    elif method == "quad":
        steps = (
            np.linspace(0, np.sqrt(num_ddpm_steps * 0.8), num_ddim_steps) ** 2
        ).astype(int)
    else:
        raise NotImplementedError(method)
    return steps + 1


def make_ddim_params(
    training_betas: np.ndarray, num_steps: int, eta: float, method: str = "uniform"
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Returns (timesteps, alphas, alphas_prev, sigmas) per DDIM step.

    Matches ddim_sampler.py:39-58.
    """
    alphacums = np.cumprod(1.0 - training_betas, axis=0)
    ts = make_ddim_timesteps(num_steps, len(training_betas), method)
    alphas = alphacums[ts]
    alphas_prev = np.asarray([alphacums[0]] + alphacums[ts[:-1]].tolist())
    sigmas = eta * np.sqrt((1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))
    return ts, alphas, alphas_prev, sigmas


# --------------------------------------------------------------------------- #
# CFG rescale schedule
# --------------------------------------------------------------------------- #
def cfg_scale_schedule(
    default_cfg_scale: float, model_t: np.ndarray, rescale: bool
) -> np.ndarray:
    """Cosine-ramped CFG scale per original-process timestep.

    Matches sampler.py:31-38. ``model_t`` may be scalar or array.
    """
    model_t = np.asarray(model_t, np.float64)
    if rescale and default_cfg_scale > 1:
        ramp = (1 - np.cos(np.pi * ((1000 - model_t) / 1000) ** 5.0)) / 2
        return 1 + default_cfg_scale * ramp
    return np.full_like(model_t, default_cfg_scale, dtype=np.float64)
