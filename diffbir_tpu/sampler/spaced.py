"""Ancestral DDPM sampling on a respaced schedule, as one ``lax.scan``.

Behavioral parity target: /root/reference/diffbir/sampler/spaced_sampler.py
(guided-diffusion respacing, posterior q(x_{t-1}|x_t,x_0) ancestral updates,
eps/v x0-prediction, per-step rescaled CFG).

The scan is factored into ``make_tables`` (host-side per-step coefficient
rows) + ``scan_tables`` (the lax.scan over any contiguous row slice, carry
threaded through) so the pipeline can split one denoise into several
bounded-duration dispatches: single dispatches past ~100 s deterministically
kill the axon TPU worker (r5 bisect, scripts/repro_monster.py — the 10-step
scan at 81920 tokens passes, the 50-step one crashes). Chunking is exact:
same per-step ops in the same order, rng chain carried across slices.
"""

from __future__ import annotations

from typing import Mapping, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..schedule import make_spaced_coeffs
from .base import (
    ModelFn,
    Sampler,
    apply_guidance,
    cfg_model_call,
    cfg_model_call_aux,
    guidance_gate,
)


class SpacedSampler(Sampler):
    def model_ts(self, steps: int):
        c = make_spaced_coeffs(self.training_betas, steps)
        return c.timesteps.astype(np.float32)

    def make_tables(self, steps: int, cfg_scale: float, cond_fn=None):
        """Host (numpy) per-step coefficient rows, high noise -> low noise.
        Sliceable: ``{k: v[lo:hi]}`` feeds ``scan_tables`` for a segment."""
        c = make_spaced_coeffs(self.training_betas, steps)
        order = np.arange(steps)[::-1]  # high noise -> low noise
        model_ts = c.timesteps[order]
        g_on = np.zeros(steps, np.bool_)
        if cond_fn is not None:
            g_on = guidance_gate(cond_fn, model_ts)
        return {
            "model_t": model_ts.astype(np.float32),
            "sqrt_recip": c.sqrt_recip_alphas_cumprod[order].astype(np.float32),
            "sqrt_recipm1": c.sqrt_recipm1_alphas_cumprod[order].astype(np.float32),
            "sqrt_ac": c.sqrt_alphas_cumprod[order].astype(np.float32),
            "sqrt_omac": c.sqrt_one_minus_alphas_cumprod[order].astype(np.float32),
            "coef1": c.posterior_mean_coef1[order].astype(np.float32),
            "coef2": c.posterior_mean_coef2[order].astype(np.float32),
            "sqrt_var": np.sqrt(c.posterior_variance[order]).astype(np.float32),
            "nonzero": (order != 0).astype(np.float32),
            "cfg": self.cfg_scales(cfg_scale, model_ts),
            "g_on": g_on,
        }

    def init_carry(self, x_T, rng, steps: int):
        """Initial scan carry for chunked dispatch (aux=None: turbo is
        excluded from chunking)."""
        return (x_T, rng, None)

    def scan_tables(
        self,
        model_fn: ModelFn,
        carry,
        tables,
        cond: Mapping[str, jax.Array],
        uncond: Optional[Mapping[str, jax.Array]],
        cond_fn=None,
        guidance_target: Optional[jax.Array] = None,
    ):
        """lax.scan the ancestral update over table rows; returns the carry
        ``(x, rng, aux)`` so segments compose exactly."""
        bs = carry[0].shape[0]
        eps_param = self.parameterization == "eps"
        has_aux = getattr(model_fn, "has_aux", False)

        def body(carry, row):
            x, rng, aux = carry
            rng, sub = jax.random.split(rng)
            t_model = jnp.full((bs,), row["model_t"], x.dtype)
            if has_aux:
                out, aux = cfg_model_call_aux(
                    model_fn, x, t_model, cond, uncond, row["cfg"], aux
                )
            else:
                out = cfg_model_call(model_fn, x, t_model, cond, uncond, row["cfg"])
            out = out.astype(x.dtype)
            if eps_param:
                x0 = row["sqrt_recip"] * x - row["sqrt_recipm1"] * out
            else:
                x0 = row["sqrt_ac"] * x - row["sqrt_omac"] * out
            if cond_fn is not None:
                x0 = apply_guidance(cond_fn, guidance_target, x0, row["g_on"])
            mean = row["coef1"] * x0 + row["coef2"] * x
            noise = jax.random.normal(sub, x.shape, x.dtype)
            x = mean + row["nonzero"] * row["sqrt_var"] * noise
            return (x, rng, aux), None

        carry, _ = jax.lax.scan(body, carry, tables)
        return carry

    def sample(
        self,
        model_fn: ModelFn,
        x_T: jax.Array,
        cond: Mapping[str, jax.Array],
        uncond: Optional[Mapping[str, jax.Array]],
        cfg_scale: float,
        steps: int,
        rng: jax.Array,
        cond_fn=None,
        guidance_target: Optional[jax.Array] = None,
    ) -> jax.Array:
        if cond_fn is not None:
            assert guidance_target is not None, "guidance needs a target"
        tables = {
            k: jnp.asarray(v)
            for k, v in self.make_tables(steps, cfg_scale, cond_fn).items()
        }
        has_aux = getattr(model_fn, "has_aux", False)
        aux0 = model_fn.init_aux() if has_aux else None
        (x, _, _) = self.scan_tables(
            model_fn, (x_T, rng, aux0), tables, cond, uncond,
            cond_fn=cond_fn, guidance_target=guidance_target,
        )
        return x
