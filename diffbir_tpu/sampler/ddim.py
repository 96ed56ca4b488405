"""DDIM sampling as one ``lax.scan``.

Behavioral parity target: /root/reference/diffbir/sampler/ddim_sampler.py
(uniform/quad timestep selection with +1 shift, sigma(eta) formula, v→eps
conversion, batched CFG).
"""

from __future__ import annotations

from typing import Mapping, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..schedule import make_ddim_params
from .base import (
    ModelFn,
    Sampler,
    apply_guidance,
    cfg_model_call,
    cfg_model_call_aux,
    guidance_gate,
)


class DDIMSampler(Sampler):
    def __init__(self, betas, parameterization, rescale_cfg, eta: float = 0.0):
        super().__init__(betas, parameterization, rescale_cfg)
        self.eta = eta

    def model_ts(self, steps: int):
        # pipeline always calls sample() with the default discretize
        ts, _, _, _ = make_ddim_params(
            self.training_betas, steps, self.eta, "uniform"
        )
        return ts.astype(np.float32)

    def make_tables(self, steps: int, cfg_scale: float, cond_fn=None,
                    discretize: str = "uniform"):
        """Host per-step rows, high noise -> low noise — sliceable for
        chunked dispatch (see sampler/spaced.py docstring)."""
        ts, alphas, alphas_prev, sigmas = make_ddim_params(
            self.training_betas, steps, self.eta, discretize
        )
        order = np.arange(len(ts))[::-1]
        g_on = np.zeros(len(ts), np.bool_)
        if cond_fn is not None:
            g_on = guidance_gate(cond_fn, ts[order])
        return {
            "model_t": ts[order].astype(np.float32),
            "a_t": alphas[order].astype(np.float32),
            "a_prev": alphas_prev[order].astype(np.float32),
            "sigma": sigmas[order].astype(np.float32),
            "cfg": self.cfg_scales(cfg_scale, ts[order]),
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
        bs = carry[0].shape[0]
        v_param = self.parameterization == "v"
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
            sqrt_a, sqrt_oma = jnp.sqrt(row["a_t"]), jnp.sqrt(1.0 - row["a_t"])
            if v_param:
                e_t = sqrt_a * out + sqrt_oma * x
            else:
                e_t = out
            pred_x0 = (x - sqrt_oma * e_t) / sqrt_a
            if cond_fn is not None:
                pred_x0 = apply_guidance(
                    cond_fn, guidance_target, pred_x0, row["g_on"]
                )
                # keep the ODE direction consistent with the guided x0
                e_t = (x - sqrt_a * pred_x0) / sqrt_oma
            dir_xt = jnp.sqrt(1.0 - row["a_prev"] - row["sigma"] ** 2) * e_t
            noise = row["sigma"] * jax.random.normal(sub, x.shape, x.dtype)
            x = jnp.sqrt(row["a_prev"]) * pred_x0 + dir_xt + noise
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
        discretize: str = "uniform",
        cond_fn=None,
        guidance_target: Optional[jax.Array] = None,
    ) -> jax.Array:
        if cond_fn is not None:
            assert guidance_target is not None, "guidance needs a target"
        tables = {
            k: jnp.asarray(v)
            for k, v in self.make_tables(
                steps, cfg_scale, cond_fn, discretize
            ).items()
        }
        has_aux = getattr(model_fn, "has_aux", False)
        aux0 = model_fn.init_aux() if has_aux else None
        (x, _, _) = self.scan_tables(
            model_fn, (x_T, rng, aux0), tables, cond, uncond,
            cond_fn=cond_fn, guidance_target=guidance_target,
        )
        return x
