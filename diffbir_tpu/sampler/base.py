"""Sampler base: shared CFG call + schedule plumbing.

Behavioral parity target: /root/reference/diffbir/sampler/sampler.py:10-55.

TPU-first design: every sampler compiles to ONE ``lax.scan`` over
host-precomputed per-step coefficient tables. Classifier-free guidance is
folded into the batch axis (one model call on 2B, as the reference's DDIM
already does at ddim_sampler.py:118-122) so each denoise step is a single
XLA-compiled UNet+ControlNet forward.
"""

from __future__ import annotations

from typing import Callable, Mapping, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..schedule import cfg_scale_schedule

# model_fn(x, t_model, cond) -> eps/v prediction; cond = {"c_txt", "c_img"}
ModelFn = Callable[[jax.Array, jax.Array, Mapping[str, jax.Array]], jax.Array]


def cfg_model_call(
    model_fn: ModelFn,
    x: jax.Array,
    t: jax.Array,
    cond: Mapping[str, jax.Array],
    uncond: Optional[Mapping[str, jax.Array]],
    cfg_scale: jax.Array,
) -> jax.Array:
    """Batched classifier-free guidance (one forward on 2B)."""
    if uncond is None:
        return model_fn(x, t, cond)
    x2 = jnp.concatenate([x, x], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    c2 = {k: jnp.concatenate([cond[k], uncond[k]], axis=0) for k in cond}
    out = model_fn(x2, t2, c2)
    o_cond, o_uncond = jnp.split(out, 2, axis=0)
    return o_uncond + cfg_scale * (o_cond - o_uncond)


def cfg_model_call_aux(
    model_fn,
    x: jax.Array,
    t: jax.Array,
    cond: Mapping[str, jax.Array],
    uncond: Optional[Mapping[str, jax.Array]],
    cfg_scale: jax.Array,
    aux,
):
    """cfg_model_call for stateful models: model_fn(x, t, cond, aux) ->
    (out, aux). Used by the turbo control-caching wrapper (the aux pytree
    rides the sampler's scan carry)."""
    if uncond is None:
        return model_fn(x, t, cond, aux)
    x2 = jnp.concatenate([x, x], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    c2 = {k: jnp.concatenate([cond[k], uncond[k]], axis=0) for k in cond}
    out, aux = model_fn(x2, t2, c2, aux)
    o_cond, o_uncond = jnp.split(out, 2, axis=0)
    return o_uncond + cfg_scale * (o_cond - o_uncond), aux


def guidance_gate(cond_fn, model_ts: np.ndarray) -> np.ndarray:
    """Host-side bool table: guidance active while t in [t_stop, t_start]."""
    model_ts = np.asarray(model_ts)
    return (model_ts <= cond_fn.t_start) & (model_ts >= cond_fn.t_stop)


def apply_guidance(cond_fn, target, x0, g_on):
    """Apply ``repeat`` rounds of gradient guidance to a pred_x0.

    ``g_on`` is either a python/numpy bool (unrolled solvers — resolves at
    trace time) or a traced bool scalar (scan tables — lax.cond).
    """
    repeat = int(cond_fn.repeat)
    if repeat <= 0:  # reference semantics: `for _ in range(repeat)` -> off
        return x0

    def guide(v):
        for _ in range(repeat):
            g, _loss = cond_fn(target, v)
            v = v + g
        return v

    if isinstance(g_on, (bool, np.bool_)):
        return guide(x0) if g_on else x0
    return jax.lax.cond(g_on, guide, lambda v: v, x0)


class Sampler:
    """Holds the training schedule; subclasses implement ``sample``."""

    def __init__(self, betas: np.ndarray, parameterization: str, rescale_cfg: bool):
        assert parameterization in ("eps", "v")
        self.training_betas = np.asarray(betas, np.float64)
        self.training_alphas_cumprod = np.cumprod(1.0 - self.training_betas)
        self.num_timesteps = len(betas)
        self.parameterization = parameterization
        self.rescale_cfg = rescale_cfg

    def cfg_scales(self, cfg_scale: float, model_ts: np.ndarray) -> np.ndarray:
        """Per-step cosine-ramped CFG scale (sampler.py:31-38)."""
        return cfg_scale_schedule(cfg_scale, model_ts, self.rescale_cfg).astype(
            np.float32
        )

    def model_ts(self, steps: int):
        """The exact set of model-call timesteps ``sample(steps=...)`` will
        use (with the pipeline's default kwargs), or None when unknown
        (adaptive / sigma-continuous solvers). Enables the pipeline to
        precompute per-step temb projections outside the denoise scan
        (cldm.hoist_emb_tables). Returning a superset is fine; returning a
        WRONG grid is not (the lookup is by exact value)."""
        return None

    def sample(self, *args, **kwargs):  # pragma: no cover - interface
        raise NotImplementedError
