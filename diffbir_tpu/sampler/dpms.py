"""DPM-Solver / DPM-Solver++ (multistep) sampler.

Behavioral parity targets:
- /root/reference/diffbir/sampler/dpms_sampler.py:17-101 (spec parsing
  "dpm++_m2" -> algorithm/method/order; NoiseScheduleVP discrete; wrapper
  with classifier-free guidance + cfg rescale; time_uniform steps)
- /root/reference/diffbir/sampler/dpm_solver_pytorch.py (NoiseScheduleVP
  log-alpha interpolation + numerical lambda clipping :100-126; first/second/
  third multistep updates :565-949; lower_order_final warmup/cooldown
  :1200-1235; model t_input = (t - 1/N) * 1000).

All time/lambda/sigma/alpha scalars are static per schedule -> host numpy;
the model is evaluated once per step (batched CFG).
"""

from __future__ import annotations

from typing import Mapping, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .base import ModelFn, Sampler, cfg_model_call


class _DiscreteVPSchedule:
    """Host-side NoiseScheduleVP(schedule='discrete')."""

    def __init__(self, betas: np.ndarray, clipped_lambda: float = -5.1):
        log_alphas = 0.5 * np.cumsum(np.log(1.0 - betas))
        # numerical clip: drop trailing entries with lambda < clipped_lambda
        with np.errstate(divide="ignore", invalid="ignore"):
            log_sigmas = 0.5 * np.log(1.0 - np.exp(2.0 * log_alphas))
            lambs = log_alphas - log_sigmas
        idx = np.searchsorted(np.flip(lambs), clipped_lambda)
        if idx > 0:
            log_alphas = log_alphas[:-idx]
        self.log_alpha_array = log_alphas
        self.total_N = len(log_alphas)
        self.t_array = np.linspace(0.0, 1.0, self.total_N + 1)[1:]
        self.T = 1.0

    def log_alpha(self, t):
        return np.interp(t, self.t_array, self.log_alpha_array)

    def alpha(self, t):
        return np.exp(self.log_alpha(t))

    def sigma(self, t):
        return np.sqrt(1.0 - np.exp(2.0 * self.log_alpha(t)))

    def lam(self, t):
        la = self.log_alpha(t)
        return la - 0.5 * np.log(1.0 - np.exp(2.0 * la))

    def model_t(self, t):
        """Continuous t -> discrete model timestep input."""
        return (t - 1.0 / self.total_N) * 1000.0

    def inverse_lambda(self, lamb):
        """half-logSNR -> continuous time (lambda is decreasing in t)."""
        lams = self.lam(self.t_array)
        return float(np.interp(lamb, lams[::-1], self.t_array[::-1]))


class DPMSolverSampler(Sampler):
    def __init__(self, betas, parameterization, rescale_cfg, model_spec: str):
        super().__init__(betas, parameterization, rescale_cfg)
        solver, mo = model_spec.split("_")
        self.algorithm = {"dpm": "dpmsolver", "dpm++": "dpmsolver++"}[solver]
        self.method = {"s": "singlestep", "m": "multistep"}[mo[0]]
        self.order = int(mo[1])

    def model_ts(self, steps: int):
        """All model-call timesteps (outer grid + singlestep inner points).
        Superset-safe: hoist lookup is by exact value, and every value here
        reproduces sample()'s own ``ns.model_t`` arithmetic bit-for-bit."""
        ns = _DiscreteVPSchedule(self.training_betas)
        t_T, t_0 = ns.T, 1.0 / ns.total_N
        fine = np.linspace(t_T, t_0, steps + 1)
        t_cont = list(fine)
        if self.method == "singlestep":
            orders = self._singlestep_orders(steps)
            outer = fine[np.cumsum([0] + orders)]
            for blk, o in enumerate(orders):
                if o > 1:
                    # _sample_singlestep: inner = np.linspace(s, t, o+1)
                    inner = np.linspace(outer[blk], outer[blk + 1], o + 1)
                    t_cont.extend(float(v) for v in inner[1:-1])
        return np.asarray([ns.model_t(t) for t in t_cont], np.float32)

    def _singlestep_orders(self, steps: int):
        order = self.order
        if order == 3:
            K = steps // 3 + 1
            return {0: [3] * (K - 2) + [2, 1], 1: [3] * (K - 1) + [1],
                    2: [3] * (K - 1) + [2]}[steps % 3]
        if order == 2:
            K = steps // 2
            return [2] * K if steps % 2 == 0 else [2] * K + [1]
        return [1] * steps

    def sample(
        self,
        model_fn: ModelFn,
        x_T: jax.Array,
        cond: Mapping[str, jax.Array],
        uncond: Optional[Mapping[str, jax.Array]],
        cfg_scale: float,
        steps: int,
        rng: jax.Array,
    ) -> jax.Array:
        ns = _DiscreteVPSchedule(self.training_betas)
        t_T, t_0 = ns.T, 1.0 / ns.total_N
        ts = np.linspace(t_T, t_0, steps + 1)
        bs = x_T.shape[0]
        v_param = self.parameterization == "v"
        data_pred = self.algorithm == "dpmsolver++"

        def eval_model(x, t_cont: float):
            """x0 (dpmsolver++) or eps (dpmsolver) prediction at time t."""
            mt = ns.model_t(t_cont)
            alpha, sigma = ns.alpha(t_cont), ns.sigma(t_cont)
            t_vec = jnp.full((bs,), mt, jnp.float32)
            cur_cfg = float(self.cfg_scales(cfg_scale, np.array([mt]))[0])
            out = cfg_model_call(
                model_fn, x, t_vec, cond, uncond if cfg_scale != 1.0 else None,
                cur_cfg,
            ).astype(x.dtype)
            if v_param:
                eps = alpha * out + sigma * x
            else:
                eps = out
            if data_pred:
                return (x - sigma * eps) / alpha
            return eps

        def first_update(x, s, t, model_s):
            h = ns.lam(t) - ns.lam(s)
            if data_pred:
                return (ns.sigma(t) / ns.sigma(s)) * x - ns.alpha(t) * np.expm1(-h) * model_s
            return np.exp(ns.log_alpha(t) - ns.log_alpha(s)) * x - ns.sigma(t) * np.expm1(h) * model_s

        def second_update(x, m_prev, t_prev, t):
            (m1, m0), (t1, t0_) = m_prev[-2:], t_prev[-2:]
            l1, l0, lt = ns.lam(t1), ns.lam(t0_), ns.lam(t)
            h0, h = l0 - l1, lt - l0
            r0 = h0 / h
            D1_0 = (1.0 / r0) * (m0 - m1)
            if data_pred:
                phi_1 = np.expm1(-h)
                return (
                    (ns.sigma(t) / ns.sigma(t0_)) * x
                    - ns.alpha(t) * phi_1 * m0
                    - 0.5 * ns.alpha(t) * phi_1 * D1_0
                )
            phi_1 = np.expm1(h)
            return (
                np.exp(ns.log_alpha(t) - ns.log_alpha(t0_)) * x
                - ns.sigma(t) * phi_1 * m0
                - 0.5 * ns.sigma(t) * phi_1 * D1_0
            )

        def third_update(x, m_prev, t_prev, t):
            m2, m1, m0 = m_prev[-3:]
            t2, t1, t0_ = t_prev[-3:]
            l2, l1, l0, lt = ns.lam(t2), ns.lam(t1), ns.lam(t0_), ns.lam(t)
            h1, h0, h = l1 - l2, l0 - l1, lt - l0
            r0, r1 = h0 / h, h1 / h
            D1_0 = (1.0 / r0) * (m0 - m1)
            D1_1 = (1.0 / r1) * (m1 - m2)
            D1 = D1_0 + (r0 / (r0 + r1)) * (D1_0 - D1_1)
            D2 = (1.0 / (r0 + r1)) * (D1_0 - D1_1)
            if data_pred:
                phi_1 = np.expm1(-h)
                phi_2 = phi_1 / h + 1.0
                phi_3 = phi_2 / h - 0.5
                return (
                    (ns.sigma(t) / ns.sigma(t0_)) * x
                    - ns.alpha(t) * phi_1 * m0
                    + ns.alpha(t) * phi_2 * D1
                    - ns.alpha(t) * phi_3 * D2
                )
            phi_1 = np.expm1(h)
            phi_2 = phi_1 / h - 1.0
            phi_3 = phi_2 / h - 0.5
            return (
                np.exp(ns.log_alpha(t) - ns.log_alpha(t0_)) * x
                - ns.sigma(t) * phi_1 * m0
                - ns.sigma(t) * phi_2 * D1
                - ns.sigma(t) * phi_3 * D2
            )

        def update(x, m_prev, t_prev, t, order):
            if order == 1:
                return first_update(x, t_prev[-1], t, m_prev[-1])
            if order == 2:
                return second_update(x, m_prev, t_prev, t)
            return third_update(x, m_prev, t_prev, t)

        if self.method == "singlestep":
            return self._sample_singlestep(eval_model, ns, x_T, steps)

        order = self.order
        x = x_T
        t_prev = [ts[0]]
        m_prev = [eval_model(x, ts[0])]
        # warmup with increasing order (dpm_solver_pytorch.py:1203-1213)
        for step in range(1, order):
            t = ts[step]
            x = update(x, m_prev, t_prev, t, step)
            t_prev.append(t)
            m_prev.append(eval_model(x, t))
        for step in range(order, steps + 1):
            t = ts[step]
            if steps < 10:  # lower_order_final
                step_order = min(order, steps + 1 - step)
            else:
                step_order = order
            x = update(x, m_prev, t_prev, t, step_order)
            t_prev = t_prev[1:] + [t] if len(t_prev) >= order else t_prev + [t]
            if step < steps:
                m_prev = (m_prev[1:] if len(m_prev) >= order else m_prev) + [
                    eval_model(x, t)
                ]
        return x

    # ------------------------------------------------------------------ #
    def _sample_singlestep(self, eval_model, ns, x_T, steps):
        """Singlestep DPM-Solver-fast: mixed-order blocks using all NFE
        (dpm_solver_pytorch.py:500-563, 610-812; 'dpmsolver' update type)."""
        orders = self._singlestep_orders(steps)
        t_T, t_0 = ns.T, 1.0 / ns.total_N
        fine = np.linspace(t_T, t_0, steps + 1)
        outer = fine[np.cumsum([0] + orders)]
        data_pred = self.algorithm == "dpmsolver++"

        def sigma(t):
            return ns.sigma(t)

        def alpha(t):
            return ns.alpha(t)

        x = x_T
        for blk, o in enumerate(orders):
            s, t = outer[blk], outer[blk + 1]
            ls, lt = ns.lam(s), ns.lam(t)
            h = lt - ls
            model_s = eval_model(x, s)
            if o == 1:
                if data_pred:
                    x = (sigma(t) / sigma(s)) * x - alpha(t) * np.expm1(-h) * model_s
                else:
                    x = np.exp(ns.log_alpha(t) - ns.log_alpha(s)) * x - sigma(t) * np.expm1(h) * model_s
                continue
            # r1/r2 come from TIME-uniform inner points (sample(): timesteps_inner)
            inner = np.linspace(s, t, o + 1)
            lam_inner = np.array([ns.lam(ti) for ti in inner])
            r1 = float((lam_inner[1] - lam_inner[0]) / h)
            s1 = float(inner[1])
            if data_pred:
                x_s1 = (sigma(s1) / sigma(s)) * x - alpha(s1) * np.expm1(-r1 * h) * model_s
            else:
                x_s1 = np.exp(ns.log_alpha(s1) - ns.log_alpha(s)) * x - sigma(s1) * np.expm1(r1 * h) * model_s
            model_s1 = eval_model(x_s1, s1)
            if o == 2:
                if data_pred:
                    phi_1 = np.expm1(-h)
                    x = (
                        (sigma(t) / sigma(s)) * x
                        - alpha(t) * phi_1 * model_s
                        - (0.5 / r1) * alpha(t) * phi_1 * (model_s1 - model_s)
                    )
                else:
                    phi_1 = np.expm1(h)
                    x = (
                        np.exp(ns.log_alpha(t) - ns.log_alpha(s)) * x
                        - sigma(t) * phi_1 * model_s
                        - (0.5 / r1) * sigma(t) * phi_1 * (model_s1 - model_s)
                    )
                continue
            # order 3
            r2 = float((lam_inner[2] - lam_inner[0]) / h)
            s2 = float(inner[2])
            if data_pred:
                phi_12 = np.expm1(-r2 * h)
                phi_22 = np.expm1(-r2 * h) / (r2 * h) + 1.0
                x_s2 = (
                    (sigma(s2) / sigma(s)) * x
                    - alpha(s2) * phi_12 * model_s
                    + (r2 / r1) * alpha(s2) * phi_22 * (model_s1 - model_s)
                )
                model_s2 = eval_model(x_s2, s2)
                phi_1 = np.expm1(-h)
                phi_2 = phi_1 / h + 1.0
                x = (
                    (sigma(t) / sigma(s)) * x
                    - alpha(t) * phi_1 * model_s
                    + (1.0 / r2) * alpha(t) * phi_2 * (model_s2 - model_s)
                )
            else:
                phi_12 = np.expm1(r2 * h)
                phi_22 = np.expm1(r2 * h) / (r2 * h) - 1.0
                x_s2 = (
                    np.exp(ns.log_alpha(s2) - ns.log_alpha(s)) * x
                    - sigma(s2) * phi_12 * model_s
                    - (r2 / r1) * sigma(s2) * phi_22 * (model_s1 - model_s)
                )
                model_s2 = eval_model(x_s2, s2)
                phi_1 = np.expm1(h)
                phi_2 = phi_1 / h - 1.0
                x = (
                    np.exp(ns.log_alpha(t) - ns.log_alpha(s)) * x
                    - sigma(t) * phi_1 * model_s
                    - (1.0 / r2) * sigma(t) * phi_2 * (model_s2 - model_s)
                )
        return x
