"""EDM / k-diffusion sampler zoo as lax.scan programs.

Behavioral parity targets:
- /root/reference/diffbir/sampler/edm_sampler.py:26-188 (sigma schedule from
  discrete alphas, eps/v denoiser wrapper with c_skip/c_out/c_in/c_noise,
  x_T * sqrt(1+sigma0^2) init, solver dispatch table)
- /root/reference/diffbir/sampler/k_diffusion.py:122-707 (Katherine Crowson
  solvers: euler(_a), heun, dpm_2(_a), lms, dpm++_2s_a, dpm++_sde,
  dpm++_2m(_sde), dpm++_3m_sde).

TPU-first redesign:
- every per-step scalar (sigma, t=-log sigma, h, phi coefficients, ancestral
  sigma_down/up, churn gamma, LMS quad coefficients, the sigma->model-t
  lookup, the rescaled CFG scale) depends only on the static schedule, so it
  is precomputed on host in float64; solvers emit a fixed program over these
  constants (first/last-step special cases resolve at trace time);
- SDE noise: the reference uses torchsde BrownianTree samples over
  (sigma, sigma_next); on an interval partition these are independent unit
  normals scaled by the solver, so a counter-based ``jax.random.fold_in``
  per step is distributionally equivalent (and scan-traceable).
"""

from __future__ import annotations

from typing import Mapping, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .base import ModelFn, Sampler, apply_guidance, guidance_gate

SOLVER_HPARAMS = {
    "euler": ("s_churn", "s_tmin", "s_tmax", "s_noise"),
    "euler_a": ("eta", "s_noise"),
    "heun": ("s_churn", "s_tmin", "s_tmax", "s_noise"),
    "dpm_2": ("s_churn", "s_tmin", "s_tmax", "s_noise"),
    "dpm_2_a": ("eta", "s_noise"),
    "lms": ("order",),
    "dpm_fast": ("eta", "s_noise"),
    "dpm_adaptive": ("order", "eta", "s_noise"),
    "dpm++_2s_a": ("eta", "s_noise"),
    "dpm++_sde": ("eta", "s_noise"),
    "dpm++_2m": (),
    "dpm++_2m_sde": ("eta", "s_noise"),
    "dpm++_3m_sde": ("eta", "s_noise"),
}


def _ancestral_step(s_from: float, s_to: float, eta: float):
    """sigma_down/up for an ancestral step (k_diffusion.py:56-63)."""
    if not eta:
        return s_to, 0.0
    su = min(s_to, eta * (s_to**2 * (s_from**2 - s_to**2) / s_from**2) ** 0.5)
    sd = (s_to**2 - su**2) ** 0.5
    return sd, su


def _lms_coeff(order, t, i, j):
    from scipy import integrate

    def fn(tau):
        prod = 1.0
        for k in range(order):
            if j == k:
                continue
            prod *= (tau - t[i - k]) / (t[i - j] - t[i - k])
        return prod

    return integrate.quad(fn, t[i], t[i + 1], epsrel=1e-4)[0]


class EDMSampler(Sampler):
    def __init__(
        self,
        betas: np.ndarray,
        parameterization: str,
        rescale_cfg: bool,
        solver_type: str,
        s_churn: float = 0.0,
        s_tmin: float = 0.0,
        s_tmax: float = float("inf"),
        s_noise: float = 1.0,
        eta: float = 1.0,
        order: int = 4,
    ):
        super().__init__(betas, parameterization, rescale_cfg)
        if solver_type.startswith("edm_"):
            solver_type = solver_type[len("edm_"):]
        if solver_type not in SOLVER_HPARAMS:
            raise NotImplementedError(f"edm solver {solver_type!r}")
        self.solver_type = solver_type
        self.s_churn, self.s_tmin, self.s_tmax = s_churn, s_tmin, s_tmax
        self.s_noise, self.eta, self.order = s_noise, eta, order

    # ------------------------------------------------------------------ #
    def make_schedule(self, steps: int):
        """Discrete alphas -> karras sigmas (edm_sampler.py:83-96)."""
        T = len(self.training_alphas_cumprod)
        ts = np.linspace(T - 1, 0, steps, endpoint=False).astype(int)
        ac = self.training_alphas_cumprod[ts].copy()
        ac[0] = 1e-8
        sigmas = ((1 - ac) / ac) ** 0.5
        sigmas = np.append(sigmas, 0.0)
        ts = np.append(ts, 0)
        return sigmas, ts

    def _model_t(self, sigma: float, sigmas: np.ndarray, ts: np.ndarray) -> float:
        """sigma -> nearest training timestep (edm_sampler.py:117-119)."""
        return float(ts[np.abs(sigma - sigmas).argmin()])

    def model_ts(self, steps: int):
        """Every model-call timestep is ``_model_t(...)`` of some sigma, and
        ``_model_t`` always returns an element of make_schedule's ``ts`` grid
        — so the grid itself is a safe superset for ALL edm solvers,
        including the inner points of heun/dpm_2 and the adaptive solver
        (whose traced ``_model_t_traced`` also selects from ``ts_j``)."""
        _, ts = self.make_schedule(steps)
        return np.asarray(ts, np.float32)

    # ------------------------------------------------------------------ #
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
        noise_table: Optional[jax.Array] = None,
    ) -> jax.Array:
        """``noise_table`` — exact-parity noise injection: replaces every SDE
        noise draw with a precomputed standard normal.  Shape (steps, *x)
        for dpm++_2m_sde / dpm++_3m_sde / euler_a (one draw per step; the
        final row is multiplied by 0), (steps, 2, *x) for dpm++_sde (two
        draws per step, in reference call order).  Lets tests feed both this
        sampler and the torch reference (k_diffusion.py:548-707, whose
        ``noise_sampler`` argument we mirror) identical normals, closing the
        BrownianTree-vs-fold_in determinism gap without torchsde."""
        sigmas, ts = self.make_schedule(steps)
        bs = x_T.shape[0]
        v_param = self.parameterization == "v"
        use_cfg = uncond is not None and cfg_scale != 1.0
        if cond_fn is not None:
            assert guidance_target is not None, "guidance needs a target"

        sigmas_j = jnp.asarray(sigmas, jnp.float32)
        ts_j = jnp.asarray(ts, jnp.float32)

        def _model_t_traced(sigma):
            return ts_j[jnp.argmin(jnp.abs(sigma - sigmas_j))]

        def denoiser(x, sigma: float, rescaled_cfg: float):
            """x0-prediction denoiser (edm_sampler.py:98-137).

            ``sigma`` is a host float for the unrolled/eager solvers (scalar
            math in float64, constants baked into the trace) OR a traced
            fp32 scalar for the jitted dpm_adaptive path — same formulas,
            jnp handles both."""
            traced = isinstance(sigma, jax.core.Tracer)
            if not traced:
                sigma = float(sigma)
            if v_param:
                c_skip = 1.0 / (sigma**2 + 1.0)
                c_out = -sigma / (sigma**2 + 1.0) ** 0.5
            else:
                c_skip = 1.0
                c_out = -sigma
            c_in = 1.0 / (sigma**2 + 1.0) ** 0.5
            t_model = (_model_t_traced(sigma) if traced
                       else self._model_t(sigma, sigmas, ts))
            t_vec = jnp.full((bs,), t_model, jnp.float32)

            def call(c):
                return model_fn((x * c_in).astype(x.dtype), t_vec, c) * c_out + x * c_skip

            if not use_cfg:
                return call(cond)
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t_vec, t_vec], axis=0)
            c2 = {k: jnp.concatenate([cond[k], uncond[k]], axis=0) for k in cond}
            out = model_fn((x2 * c_in).astype(x2.dtype), t2, c2) * c_out + x2 * c_skip
            o_c, o_u = jnp.split(out, 2, axis=0)
            return o_u + rescaled_cfg * (o_c - o_u)

        gnudge = None
        if cond_fn is not None:
            # Guidance strength is SOLVER-INDEPENDENT: every unrolled solver
            # applies exactly ONE euler-equivalent nudge per step,
            #   x += (guide(pred_x0) - pred_x0) * (1 - sigma_next/sigma_hat),
            # computed from the step's primary (raw) denoiser eval. This is
            # what guidance-in-the-denoiser reduces to for the euler update;
            # composing guidance into high-order correctors instead amplifies
            # it by ~dt/sigma_next (measured 2.2e3x for heun, 27x for dpm_2
            # on the first Karras step sigma 1e4 -> 0.5) because the
            # corrector divides the pred_x0 perturbation by the small
            # endpoint sigma. The gradient field is not the model ODE field,
            # so it gets a first-order step regardless of solver order.
            # (No reference semantics exist: upstream guidance is
            # spaced-sampler-only.) Pinned by tests/test_guidance_strength.py.
            def gnudge(denoised, sigma_from: float, sigma_to: float):
                if isinstance(sigma_from, jax.core.Tracer) or isinstance(
                    sigma_to, jax.core.Tracer
                ):
                    # traced variant (jitted dpm_adaptive): gate via lax.cond
                    t_model = _model_t_traced(sigma_from)
                    g_on = (t_model <= cond_fn.t_start) & (t_model >= cond_fn.t_stop)
                    guided = apply_guidance(cond_fn, guidance_target, denoised, g_on)
                    return (guided - denoised) * (1.0 - sigma_to / sigma_from)
                t_model = self._model_t(sigma_from, sigmas, ts)
                if not bool(guidance_gate(cond_fn, np.array([t_model]))[0]):
                    return 0.0
                guided = apply_guidance(cond_fn, guidance_target, denoised, True)
                return (guided - denoised) * (1.0 - float(sigma_to) / float(sigma_from))

        def cfg_at(sigma: float) -> float:
            if isinstance(sigma, jax.core.Tracer):
                # traced cosine-ramp CFG (schedule.py:295-306 in jnp)
                t_model = _model_t_traced(sigma)
                if self.rescale_cfg and cfg_scale > 1:
                    ramp = (1 - jnp.cos(jnp.pi * ((1000.0 - t_model) / 1000.0) ** 5.0)) / 2
                    return 1.0 + cfg_scale * ramp
                return jnp.float32(cfg_scale)
            t_model = self._model_t(sigma, sigmas, ts)
            return float(self.cfg_scales(cfg_scale, np.array([t_model]))[0])

        x = x_T * np.sqrt(1.0 + sigmas[0] ** 2)
        # the most-used solvers compile to a single lax.scan (fast compile at
        # any step count); the rest trace an unrolled fixed program
        scan_impls = {
            "dpm++_3m_sde": self._sample_3m_sde_scan,
            "dpm++_2m_sde": self._sample_2m_sde_scan,
            "euler_a": self._sample_euler_a_scan,
        }
        if self.solver_type in scan_impls:
            return scan_impls[self.solver_type](
                model_fn, x, sigmas, ts, cond, uncond, cfg_scale, rng, bs,
                v_param, use_cfg, cond_fn=cond_fn, guidance_target=guidance_target,
                noise_table=noise_table,
            )
        solver = getattr(self, "_solve_" + self.solver_type.replace("+", "p"))
        kw = {"gnudge": gnudge}
        if noise_table is not None:
            kw["noise_table"] = jnp.asarray(noise_table)  # SDE solvers only
        return solver(denoiser, x, sigmas, cfg_at, rng, **kw)

    # ------------------------------------------------------------------ #
    def _denoiser_rows(self, sigmas, ts, cfg_scale, v_param, n):
        rows = {k: np.zeros(n) for k in ("c_skip", "c_out", "c_in", "t_model", "cfg")}
        for i in range(n):
            sig = sigmas[i]
            if v_param:
                rows["c_skip"][i] = 1.0 / (sig**2 + 1.0)
                rows["c_out"][i] = -sig / (sig**2 + 1.0) ** 0.5
            else:
                rows["c_skip"][i] = 1.0
                rows["c_out"][i] = -sig
            rows["c_in"][i] = 1.0 / (sig**2 + 1.0) ** 0.5
            t_model = self._model_t(sig, sigmas, ts)
            rows["t_model"][i] = t_model
            rows["cfg"][i] = float(self.cfg_scales(cfg_scale, np.array([t_model]))[0])
        return rows

    @staticmethod
    def _scan_denoiser(model_fn, cond, uncond, use_cfg, bs,
                       cond_fn=None, guidance_target=None):
        """Returns (denoise, aux0) where denoise(x, row, aux) -> (out, aux)
        with the per-step scalars traced from the scan tables (batched CFG in
        one model call).  Stateful models (``has_aux`` protocol, e.g. the
        turbo interval-cached ControlNet) thread ``aux`` through the scan
        carry; for plain models aux is just ``None``. With ``cond_fn``,
        gradient guidance is applied to the x0 prediction, gated by the
        per-row ``g_on`` flag."""
        has_aux = getattr(model_fn, "has_aux", False)
        aux0 = model_fn.init_aux() if has_aux else None

        def denoise(x, row, aux):
            t_vec = jnp.full((bs,), row["t_model"], jnp.float32)

            def call(xx, tt, cc, aux):
                if has_aux:
                    raw, aux = model_fn((xx * row["c_in"]).astype(xx.dtype), tt, cc, aux)
                else:
                    raw = model_fn((xx * row["c_in"]).astype(xx.dtype), tt, cc)
                return raw * row["c_out"] + xx * row["c_skip"], aux

            if use_cfg:
                x2 = jnp.concatenate([x, x], axis=0)
                t2 = jnp.concatenate([t_vec, t_vec], axis=0)
                c2 = {k: jnp.concatenate([cond[k], uncond[k]], axis=0) for k in cond}
                out, aux = call(x2, t2, c2, aux)
                o_c, o_u = jnp.split(out, 2, axis=0)
                out = (o_u + row["cfg"] * (o_c - o_u)).astype(x.dtype)
            else:
                out, aux = call(x, t_vec, cond, aux)
                out = out.astype(x.dtype)
            if cond_fn is not None:
                out = apply_guidance(cond_fn, guidance_target, out, row["g_on"])
            return out, aux

        return denoise, aux0

    def _rows_2m_sde(self, sigmas, ts, cfg_scale, v_param):
        n = len(sigmas) - 1
        eta, s_noise = self.eta, self.s_noise
        rows = self._denoiser_rows(sigmas, ts, cfg_scale, v_param, n)
        for k in ("a", "b", "coefA", "noise"):
            rows[k] = np.zeros(n)
        h_last = None
        for i in range(n):
            if sigmas[i + 1] == 0:
                rows["a"][i], rows["b"][i] = 0.0, 1.0
                continue
            t, s = -np.log(sigmas[i]), -np.log(sigmas[i + 1])
            h = s - t
            eta_h = eta * h
            rows["a"][i] = (sigmas[i + 1] / sigmas[i]) * np.exp(-eta_h)
            rows["b"][i] = -np.expm1(-h - eta_h)
            if h_last is not None:
                rows["coefA"][i] = 0.5 * (-np.expm1(-h - eta_h)) / (h_last / h)
            if eta:
                rows["noise"][i] = sigmas[i + 1] * np.sqrt(-np.expm1(-2 * eta_h)) * s_noise
            h_last = h
        return rows

    def _scan_2m_sde(self, model_fn, carry, tables, cond, uncond,
                     cond_fn=None, guidance_target=None):
        use_cfg = uncond is not None
        bs = carry[0].shape[0]
        denoise, _ = self._scan_denoiser(
            model_fn, cond, uncond, use_cfg, bs, cond_fn, guidance_target
        )
        inj = "inj" in tables

        def body(carry, row):
            x, old, key, aux = carry
            key, k_noise = jax.random.split(key)
            denoised, aux = denoise(x, row, aux)
            x_new = row["a"] * x + row["b"] * denoised
            x_new = x_new + row["coefA"] * (denoised - old)
            z = row["inj"] if inj else jax.random.normal(
                k_noise, x.shape, x.dtype)
            x_new = x_new + row["noise"] * z
            return (x_new, denoised, key, aux), None

        carry, _ = jax.lax.scan(body, carry, tables)
        return carry

    def _sample_2m_sde_scan(
        self, model_fn, x, sigmas, ts, cond, uncond, cfg_scale, rng, bs,
        v_param, use_cfg, cond_fn=None, guidance_target=None, noise_table=None,
    ):
        """dpm++_2m_sde (midpoint) as one lax.scan; carry = old denoised."""
        rows = self._rows_2m_sde(sigmas, ts, cfg_scale, v_param)
        tables = {k: jnp.asarray(v, jnp.float32) for k, v in rows.items()}
        if cond_fn is not None:
            tables["g_on"] = jnp.asarray(guidance_gate(cond_fn, rows["t_model"]))
        if noise_table is not None:
            tables["inj"] = jnp.asarray(noise_table, x.dtype)
        _, aux0 = self._scan_denoiser(
            model_fn, cond, uncond, use_cfg, bs, cond_fn, guidance_target
        )
        carry = self._scan_2m_sde(
            model_fn, (x, jnp.zeros_like(x), rng, aux0), tables,
            cond, uncond if use_cfg else None,
            cond_fn=cond_fn, guidance_target=guidance_target,
        )
        return carry[0]

    def _rows_euler_a(self, sigmas, ts, cfg_scale, v_param):
        n = len(sigmas) - 1
        rows = self._denoiser_rows(sigmas, ts, cfg_scale, v_param, n)
        for k in ("a", "b", "noise"):
            rows[k] = np.zeros(n)
        for i in range(n):
            sd, su = _ancestral_step(sigmas[i], sigmas[i + 1], self.eta)
            ratio = (sd - sigmas[i]) / sigmas[i]
            rows["a"][i] = 1.0 + ratio
            rows["b"][i] = -ratio
            if sigmas[i + 1] > 0:
                rows["noise"][i] = self.s_noise * su
        return rows

    def _scan_euler_a(self, model_fn, carry, tables, cond, uncond,
                      cond_fn=None, guidance_target=None):
        use_cfg = uncond is not None
        bs = carry[0].shape[0]
        denoise, _ = self._scan_denoiser(
            model_fn, cond, uncond, use_cfg, bs, cond_fn, guidance_target
        )
        inj = "inj" in tables

        def body(carry, row):
            x, key, aux = carry
            key, k_noise = jax.random.split(key)
            denoised, aux = denoise(x, row, aux)
            x_new = row["a"] * x + row["b"] * denoised
            z = row["inj"] if inj else jax.random.normal(
                k_noise, x.shape, x.dtype)
            x_new = x_new + row["noise"] * z
            return (x_new, key, aux), None

        carry, _ = jax.lax.scan(body, carry, tables)
        return carry

    def _sample_euler_a_scan(
        self, model_fn, x, sigmas, ts, cond, uncond, cfg_scale, rng, bs,
        v_param, use_cfg, cond_fn=None, guidance_target=None, noise_table=None,
    ):
        """Euler-ancestral as one lax.scan (no carry beyond x)."""
        rows = self._rows_euler_a(sigmas, ts, cfg_scale, v_param)
        tables = {k: jnp.asarray(v, jnp.float32) for k, v in rows.items()}
        if cond_fn is not None:
            tables["g_on"] = jnp.asarray(guidance_gate(cond_fn, rows["t_model"]))
        if noise_table is not None:
            tables["inj"] = jnp.asarray(noise_table, x.dtype)
        _, aux0 = self._scan_denoiser(
            model_fn, cond, uncond, use_cfg, bs, cond_fn, guidance_target
        )
        carry = self._scan_euler_a(
            model_fn, (x, rng, aux0), tables,
            cond, uncond if use_cfg else None,
            cond_fn=cond_fn, guidance_target=guidance_target,
        )
        return carry[0]

    def _rows_3m_sde(self, sigmas, ts, cfg_scale, v_param):
        n = len(sigmas) - 1
        eta, s_noise = self.eta, self.s_noise
        rows = self._denoiser_rows(sigmas, ts, cfg_scale, v_param, n)
        for k in ("a", "b", "coefA", "coefB", "noise"):
            rows[k] = np.zeros(n)
        h_1 = h_2 = None
        for i in range(n):
            if sigmas[i + 1] == 0:
                rows["a"][i], rows["b"][i] = 0.0, 1.0  # x <- denoised
                continue
            t, s = -np.log(sigmas[i]), -np.log(sigmas[i + 1])
            h = s - t
            h_eta = h * (eta + 1)
            rows["a"][i] = np.exp(-h_eta)
            rows["b"][i] = -np.expm1(-h_eta)
            phi_2 = np.expm1(-h_eta) / h_eta + 1.0
            phi_3 = phi_2 / h_eta - 0.5
            if h_2 is not None:
                r0, r1 = h_1 / h, h_2 / h
                k = r0 / (r0 + r1)
                rows["coefA"][i] = (phi_2 * (1 + k) - phi_3 / (r0 + r1)) / r0
                rows["coefB"][i] = (-phi_2 * k + phi_3 / (r0 + r1)) / r1
            elif h_1 is not None:
                rows["coefA"][i] = phi_2 / (h_1 / h)
            if eta:
                rows["noise"][i] = (
                    sigmas[i + 1] * np.sqrt(-np.expm1(-2 * h * eta)) * s_noise
                )
            h_1, h_2 = h, h_1
        return rows

    def _scan_3m_sde(self, model_fn, carry, tables, cond, uncond,
                     cond_fn=None, guidance_target=None):
        use_cfg = uncond is not None
        bs = carry[0].shape[0]
        denoise, _ = self._scan_denoiser(
            model_fn, cond, uncond, use_cfg, bs, cond_fn, guidance_target
        )
        inj = "inj" in tables

        def body(carry, row):
            x, d1, d2, key, aux = carry
            key, k_noise = jax.random.split(key)
            denoised, aux = denoise(x, row, aux)
            x_new = row["a"] * x + row["b"] * denoised
            x_new = x_new + row["coefA"] * (denoised - d1) + row["coefB"] * (d1 - d2)
            noise = row["inj"] if inj else jax.random.normal(
                k_noise, x.shape, x.dtype)
            x_new = x_new + row["noise"] * noise
            return (x_new, denoised, d1, key, aux), None

        carry, _ = jax.lax.scan(body, carry, tables)
        return carry

    # -------------------------------------------------------------- #
    # Chunked-dispatch protocol (sampler/spaced.py docstring): the
    # pipeline splits one denoise into several bounded dispatches. Scan
    # solvers only — their multistep coefficients live in the per-step
    # rows, so slicing tables + threading the (x, d1, d2, rng, aux)
    # carry reproduces the single scan exactly.
    _CHUNKABLE = ("dpm++_3m_sde", "dpm++_2m_sde", "euler_a")

    def make_tables(self, steps: int, cfg_scale: float, cond_fn=None):
        if self.solver_type not in self._CHUNKABLE:
            raise NotImplementedError(
                f"chunked dispatch: no table builder for {self.solver_type}"
            )
        sigmas, ts = self.make_schedule(steps)
        v_param = self.parameterization == "v"
        rows = {
            "dpm++_3m_sde": self._rows_3m_sde,
            "dpm++_2m_sde": self._rows_2m_sde,
            "euler_a": self._rows_euler_a,
        }[self.solver_type](sigmas, ts, cfg_scale, v_param)
        rows = {k: np.asarray(v, np.float32) for k, v in rows.items()}
        if cond_fn is not None:
            rows["g_on"] = guidance_gate(cond_fn, rows["t_model"])
        return rows

    def init_carry(self, x_T, rng, steps: int):
        """Initial scan carry (aux=None: turbo is excluded from chunking).
        Includes the EDM noise pre-scaling x = x_T * sqrt(1 + sigma0^2)."""
        sigmas, _ = self.make_schedule(steps)
        x = x_T * np.sqrt(1.0 + float(sigmas[0]) ** 2)
        z = jnp.zeros_like(x)
        if self.solver_type == "euler_a":
            return (x, rng, None)
        if self.solver_type == "dpm++_2m_sde":
            return (x, z, rng, None)
        return (x, z, z, rng, None)

    def scan_tables(self, model_fn, carry, tables, cond, uncond,
                    cond_fn=None, guidance_target=None):
        scan = {
            "dpm++_3m_sde": self._scan_3m_sde,
            "dpm++_2m_sde": self._scan_2m_sde,
            "euler_a": self._scan_euler_a,
        }[self.solver_type]
        return scan(model_fn, carry, tables, cond, uncond,
                    cond_fn=cond_fn, guidance_target=guidance_target)

    # ------------------------------------------------------------------ #
    def _sample_3m_sde_scan(
        self, model_fn, x, sigmas, ts, cond, uncond, cfg_scale, rng, bs,
        v_param, use_cfg, cond_fn=None, guidance_target=None, noise_table=None,
    ):
        """dpm++_3m_sde (the default CLI solver) as ONE lax.scan.

        All per-step scalars — the denoiser's c_skip/c_out/c_in and model-t,
        the x/denoised coefficients exp(-h_eta) / -expm1(-h_eta), the
        multistep correction coefficients (folded into two linear terms in
        (denoised - d1) and (d1 - d2), zeroed for the warmup steps), and the
        SDE noise scale — are host-precomputed float64 tables; the carry
        holds the two previous denoised tensors.
        """
        rows = self._rows_3m_sde(sigmas, ts, cfg_scale, v_param)
        tables = {k: jnp.asarray(v, jnp.float32) for k, v in rows.items()}
        if cond_fn is not None:
            tables["g_on"] = jnp.asarray(guidance_gate(cond_fn, rows["t_model"]))
        if noise_table is not None:
            tables["inj"] = jnp.asarray(noise_table, x.dtype)
        _, aux0 = self._scan_denoiser(
            model_fn, cond, uncond, use_cfg, bs, cond_fn, guidance_target
        )
        init = (x, jnp.zeros_like(x), jnp.zeros_like(x), rng, aux0)
        carry = self._scan_3m_sde(
            model_fn, init, tables, cond, uncond if use_cfg else None,
            cond_fn=cond_fn, guidance_target=guidance_target,
        )
        x = carry[0]
        return x

    # ------------------------------------------------------------------ #
    # Solvers. ``denoiser`` closes over static sigma scalars, so each is a
    # python loop emitting a fixed program; steps is O(10-50) so the trace
    # is small and XLA shares the model subcomputation across steps.
    # ------------------------------------------------------------------ #
    def _churn(self, i, n, sigma):
        if self.s_tmin <= sigma <= self.s_tmax:
            return min(self.s_churn / (n - 1), 2**0.5 - 1)
        return 0.0

    def _solve_euler(self, den, x, sigmas, cfg_at, rng, gnudge=None):
        n = len(sigmas) - 1
        for i in range(n):
            gamma = self._churn(i, n + 1, sigmas[i])
            sigma_hat = sigmas[i] * (gamma + 1)
            if gamma > 0:
                rng, k = jax.random.split(rng)
                eps = jax.random.normal(k, x.shape, x.dtype) * self.s_noise
                x = x + eps * (sigma_hat**2 - sigmas[i] ** 2) ** 0.5
            denoised = den(x, sigma_hat, cfg_at(sigma_hat))
            d = (x - denoised) / sigma_hat
            x = x + d * (sigmas[i + 1] - sigma_hat)
            if gnudge is not None:
                x = x + gnudge(denoised, sigma_hat, sigmas[i + 1])
        return x

    def _solve_euler_a(self, den, x, sigmas, cfg_at, rng, gnudge=None):
        n = len(sigmas) - 1
        for i in range(n):
            denoised = den(x, sigmas[i], cfg_at(sigmas[i]))
            sd, su = _ancestral_step(sigmas[i], sigmas[i + 1], self.eta)
            d = (x - denoised) / sigmas[i]
            x = x + d * (sd - sigmas[i])
            if gnudge is not None:
                x = x + gnudge(denoised, sigmas[i], sd)
            if sigmas[i + 1] > 0:
                rng, k = jax.random.split(rng)
                x = x + jax.random.normal(k, x.shape, x.dtype) * self.s_noise * su
        return x

    def _solve_heun(self, den, x, sigmas, cfg_at, rng, gnudge=None):
        n = len(sigmas) - 1
        for i in range(n):
            gamma = self._churn(i, n + 1, sigmas[i])
            sigma_hat = sigmas[i] * (gamma + 1)
            if gamma > 0:
                rng, k = jax.random.split(rng)
                eps = jax.random.normal(k, x.shape, x.dtype) * self.s_noise
                x = x + eps * (sigma_hat**2 - sigmas[i] ** 2) ** 0.5
            denoised = den(x, sigma_hat, cfg_at(sigma_hat))
            d = (x - denoised) / sigma_hat
            dt = sigmas[i + 1] - sigma_hat
            if sigmas[i + 1] == 0:
                x = x + d * dt
            else:
                x_2 = x + d * dt
                d_2 = (x_2 - den(x_2, sigmas[i + 1], cfg_at(sigmas[i + 1]))) / sigmas[i + 1]
                x = x + (d + d_2) / 2 * dt
            if gnudge is not None:
                x = x + gnudge(denoised, sigma_hat, sigmas[i + 1])
        return x

    def _solve_dpm_2(self, den, x, sigmas, cfg_at, rng, gnudge=None):
        n = len(sigmas) - 1
        for i in range(n):
            gamma = self._churn(i, n + 1, sigmas[i])
            sigma_hat = sigmas[i] * (gamma + 1)
            if gamma > 0:
                rng, k = jax.random.split(rng)
                eps = jax.random.normal(k, x.shape, x.dtype) * self.s_noise
                x = x + eps * (sigma_hat**2 - sigmas[i] ** 2) ** 0.5
            denoised = den(x, sigma_hat, cfg_at(sigma_hat))
            d = (x - denoised) / sigma_hat
            if sigmas[i + 1] == 0:
                x = x + d * (sigmas[i + 1] - sigma_hat)
            else:
                sigma_mid = np.exp(np.log(sigma_hat) * 0.5 + np.log(sigmas[i + 1]) * 0.5)
                x_2 = x + d * (sigma_mid - sigma_hat)
                d_2 = (x_2 - den(x_2, sigma_mid, cfg_at(sigma_mid))) / sigma_mid
                x = x + d_2 * (sigmas[i + 1] - sigma_hat)
            if gnudge is not None:
                x = x + gnudge(denoised, sigma_hat, sigmas[i + 1])
        return x

    def _solve_dpm_2_a(self, den, x, sigmas, cfg_at, rng, gnudge=None):
        n = len(sigmas) - 1
        for i in range(n):
            denoised = den(x, sigmas[i], cfg_at(sigmas[i]))
            sd, su = _ancestral_step(sigmas[i], sigmas[i + 1], self.eta)
            d = (x - denoised) / sigmas[i]
            if sd == 0:
                x = x + d * (sd - sigmas[i])
                if gnudge is not None:
                    x = x + gnudge(denoised, sigmas[i], sd)
            else:
                sigma_mid = np.exp(np.log(sigmas[i]) * 0.5 + np.log(sd) * 0.5)
                x_2 = x + d * (sigma_mid - sigmas[i])
                d_2 = (x_2 - den(x_2, sigma_mid, cfg_at(sigma_mid))) / sigma_mid
                x = x + d_2 * (sd - sigmas[i])
                if gnudge is not None:
                    x = x + gnudge(denoised, sigmas[i], sd)
                rng, k = jax.random.split(rng)
                x = x + jax.random.normal(k, x.shape, x.dtype) * self.s_noise * su
        return x

    def _solve_lms(self, den, x, sigmas, cfg_at, rng, gnudge=None):
        n = len(sigmas) - 1
        ds = []
        for i in range(n):
            denoised = den(x, sigmas[i], cfg_at(sigmas[i]))
            d = (x - denoised) / sigmas[i]
            ds.append(d)
            if len(ds) > self.order:
                ds.pop(0)
            cur_order = min(i + 1, self.order)
            coeffs = [_lms_coeff(cur_order, sigmas, i, j) for j in range(cur_order)]
            x = x + sum(c * d_ for c, d_ in zip(coeffs, reversed(ds)))
            if gnudge is not None:
                x = x + gnudge(denoised, sigmas[i], sigmas[i + 1])
        return x

    # -- k-diffusion DPMSolver (eps-parameterized, t = -log sigma) -------- #
    def _kd_eps(self, den, x, t, cfg_at):
        sig = float(np.exp(-t))
        denoised = den(x, sig, cfg_at(sig))
        return (x - denoised) / sig

    def _kd_step(self, den, x, t, t_next, order, cfg_at, eps0=None, r1=None,
                 eps_r1=None):
        """dpm_solver_{1,2,3}_step (k_diffusion.py:363-392); eps0/eps_r1 can
        be passed in to share evals between steps (the reference's eps_cache:
        adaptive order-3 shares eps_r1@t+h/3 between its 2- and 3-step)."""
        h = t_next - t
        sig = lambda tt: float(np.exp(-tt))  # noqa: E731
        eps = eps0 if eps0 is not None else self._kd_eps(den, x, t, cfg_at)
        if order == 1:
            return x - sig(t_next) * np.expm1(h) * eps
        if order == 2:
            r1 = 0.5 if r1 is None else r1
            s1 = t + r1 * h
            if eps_r1 is None:
                u1 = x - sig(s1) * np.expm1(r1 * h) * eps
                eps_r1 = self._kd_eps(den, u1, s1, cfg_at)
            return (
                x - sig(t_next) * np.expm1(h) * eps
                - sig(t_next) / (2 * r1) * np.expm1(h) * (eps_r1 - eps)
            )
        r1, r2 = 1 / 3, 2 / 3
        s1, s2 = t + r1 * h, t + r2 * h
        if eps_r1 is None:
            u1 = x - sig(s1) * np.expm1(r1 * h) * eps
            eps_r1 = self._kd_eps(den, u1, s1, cfg_at)
        u2 = (
            x - sig(s2) * np.expm1(r2 * h) * eps
            - sig(s2) * (r2 / r1) * (np.expm1(r2 * h) / (r2 * h) - 1) * (eps_r1 - eps)
        )
        eps_r2 = self._kd_eps(den, u2, s2, cfg_at)
        return (
            x - sig(t_next) * np.expm1(h) * eps
            - sig(t_next) / r2 * (np.expm1(h) / h - 1) * (eps_r2 - eps)
        )

    def _solve_dpm_fast(self, den, x, sigmas, cfg_at, rng, gnudge=None):
        """DPM-Solver-Fast, fixed step (k_diffusion.py:393-430, :498-510)."""
        pos = sigmas[sigmas > 0]
        t_start, t_end = -np.log(pos.max()), -np.log(pos.min())
        n = len(sigmas) - 1
        m = n // 3 + 1
        ts = np.linspace(t_start, t_end, m + 1)
        orders = [3] * (m - 2) + [2, 1] if n % 3 == 0 else [3] * (m - 1) + [n % 3]
        eta, s_noise = self.eta, self.s_noise
        for i, o in enumerate(orders):
            t, t_next = float(ts[i]), float(ts[i + 1])
            if eta:
                sd, _ = _ancestral_step(np.exp(-t), np.exp(-t_next), eta)
                t_next_ = min(t_end, -np.log(sd))
                su = max(np.exp(-2 * t_next) - np.exp(-2 * t_next_), 0.0) ** 0.5
            else:
                t_next_, su = t_next, 0.0
            eps0 = self._kd_eps(den, x, t, cfg_at)
            x_new = self._kd_step(den, x, t, t_next_, o, cfg_at, eps0=eps0)
            if gnudge is not None:
                denoised0 = x - float(np.exp(-t)) * eps0
                x_new = x_new + gnudge(
                    denoised0, float(np.exp(-t)), float(np.exp(-t_next_))
                )
            x = x_new
            if su > 0:
                rng, k = jax.random.split(rng)
                x = x + su * s_noise * jax.random.normal(k, x.shape, x.dtype)
        return x

    def _solve_dpm_adaptive(self, den, x, sigmas, cfg_at, rng, gnudge=None):
        """DPM-Solver-12/23 with PID-controlled adaptive steps
        (k_diffusion.py:309-336, :432-496). The step size is data-dependent;
        eagerly this runs as a host loop of jitted model calls (float64
        controller scalars — the reference-parity path), and under jit it
        dispatches to a ``lax.while_loop`` formulation (fp32 controller)
        so the solver is embeddable in fully-jitted pipeline programs."""
        import math as _math

        if isinstance(x, jax.core.Tracer):
            return self._solve_dpm_adaptive_traced(
                den, x, sigmas, cfg_at, rng, gnudge=gnudge
            )
        # reference sample_dpm_adaptive(order=3): 4 is this class's generic
        # default (sample_lms parity), treat it as "unset" -> 3; any other
        # unsupported value is an explicit user error (k_diffusion raises too)
        if self.order == 4:
            order = 3
        elif self.order in (2, 3):
            order = self.order
        else:
            raise ValueError("dpm_adaptive: order should be 2 or 3")
        rtol, atol = 0.05, 0.0078
        pcoeff, icoeff, dcoeff, accept_safety = 0.0, 1.0, 0.0, 0.81
        eta, s_noise = self.eta, self.s_noise
        pos = sigmas[sigmas > 0]
        t_start, t_end = -np.log(pos.max()), -np.log(pos.min())

        # PID controller state (k_diffusion.py:309-336)
        h = 0.05
        b1 = (pcoeff + icoeff + dcoeff) / (1.5 if eta else order)
        b2 = -(pcoeff + 2 * dcoeff) / (1.5 if eta else order)
        b3 = dcoeff / (1.5 if eta else order)
        errs: list = []

        s = t_start
        x_prev = x
        while s < t_end - 1e-5:
            t = min(t_end, s + h)
            if eta:
                sd, _ = _ancestral_step(np.exp(-s), np.exp(-t), eta)
                t_ = min(t_end, -np.log(sd))
                su = max(np.exp(-2 * t) - np.exp(-2 * t_), 0.0) ** 0.5
            else:
                t_, su = t, 0.0
            eps0 = self._kd_eps(den, x, s, cfg_at)
            if order == 2:
                x_low = self._kd_step(den, x, s, t_, 1, cfg_at, eps0=eps0)
                x_high = self._kd_step(den, x, s, t_, 2, cfg_at, eps0=eps0)
            else:
                # reference: x_low = 2_step(r1=1/3) so its eps_r1 eval at
                # s+h/3 is SHARED with the 3-step (3 evals/step total)
                hh = t_ - s
                s1 = s + hh / 3
                u1 = x - float(np.exp(-s1)) * np.expm1(hh / 3) * eps0
                eps_r1 = self._kd_eps(den, u1, s1, cfg_at)
                x_low = self._kd_step(den, x, s, t_, 2, cfg_at, eps0=eps0,
                                      r1=1 / 3, eps_r1=eps_r1)
                x_high = self._kd_step(den, x, s, t_, 3, cfg_at, eps0=eps0,
                                       eps_r1=eps_r1)
            delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_low), jnp.abs(x_prev)))
            error = float(
                jnp.linalg.norm((x_low - x_high) / delta) / (x.size ** 0.5)
            )
            # PID propose_step
            inv_err = 1.0 / (error + 1e-8)
            if not errs:
                errs = [inv_err, inv_err, inv_err]
            errs[0] = inv_err
            factor = errs[0] ** b1 * errs[1] ** b2 * errs[2] ** b3
            factor = 1 + _math.atan(factor - 1)
            accept = factor >= accept_safety
            if accept:
                errs[2], errs[1] = errs[1], errs[0]
                x_prev = x_low
                if gnudge is not None:
                    denoised0 = x - float(np.exp(-s)) * eps0
                    x_high = x_high + gnudge(
                        denoised0, float(np.exp(-s)), float(np.exp(-t_))
                    )
                x = x_high
                if su > 0:
                    rng, k = jax.random.split(rng)
                    x = x + su * s_noise * jax.random.normal(k, x.shape, x.dtype)
                s = t
            h *= factor
        return x

    def _solve_dpm_adaptive_traced(self, den, x, sigmas, cfg_at, rng,
                                   gnudge=None, max_iters: int = 4096):
        """jit-complete dpm_adaptive: the PID step-size controller as a
        ``lax.while_loop`` (k_diffusion.py:309-336, :432-496 semantics).

        Scalar controller math runs in fp32 on-device (the eager path uses
        host float64), so accepted trajectories can differ from the eager
        solver within controller rounding — pinned by
        tests/test_samplers.py::test_dpm_adaptive_jit. The rng is split and
        consumed only on accepted noisy steps, matching the eager path's
        draw sequence. ``max_iters`` bounds the loop defensively (the eager
        reference has no bound; a wedged controller would otherwise hang
        the chip)."""
        order = 3 if self.order == 4 else self.order
        if order not in (2, 3):
            raise ValueError("dpm_adaptive: order should be 2 or 3")
        rtol, atol = 0.05, 0.0078
        pcoeff, icoeff, dcoeff, accept_safety = 0.0, 1.0, 0.0, 0.81
        eta, s_noise = self.eta, self.s_noise
        pos = sigmas[sigmas > 0]
        t_start, t_end = -np.log(pos.max()), -np.log(pos.min())
        b1 = (pcoeff + icoeff + dcoeff) / (1.5 if eta else order)
        b2 = -(pcoeff + 2 * dcoeff) / (1.5 if eta else order)
        b3 = dcoeff / (1.5 if eta else order)
        rsize = float(x.size ** 0.5)

        def kd_eps(u, t):
            sig = jnp.exp(-t)
            return (u - den(u, sig, cfg_at(sig))) / sig

        def kd_step(u, t, t_next, o, eps, r1=None, eps_r1=None):
            # traced port of _kd_step (same formulas, jnp scalars)
            h = t_next - t
            if o == 1:
                return u - jnp.exp(-t_next) * jnp.expm1(h) * eps
            if o == 2:
                r1_ = 0.5 if r1 is None else r1
                if eps_r1 is None:
                    s1 = t + r1_ * h
                    u1 = u - jnp.exp(-s1) * jnp.expm1(r1_ * h) * eps
                    eps_r1 = kd_eps(u1, s1)
                return (
                    u - jnp.exp(-t_next) * jnp.expm1(h) * eps
                    - jnp.exp(-t_next) / (2 * r1_) * jnp.expm1(h) * (eps_r1 - eps)
                )
            r1_, r2 = 1 / 3, 2 / 3
            s1, s2 = t + r1_ * h, t + r2 * h
            if eps_r1 is None:
                u1 = u - jnp.exp(-s1) * jnp.expm1(r1_ * h) * eps
                eps_r1 = kd_eps(u1, s1)
            u2 = (
                u - jnp.exp(-s2) * jnp.expm1(r2 * h) * eps
                - jnp.exp(-s2) * (r2 / r1_)
                * (jnp.expm1(r2 * h) / (r2 * h) - 1) * (eps_r1 - eps)
            )
            eps_r2 = kd_eps(u2, s2)
            return (
                u - jnp.exp(-t_next) * jnp.expm1(h) * eps
                - jnp.exp(-t_next) / r2 * (jnp.expm1(h) / h - 1) * (eps_r2 - eps)
            )

        def cond(carry):
            _, _, s, _, _, _, _, _, i = carry
            return (s < t_end - 1e-5) & (i < max_iters)

        def body(carry):
            xc, x_prev, s, h, e1, e2, first, key, i = carry
            t = jnp.minimum(t_end, s + h)
            if eta:
                s_from, s_to = jnp.exp(-s), jnp.exp(-t)
                su_raw = eta * jnp.sqrt(
                    s_to**2 * (s_from**2 - s_to**2) / s_from**2
                )
                sd = jnp.sqrt(s_to**2 - jnp.minimum(s_to, su_raw) ** 2)
                t_ = jnp.minimum(t_end, -jnp.log(sd))
                su = jnp.sqrt(
                    jnp.maximum(jnp.exp(-2 * t) - jnp.exp(-2 * t_), 0.0)
                )
            else:
                t_, su = t, None
            eps0 = kd_eps(xc, s)
            if order == 2:
                x_low = kd_step(xc, s, t_, 1, eps0)
                x_high = kd_step(xc, s, t_, 2, eps0)
            else:
                # x_low = 2_step(r1=1/3): its s+h/3 eval is SHARED with the
                # 3-step (3 model evals per iteration, like the reference)
                hh = t_ - s
                s1 = s + hh / 3
                u1 = xc - jnp.exp(-s1) * jnp.expm1(hh / 3) * eps0
                eps_r1 = kd_eps(u1, s1)
                x_low = kd_step(xc, s, t_, 2, eps0, r1=1 / 3, eps_r1=eps_r1)
                x_high = kd_step(xc, s, t_, 3, eps0, eps_r1=eps_r1)
            delta = jnp.maximum(
                atol, rtol * jnp.maximum(jnp.abs(x_low), jnp.abs(x_prev))
            )
            error = jnp.linalg.norm((x_low - x_high) / delta) / rsize
            inv_err = 1.0 / (error + 1e-8)
            e1_eff = jnp.where(first, inv_err, e1)
            e2_eff = jnp.where(first, inv_err, e2)
            factor = inv_err**b1 * e1_eff**b2 * e2_eff**b3
            factor = 1 + jnp.arctan(factor - 1)
            accept = factor >= accept_safety
            if gnudge is not None:
                x_high = x_high + gnudge(
                    xc - jnp.exp(-s) * eps0, jnp.exp(-s), jnp.exp(-t_)
                )
            if eta:
                key2, k = jax.random.split(key)
                noisy = su > 0
                x_high = x_high + jnp.where(noisy, su, 0.0) * s_noise * (
                    jax.random.normal(k, xc.shape, xc.dtype)
                )
                key = jnp.where(accept & noisy, key2, key)
            x_new = jnp.where(accept, x_high, xc)
            return (
                x_new,
                jnp.where(accept, x_low, x_prev),
                jnp.where(accept, t, s),
                h * factor,
                jnp.where(accept, inv_err, e1_eff),
                jnp.where(accept, e1_eff, e2_eff),
                jnp.zeros((), bool),
                key,
                i + 1,
            )

        f32 = lambda v: jnp.asarray(v, jnp.float32)  # noqa: E731
        carry = (
            x, x, f32(t_start), f32(0.05), f32(1.0), f32(1.0),
            jnp.ones((), bool), rng, jnp.zeros((), jnp.int32),
        )
        return jax.lax.while_loop(cond, body, carry)[0]

    def _solve_dpmpp_2s_a(self, den, x, sigmas, cfg_at, rng, gnudge=None):
        n = len(sigmas) - 1
        for i in range(n):
            denoised = den(x, sigmas[i], cfg_at(sigmas[i]))
            sd, su = _ancestral_step(sigmas[i], sigmas[i + 1], self.eta)
            if sd == 0:
                d = (x - denoised) / sigmas[i]
                x = x + d * (sd - sigmas[i])
            else:
                t, t_next = -np.log(sigmas[i]), -np.log(sd)
                h = t_next - t
                s = t + 0.5 * h
                x_2 = np.exp(-s + t) * x - np.expm1(-h * 0.5) * denoised
                denoised_2 = den(x_2, np.exp(-s), cfg_at(np.exp(-s)))
                x = np.exp(-t_next + t) * x - np.expm1(-h) * denoised_2
            if gnudge is not None:
                x = x + gnudge(denoised, sigmas[i], sd)
            if sigmas[i + 1] > 0:
                rng, k = jax.random.split(rng)
                x = x + jax.random.normal(k, x.shape, x.dtype) * self.s_noise * su
        return x

    def _solve_dpmpp_sde(self, den, x, sigmas, cfg_at, rng, r=0.5, gnudge=None,
                         noise_table=None):
        n = len(sigmas) - 1
        for i in range(n):
            denoised = den(x, sigmas[i], cfg_at(sigmas[i]))
            if gnudge is not None:
                gn = gnudge(denoised, sigmas[i], sigmas[i + 1])
            if sigmas[i + 1] == 0:
                d = (x - denoised) / sigmas[i]
                x = x + d * (sigmas[i + 1] - sigmas[i])
            else:
                t, t_next = -np.log(sigmas[i]), -np.log(sigmas[i + 1])
                h = t_next - t
                s = t + h * r
                fac = 1 / (2 * r)
                sig_s = np.exp(-s)

                # Brownian increments over OVERLAPPING intervals: the
                # reference noise sampler returns W(sig_s)-W(sig_i) and
                # W(sig_next)-W(sig_i), which share the (sig_i -> sig_s)
                # sub-increment. Build both standard normals from two
                # independent sub-increment draws (a over sig_i->sig_s,
                # b over sig_s->sig_next) so the joint law matches.
                if noise_table is not None:
                    # exact-parity injection: the two reference noise_sampler
                    # calls of this step, already standard normals
                    n1, n2 = noise_table[i, 0], noise_table[i, 1]
                else:
                    rng, ka, kb = jax.random.split(rng, 3)
                    a = jax.random.normal(ka, x.shape, x.dtype)
                    b = jax.random.normal(kb, x.shape, x.dtype)
                    v1 = abs(sigmas[i] - sig_s)
                    v2 = abs(sig_s - sigmas[i + 1])
                    n1 = a
                    n2 = (a * np.sqrt(v1) + b * np.sqrt(v2)) / np.sqrt(v1 + v2)

                sd, su = _ancestral_step(sigmas[i], sig_s, self.eta)
                s_ = -np.log(sd)
                x_2 = np.exp(-(s_ - t)) * x - np.expm1(t - s_) * denoised
                x_2 = x_2 + n1 * self.s_noise * su
                denoised_2 = den(x_2, sig_s, cfg_at(sig_s))

                sd, su = _ancestral_step(sigmas[i], sigmas[i + 1], self.eta)
                t_next_ = -np.log(sd)
                denoised_d = (1 - fac) * denoised + fac * denoised_2
                x = np.exp(-(t_next_ - t)) * x - np.expm1(t - t_next_) * denoised_d
                x = x + n2 * self.s_noise * su
            if gnudge is not None:
                x = x + gn
        return x

    def _solve_dpmpp_2m(self, den, x, sigmas, cfg_at, rng, gnudge=None):
        n = len(sigmas) - 1
        old_denoised = None
        for i in range(n):
            denoised = den(x, sigmas[i], cfg_at(sigmas[i]))
            if sigmas[i + 1] == 0:
                # sigma_fn(t_next)=0 collapses the update to x = denoised
                x = denoised
                if gnudge is not None:
                    x = x + gnudge(denoised, sigmas[i], sigmas[i + 1])
            else:
                t, t_next = -np.log(sigmas[i]), -np.log(sigmas[i + 1])
                h = t_next - t
                ratio = np.exp(-h)  # sigma_{i+1}/sigma_i
                if old_denoised is None:
                    x = ratio * x - np.expm1(-h) * denoised
                else:
                    h_last = t - (-np.log(sigmas[i - 1]))
                    r_ = h_last / h
                    denoised_d = (1 + 1 / (2 * r_)) * denoised - (1 / (2 * r_)) * old_denoised
                    x = ratio * x - np.expm1(-h) * denoised_d
                if gnudge is not None:
                    x = x + gnudge(denoised, sigmas[i], sigmas[i + 1])
            old_denoised = denoised
        return x

    def _solve_dpmpp_2m_sde(self, den, x, sigmas, cfg_at, rng,
                            solver_type="midpoint", gnudge=None,
                            noise_table=None):
        n = len(sigmas) - 1
        old_denoised, h_last = None, None
        for i in range(n):
            denoised = den(x, sigmas[i], cfg_at(sigmas[i]))
            if gnudge is not None:
                x_g = gnudge(denoised, sigmas[i], sigmas[i + 1])
            if sigmas[i + 1] == 0:
                x = denoised + (x_g if gnudge is not None else 0.0)
            else:
                t, s = -np.log(sigmas[i]), -np.log(sigmas[i + 1])
                h = s - t
                eta_h = self.eta * h
                x = (sigmas[i + 1] / sigmas[i]) * np.exp(-eta_h) * x + (
                    -np.expm1(-h - eta_h)
                ) * denoised
                if old_denoised is not None:
                    r_ = h_last / h
                    if solver_type == "heun":
                        coef = (-np.expm1(-h - eta_h)) / (-h - eta_h) + 1
                    else:
                        coef = 0.5 * (-np.expm1(-h - eta_h))
                    x = x + coef * (1 / r_) * (denoised - old_denoised)
                if self.eta:
                    if noise_table is not None:
                        z = noise_table[i]
                    else:
                        rng, k = jax.random.split(rng)
                        z = jax.random.normal(k, x.shape, x.dtype)
                    x = x + z * sigmas[i + 1] * np.sqrt(
                        -np.expm1(-2 * eta_h)
                    ) * self.s_noise
                if gnudge is not None:
                    x = x + x_g
                old_denoised, h_last = denoised, h
        return x

    def _solve_dpmpp_3m_sde(self, den, x, sigmas, cfg_at, rng, gnudge=None):
        """Unrolled fallback; sample() routes dpm++_3m_sde through
        _sample_3m_sde_scan (one lax.scan over host-precomputed coefficient
        tables), so this only runs if that dispatch is bypassed."""
        return self._solve_dpmpp_3m_sde_unrolled(den, x, sigmas, cfg_at, rng,
                                                 gnudge=gnudge)

    def _solve_dpmpp_3m_sde_unrolled(self, den, x, sigmas, cfg_at, rng,
                                     gnudge=None):
        n = len(sigmas) - 1
        d1_prev, d2_prev = None, None  # denoised_1, denoised_2
        h_1, h_2 = None, None
        for i in range(n):
            denoised = den(x, sigmas[i], cfg_at(sigmas[i]))
            if gnudge is not None:
                x_g = gnudge(denoised, sigmas[i], sigmas[i + 1])
            if sigmas[i + 1] == 0:
                x = denoised + (x_g if gnudge is not None else 0.0)
            else:
                t, s = -np.log(sigmas[i]), -np.log(sigmas[i + 1])
                h = s - t
                h_eta = h * (self.eta + 1)
                x = np.exp(-h_eta) * x + (-np.expm1(-h_eta)) * denoised
                if h_2 is not None:
                    r0, r1 = h_1 / h, h_2 / h
                    d1_0 = (denoised - d1_prev) / r0
                    d1_1 = (d1_prev - d2_prev) / r1
                    d1 = d1_0 + (d1_0 - d1_1) * r0 / (r0 + r1)
                    d2 = (d1_0 - d1_1) / (r0 + r1)
                    phi_2 = np.expm1(-h_eta) / h_eta + 1
                    phi_3 = phi_2 / h_eta - 0.5
                    x = x + phi_2 * d1 - phi_3 * d2
                elif h_1 is not None:
                    r_ = h_1 / h
                    d = (denoised - d1_prev) / r_
                    phi_2 = np.expm1(-h_eta) / h_eta + 1
                    x = x + phi_2 * d
                if self.eta:
                    rng, k = jax.random.split(rng)
                    x = x + jax.random.normal(k, x.shape, x.dtype) * sigmas[i + 1] * np.sqrt(
                        -np.expm1(-2 * h * self.eta)
                    ) * self.s_noise
                if gnudge is not None:
                    x = x + x_g
                d1_prev, d2_prev = denoised, d1_prev
                h_1, h_2 = h, h_1
        return x
