"""Two-stage restoration pipeline: cleaner -> ControlLDM -> color fix.

Behavioral parity target: /root/reference/diffbir/pipeline.py:25-421
(Pipeline.run / apply_cldm / cleaner variants). Orchestration differences by
design:
- the whole stage-2 path (condition encode -> sampler scan -> VAE decode) is
  ONE jitted function; the sampler's denoise loop is a ``lax.scan``;
- prompts are tokenized on host; models only see token ids;
- tiling enters as pure wrapper transforms (tiling.py), not monkey-patching;
- randomness is an explicit ``jax.random`` key.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .models.cldm import ControlLDM
from .sampler import DDIMSampler, SpacedSampler
from .schedule import Schedule
from .tiling import make_tiled_fn
from .utils.common import (
    bicubic_resize,
    pad_to_multiples_of,
    resize_short_edge_to,
    wavelet_reconstruction,
)


def build_sampler(
    sampler_type: str, schedule: Schedule, rescale_cfg: bool,
    eta: float = 0.0, s_churn: float = 0.0, s_tmin: float = 0.0,
    s_tmax: float = 300.0, s_noise: float = 1.0, order: int = 1,
):
    """Sampler factory mirroring pipeline.py:179-201 dispatch."""
    betas = schedule.betas
    param = schedule.parameterization
    if sampler_type == "spaced":
        return SpacedSampler(betas, param, rescale_cfg)
    if sampler_type == "ddim":
        # eta=0 is DELIBERATE reference parity (reference pipeline.py:182
        # hardcodes it; --eta only parameterizes the edm_* family). Stochastic
        # DDIM is available via the DDIMSampler API directly.
        return DDIMSampler(betas, param, rescale_cfg, eta=0.0)
    if sampler_type.startswith("dpm"):
        from .sampler.dpms import DPMSolverSampler

        return DPMSolverSampler(betas, param, rescale_cfg, sampler_type)
    if sampler_type.startswith("edm"):
        from .sampler.edm import EDMSampler

        return EDMSampler(
            betas, param, rescale_cfg, sampler_type,
            s_churn=s_churn, s_tmin=s_tmin, s_tmax=s_tmax, s_noise=s_noise,
            eta=eta, order=order,
        )
    raise NotImplementedError(sampler_type)


class Pipeline:
    """Base pipeline; subclasses override ``apply_cleaner``."""

    def __init__(
        self,
        cleaner_apply: Optional[Callable[[jax.Array], jax.Array]],
        cldm: ControlLDM,
        params,
        schedule: Schedule,
        tokenizer=None,
        cond_fn=None,
        min_cond_size: int = 512,
    ):
        self.cleaner_apply = cleaner_apply  # jittable: [0,1] NHWC -> [0,1] NHWC
        self.cldm = cldm
        self.params = params
        self.schedule = schedule
        self.tokenizer = tokenizer
        self.cond_fn = cond_fn
        self.min_cond_size = min_cond_size
        self.output_size: Tuple[int, int] = None
        self._generate_cache: Dict = {}

    # ------------------------------------------------------------------ #
    def set_output_size(self, lq_hw: Tuple[int, int]) -> None:
        self.output_size = lq_hw

    def apply_cleaner(self, lq, tiled=False, tile_size=512, tile_stride=256):
        raise NotImplementedError

    def tokenize(self, prompt: str, bs: int) -> np.ndarray:
        if self.tokenizer is None:
            # untokenized fallback: empty prompt ids (SOT, EOT, pad)
            t = np.zeros((bs, self.cldm.clip.context_length), np.int32)
            t[:, 0] = 49406
            t[:, 1] = 49407
            return t
        return np.repeat(self.tokenizer([prompt]), bs, axis=0)

    # ------------------------------------------------------------------ #
    def _generate_fn(self, key):
        """Build (and cache) the jitted stage-2 program for a static config."""
        (steps, strength, cfg_scale, start_point_type, sampler_type, noise_aug,
         rescale_cfg, eta, s_churn, s_tmin, s_tmax, s_noise, order,
         h_img, w_img, bs,
         vae_enc_tiled, vae_enc_tile, vae_dec_tiled, vae_dec_tile,
         vae_tile_mode, cldm_tiled, cldm_tile, cldm_stride,
         cldm_tiles_per_batch, control_interval, turbo_encoder,
         _guidance_fp, n_seg) = key
        # scan-invariant hoisting (exact math; see base_model_fn below).
        # Read at build time and folded into the cache key so an in-process
        # env flip (bench A/B) can't serve a stale program.
        # Disabled only for the tiled path: make_tiled_fn re-batches the
        # context per tile group ([2B*k, 77, 1024], k varies on remainder
        # groups) so a single precomputed kv doesn't match the call batch.
        hoist = (
            os.environ.get("DIFFBIR_TPU_HOIST", "1") == "1"
            and not cldm_tiled
        )
        key = key + (hoist,)
        if key in self._generate_cache:
            return self._generate_cache[key]

        sampler = build_sampler(
            sampler_type, self.schedule, rescale_cfg, eta=eta, s_churn=s_churn,
            s_tmin=s_tmin, s_tmax=s_tmax, s_noise=s_noise, order=order,
        )
        cldm, schedule = self.cldm, self.schedule
        use_cfg = cfg_scale != 1.0
        cond_fn = self.cond_fn
        if cond_fn is not None and not (
            sampler_type in ("spaced", "ddim") or sampler_type.startswith("edm")
        ):
            raise ValueError(
                f"restoration guidance is not supported with sampler "
                f"{sampler_type!r}; use spaced, ddim, or an edm_* sampler"
            )

        # sync_gn VAE tiling supports batch 1 only; fall back to blend else
        # (applies to BOTH the tiled encoder and the tiled decoder)
        eff_tile_mode = vae_tile_mode if bs == 1 else "blend"
        enc_tile_mode = eff_tile_mode

        if n_seg > 1:
            fn = self._chunked_generate_fn(
                sampler, steps, strength, cfg_scale, start_point_type,
                noise_aug, use_cfg, cond_fn, hoist, n_seg,
                vae_enc_tiled, vae_enc_tile, enc_tile_mode,
                vae_dec_tiled, vae_dec_tile, eff_tile_mode, bs,
            )
            self._generate_cache[key] = fn
            return fn

        def generate(params, cond_img, pos_tok, neg_tok, rng):
            h1, w1 = cond_img.shape[1] // 8, cond_img.shape[2] // 8
            cond = cldm.prepare_condition(
                params, cond_img, pos_tok, tiled=vae_enc_tiled,
                tile_size=vae_enc_tile, tile_mode=enc_tile_mode,
            )
            uncond = (
                cldm.prepare_condition(
                    params, cond_img, neg_tok, tiled=vae_enc_tiled,
                    tile_size=vae_enc_tile, tile_mode=enc_tile_mode,
                )
                if use_cfg
                else None
            )
            if not cldm_tiled:
                # Untiled UNet needs latent dims divisible by 8 (3 downsamples);
                # pad the latent and crop z back afterwards (reference
                # pipeline.py:136-139, :218). No-op when cond_img was padded
                # to x64 already.
                cond = {**cond, "c_img": pad_to_multiples_of(cond["c_img"], 8)}
                if uncond is not None:
                    uncond = {
                        **uncond, "c_img": pad_to_multiples_of(uncond["c_img"], 8)
                    }
            h2, w2 = cond["c_img"].shape[1:3]
            clean_c_img = cond["c_img"]  # guidance target: BEFORE noise aug
            rng, k_start, k_aug, k_sample = jax.random.split(rng, 4)
            if start_point_type == "cond":
                x_0 = cond["c_img"]
                t_last = jnp.full((bs,), schedule.num_timesteps - 1, jnp.int32)
                x_T = schedule.q_sample(
                    x_0, t_last, jax.random.normal(k_start, x_0.shape, jnp.float32)
                )
            else:
                x_T = jax.random.normal(k_start, (bs, h2, w2, 4), jnp.float32)
            if noise_aug > 0:
                t_aug = jnp.full((bs,), noise_aug, jnp.int32)
                c_img = schedule.q_sample(
                    cond["c_img"], t_aug,
                    jax.random.normal(k_aug, cond["c_img"].shape, jnp.float32),
                )
                cond = {**cond, "c_img": c_img}
                if uncond is not None:
                    uncond = {**uncond, "c_img": c_img}

            # Hoist denoise-scan invariants (exact math): cross-attn context
            # k/v once per prompt; per-step temb projections for the whole
            # t-grid when the sampler publishes it. XLA's loop LICM does
            # not do either (dots stay in the while body — verified HLO).
            # DIFFBIR_TPU_HOIST=0 restores in-loop recompute for A/B.
            hoist_lookup = None
            if hoist:
                ctx_full = (
                    cond["c_txt"] if uncond is None
                    else jnp.concatenate([cond["c_txt"], uncond["c_txt"]], axis=0)
                )
                hoist_lookup = cldm.make_hoist_lookup(
                    params, ctx_full, sampler.model_ts(steps)
                )

                def base_model_fn(x, t, c):
                    return cldm(
                        params, x, t, c, control_scales=strength,
                        hoisted=hoist_lookup(t),
                    )
            else:
                def base_model_fn(x, t, c):
                    return cldm(params, x, t, c, control_scales=strength)

            if control_interval > 1 and cldm_tiled:
                raise ValueError(
                    "control_interval > 1 (turbo) is not supported with "
                    "cldm_tiled — the per-tile ControlNet calls cannot share "
                    "one residual cache; drop one of the two flags"
                )
            if control_interval > 1 and not cldm_tiled:
                # turbo: recompute ControlNet residuals every k-th step only
                turbo_ok = ("spaced", "ddim", "edm_dpm++_3m_sde",
                            "edm_dpm++_2m_sde", "edm_euler_a")
                if sampler_type not in turbo_ok:
                    raise ValueError(
                        "control_interval > 1 requires a stateful-scan sampler "
                        f"(one of {', '.join(turbo_ok)})"
                    )
                # cache shapes must match the (possibly x8-padded) latent the
                # sampler actually runs on, not the pre-pad (h1, w1)
                model_fn = cldm.make_cached_control_model(
                    params, strength, control_interval, (h2, w2),
                    call_batch=bs * (2 if use_cfg else 1),
                    cache_unet_encoder=turbo_encoder,
                    hoist_lookup=hoist_lookup,
                )
            elif cldm_tiled:
                # per-step latent tiling with the hint sliced in sync
                # (reference spaced_sampler.py:204-219 via monkey-patching)
                lat_ts, lat_st = cldm_tile // 8, cldm_stride // 8

                def model_tile(x_tiles, t, c, tile_coords=()):
                    k = len(tile_coords)
                    b = x_tiles.shape[0] // k
                    c_img_full = c["c_img"]
                    c_sl = jnp.concatenate(
                        [
                            c_img_full[:, hi: hi + lat_ts, wi: wi + lat_ts, :]
                            for hi, wi in tile_coords
                        ],
                        axis=0,
                    )
                    c_txt = jnp.concatenate([c["c_txt"]] * k, axis=0)
                    t_k = jnp.concatenate([t] * k, axis=0)
                    return base_model_fn(
                        x_tiles, t_k, {"c_txt": c_txt, "c_img": c_sl}
                    )

                model_tile.tile_kwargs = ("tile_coords",)
                tiled_call = make_tiled_fn(
                    model_tile, lat_ts, lat_st, channel=4,
                    tiles_per_batch=cldm_tiles_per_batch,
                )

                def model_fn(x, t, c):
                    return tiled_call(x, t, c)
            else:
                model_fn = base_model_fn

            extra = {}
            if cond_fn is not None:
                if getattr(cond_fn, "space", "latent") == "rgb":
                    # rgb-space guidance: decode pred_x0 inside the grad
                    # (reference cond_fn.py:20-45 loads cond_img*2-1)
                    from .utils.cond_fn import RGBSpaceGuidance

                    g_target = cond_img * 2.0 - 1.0
                    guide = RGBSpaceGuidance(
                        cond_fn, lambda z: cldm.vae_decode(params, z)
                    )
                else:
                    g_target = clean_c_img  # latent-space target (pre-aug)
                    guide = cond_fn
                extra = dict(cond_fn=guide, guidance_target=g_target)
            z = sampler.sample(
                model_fn, x_T, cond, uncond, cfg_scale, steps, k_sample, **extra
            )
            z = z[:, :h1, :w1, :]  # drop UNet latent padding before decode
            x = cldm.vae_decode(
                params, z, tiled=vae_dec_tiled, tile_size=vae_dec_tile // 8,
                tile_mode=eff_tile_mode,
            )
            return x

        fn = jax.jit(generate)
        self._generate_cache[key] = fn
        return fn

    # ------------------------------------------------------------------ #
    def _chunked_generate_fn(
        self, sampler, steps, strength, cfg_scale, start_point_type,
        noise_aug, use_cfg, cond_fn, hoist, n_seg,
        vae_enc_tiled, vae_enc_tile, enc_tile_mode,
        vae_dec_tiled, vae_dec_tile, eff_tile_mode, bs,
    ):
        """The stage-2 program split into prep / n_seg scan segments /
        decode dispatches with host syncs between — same math as
        ``generate`` (same ops in the same order, rng chain threaded
        through the carry), but no single dispatch runs long enough to
        trip the axon worker's execution watchdog (~100 s; bisected in
        scripts/repro_monster.py, r5). Spaced, DDIM and the EDM scan
        solvers (each exposes make_tables/init_carry/scan_tables)."""
        cldm, schedule = self.cldm, self.schedule

        def prep(params, cond_img, pos_tok, neg_tok, rng):
            h1, w1 = cond_img.shape[1] // 8, cond_img.shape[2] // 8
            cond = cldm.prepare_condition(
                params, cond_img, pos_tok, tiled=vae_enc_tiled,
                tile_size=vae_enc_tile, tile_mode=enc_tile_mode,
            )
            uncond = (
                cldm.prepare_condition(
                    params, cond_img, neg_tok, tiled=vae_enc_tiled,
                    tile_size=vae_enc_tile, tile_mode=enc_tile_mode,
                )
                if use_cfg
                else None
            )
            cond = {**cond, "c_img": pad_to_multiples_of(cond["c_img"], 8)}
            if uncond is not None:
                uncond = {
                    **uncond, "c_img": pad_to_multiples_of(uncond["c_img"], 8)
                }
            h2, w2 = cond["c_img"].shape[1:3]
            clean_c_img = cond["c_img"]
            rng, k_start, k_aug, k_sample = jax.random.split(rng, 4)
            if start_point_type == "cond":
                x_0 = cond["c_img"]
                t_last = jnp.full((bs,), schedule.num_timesteps - 1, jnp.int32)
                x_T = schedule.q_sample(
                    x_0, t_last,
                    jax.random.normal(k_start, x_0.shape, jnp.float32),
                )
            else:
                x_T = jax.random.normal(k_start, (bs, h2, w2, 4), jnp.float32)
            if noise_aug > 0:
                t_aug = jnp.full((bs,), noise_aug, jnp.int32)
                c_img = schedule.q_sample(
                    cond["c_img"], t_aug,
                    jax.random.normal(k_aug, cond["c_img"].shape, jnp.float32),
                )
                cond = {**cond, "c_img": c_img}
                if uncond is not None:
                    uncond = {**uncond, "c_img": c_img}
            hoist_tables = None
            if hoist:
                ctx_full = (
                    cond["c_txt"] if uncond is None
                    else jnp.concatenate(
                        [cond["c_txt"], uncond["c_txt"]], axis=0
                    )
                )
                hoist_tables = cldm.make_hoist_tables(
                    params, ctx_full, sampler.model_ts(steps)
                )
            g_target = None
            if cond_fn is not None:
                g_target = (
                    cond_img * 2.0 - 1.0
                    if getattr(cond_fn, "space", "latent") == "rgb"
                    else clean_c_img
                )
            return cond, uncond, x_T, k_sample, hoist_tables, g_target

        def segment(params, carry, tables, cond, uncond, hoist_tables,
                    g_target):
            if hoist_tables is not None:
                lookup = cldm.hoist_lookup_from(hoist_tables)

                def model_fn(x, t, c):
                    return cldm(params, x, t, c, control_scales=strength,
                                hoisted=lookup(t))
            else:
                def model_fn(x, t, c):
                    return cldm(params, x, t, c, control_scales=strength)

            guide = None
            if cond_fn is not None:
                if getattr(cond_fn, "space", "latent") == "rgb":
                    from .utils.cond_fn import RGBSpaceGuidance

                    guide = RGBSpaceGuidance(
                        cond_fn, lambda z: cldm.vae_decode(params, z)
                    )
                else:
                    guide = cond_fn
            return sampler.scan_tables(
                model_fn, carry, tables, cond, uncond,
                cond_fn=guide, guidance_target=g_target,
            )

        def decode(params, z, h1, w1):
            z = z[:, :h1, :w1, :]
            return cldm.vae_decode(
                params, z, tiled=vae_dec_tiled, tile_size=vae_dec_tile // 8,
                tile_mode=eff_tile_mode,
            )

        prep_j = jax.jit(prep)
        seg_j = jax.jit(segment)
        dec_j = jax.jit(decode, static_argnums=(2, 3))
        tables_np = sampler.make_tables(steps, cfg_scale, cond_fn)
        base, rem = divmod(steps, n_seg)
        sizes = [base + 1] * rem + [base] * (n_seg - rem)

        def run(params, cond_img, pos_tok, neg_tok, rng):
            h1, w1 = cond_img.shape[1] // 8, cond_img.shape[2] // 8
            cond, uncond, x_T, k_sample, htab, g_target = prep_j(
                params, cond_img, pos_tok, neg_tok, rng
            )
            jax.block_until_ready(x_T)
            carry = sampler.init_carry(x_T, k_sample, steps)
            lo = 0
            for sz in sizes:
                tbl = {
                    k: jnp.asarray(v[lo:lo + sz])
                    for k, v in tables_np.items()
                }
                carry = seg_j(
                    params, carry, tbl, cond, uncond, htab, g_target
                )
                jax.block_until_ready(carry[0])
                lo += sz
            return dec_j(params, carry[0], h1, w1)

        return run

    # ------------------------------------------------------------------ #
    def apply_cldm(
        self,
        cond_img: jax.Array,
        steps: int,
        strength: float,
        pos_prompt: str,
        neg_prompt: str,
        cfg_scale: float,
        start_point_type: str = "noise",
        sampler_type: str = "spaced",
        noise_aug: int = 0,
        rescale_cfg: bool = False,
        rng: Optional[jax.Array] = None,
        eta: float = 0.0,
        s_churn: float = 0.0,
        s_tmin: float = 0.0,
        s_tmax: float = 300.0,
        s_noise: float = 1.0,
        order: int = 1,
        vae_encoder_tiled: bool = False,
        vae_encoder_tile_size: int = 256,
        vae_decoder_tiled: bool = False,
        vae_decoder_tile_size: int = 256,
        vae_tile_mode: str = "blend",
        cldm_tiled: bool = False,
        cldm_tile_size: int = 512,
        cldm_tile_stride: int = 256,
        cldm_tiles_per_batch: int = 1,
        control_interval: int = 1,
        turbo_encoder: bool = False,
    ) -> jax.Array:
        """Stage-2 generation on a [0,1] NHWC condition image.

        Size/tile policy mirrors reference pipeline.py:97-143: pad to x64
        untiled / x8 tiled; tiles must be size-multiples of 8 (VAE) and 64
        (diffusion); tiny inputs silently disable tiling.
        """
        bs, h0, w0, _ = cond_img.shape
        # pad by the REQUESTED tiling mode, then decide the tiny-input
        # tiling disable on the PADDED dims (reference pipeline.py:100-117
        # order; deciding first changed the pad multiple for inputs within
        # 8px below the tile size, e.g. 504^2 at tile 512)
        if not vae_encoder_tiled and not cldm_tiled:
            cond_img = pad_to_multiples_of(cond_img, 64)
        else:
            cond_img = pad_to_multiples_of(cond_img, 8)
        if vae_encoder_tiled and min(cond_img.shape[1:3]) < vae_encoder_tile_size:
            vae_encoder_tiled = False
        if vae_encoder_tiled and vae_encoder_tile_size % 8 != 0:
            raise ValueError("VAE encoder tile size must be a multiple of 8")
        h1, w1 = cond_img.shape[1] // 8, cond_img.shape[2] // 8
        # Dispatch-duration envelope: single XLA dispatches past ~100 s
        # deterministically kill the axon TPU worker (r4b + r5 fidelity
        # dry-runs at the 81920-token bucket; bisect in
        # scripts/repro_monster.py — the 10-step scan passes, the 50-step
        # one crashes, every component shape passes in isolation per
        # STRESS_FLASH.json). Largest PROVEN single scan is 36864 tokens x
        # 50 steps (~50 s); above that budget, split the denoise into
        # several bounded dispatches with the carry threaded through on
        # host — EXACT math (same ops, same order, same rng chain), unlike
        # the tiling fallback. Spaced, DDIM and the EDM scan solvers
        # (3m_sde/2m_sde/euler_a — the CLI default family). 0 disables.
        budget = int(
            os.environ.get("DIFFBIR_TPU_DISPATCH_TOKEN_STEPS", str(36864 * 50))
        )
        n_seg = 1
        chunkable = ("spaced", "ddim", "edm_dpm++_3m_sde",
                     "edm_dpm++_2m_sde", "edm_euler_a")
        if (budget > 0 and sampler_type in chunkable
                and not cldm_tiled
                and control_interval == 1 and h1 * w1 * steps > budget):
            max_chunk = max(1, budget // (h1 * w1))
            n_min = -(-steps // max_chunk)
            # prefer an even split (one compiled segment length); a prime
            # step count pays a second specialization for the short tail
            n_seg = next(
                (n for n in range(n_min, steps + 1) if steps % n == 0),
                n_min,
            )
            print(f"[pipeline] {h1 * w1} latent tokens x {steps} steps > "
                  f"{budget} token-step dispatch budget: splitting the "
                  f"denoise into {n_seg} dispatches", flush=True)
        # Serving envelope cap (samplers without a chunked driver): fall
        # back to per-step latent tiling — the measured, memory-bounded
        # path (scripts/bench_highres.py). 0 disables.
        max_tok = int(os.environ.get("DIFFBIR_TPU_MAX_COND_TOKENS", "40960"))
        if (max_tok > 0 and not cldm_tiled and n_seg == 1
                and control_interval == 1 and h1 * w1 > max_tok
                and h1 >= cldm_tile_size // 8 and w1 >= cldm_tile_size // 8):
            print(f"[pipeline] {h1 * w1} latent tokens > cap {max_tok}: "
                  f"auto-tiling the diffusion (tile {cldm_tile_size} "
                  f"stride {cldm_tile_stride})", flush=True)
            cldm_tiled = True
        if cldm_tiled and (h1 < cldm_tile_size // 8 or w1 < cldm_tile_size // 8):
            cldm_tiled = False
        if cldm_tiled and cldm_tile_size % 64 != 0:
            raise ValueError("Diffusion tile size must be a multiple of 64")
        if vae_decoder_tiled and min(h1, w1) < vae_decoder_tile_size // 8:
            vae_decoder_tiled = False
        pos_tok = jnp.asarray(self.tokenize(pos_prompt, bs))
        neg_tok = jnp.asarray(self.tokenize(neg_prompt, bs))
        if rng is None:
            rng = jax.random.PRNGKey(0)
        key = (
            steps, float(strength), float(cfg_scale), start_point_type,
            sampler_type, int(noise_aug), bool(rescale_cfg), float(eta),
            float(s_churn), float(s_tmin), float(s_tmax), float(s_noise),
            int(order), cond_img.shape[1], cond_img.shape[2], bs,
            bool(vae_encoder_tiled), int(vae_encoder_tile_size),
            bool(vae_decoder_tiled), int(vae_decoder_tile_size),
            str(vae_tile_mode),
            bool(cldm_tiled), int(cldm_tile_size), int(cldm_tile_stride),
            int(cldm_tiles_per_batch),
            int(control_interval), bool(turbo_encoder),
            # guidance config is baked into the compiled program: key on it
            # so swapping self.cond_fn (e.g. per demo request) recompiles
            None if self.cond_fn is None else (
                type(self.cond_fn).__name__, float(self.cond_fn.scale),
                int(self.cond_fn.t_start), int(self.cond_fn.t_stop),
                str(getattr(self.cond_fn, "space", "latent")),
                int(self.cond_fn.repeat),
            ),
            int(n_seg),
        )
        fn = self._generate_fn(key)
        x = fn(self.params, cond_img, pos_tok, neg_tok, rng)
        return x[:, :h0, :w0, :]

    # ------------------------------------------------------------------ #
    def run(
        self,
        lq: np.ndarray,
        steps: int = 50,
        strength: float = 1.0,
        pos_prompt: str = "",
        neg_prompt: str = "low quality, blurry, low-resolution, noisy, unsharp, weird textures",
        cfg_scale: float = 4.0,
        start_point_type: str = "noise",
        sampler_type: str = "spaced",
        noise_aug: int = 0,
        rescale_cfg: bool = False,
        cleaner_tiled: bool = False,
        cleaner_tile_size: int = 512,
        cleaner_tile_stride: int = 256,
        seed: int = 231,
        size_bucket: int = 0,
        **sampler_kwargs,
    ) -> np.ndarray:
        """lq: uint8 [B,H,W,3] -> restored uint8 [B,*output_size,3].

        ``size_bucket`` > 0 bounds the number of distinct compiled programs
        when serving arbitrary resolutions (static-shape bucketing, SURVEY.md
        §7 hard part 6). The bucket is applied to the CONDITION image (the
        stage-2 input, where compile cost lives), padding it up to multiples
        of that many pixels; the LQ itself is only padded to x64 to dedupe
        cleaner programs. Bucketing the LQ instead would multiply the pad by
        the cleaner's upscale — a 512-bucketed LQ under the x4 BSRNet becomes
        a >=2048px condition, 16x the diffusion cost and an 82k-token VAE
        attention (the first on-chip fidelity dry-run OOM'd exactly there,
        TPU_RUNBOOK_r4b.json). Output is still cropped to the exact size.
        """
        lq = np.asarray(lq)
        orig_hw = lq.shape[1:3]
        if size_bucket:
            _, h, w, _ = lq.shape
            ph, pw = (-h) % 64, (-w) % 64
            if ph or pw:
                lq = np.pad(lq, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        lq_t = jnp.clip(jnp.asarray(lq, jnp.float32) / 255.0, 0.0, 1.0)
        self.set_output_size(lq_t.shape[1:3])
        cond_img = self.apply_cleaner(
            lq_t, cleaner_tiled, cleaner_tile_size, cleaner_tile_stride
        )
        assert all(s >= self.min_cond_size for s in cond_img.shape[1:3]), (
            "stage-1 output must be >= 512 (condition for stage-2)"
        )
        ch, cw = cond_img.shape[1:3]
        if size_bucket:
            pch, pcw = (-ch) % size_bucket, (-cw) % size_bucket
            if pch or pcw:
                # reflect needs pad < dim (cond >= 512 so any bucket <= 512
                # qualifies); fall back to edge replication for huge buckets
                mode = "reflect" if (pch < ch and pcw < cw) else "edge"
                cond_img = jnp.pad(
                    cond_img, ((0, 0), (0, pch), (0, pcw), (0, 0)), mode=mode
                )
        sample = self.apply_cldm(
            cond_img, steps, strength, pos_prompt, neg_prompt, cfg_scale,
            start_point_type, sampler_type, noise_aug, rescale_cfg,
            rng=jax.random.PRNGKey(seed), **sampler_kwargs,
        )
        if size_bucket and (ch, cw) != tuple(sample.shape[1:3]):
            sample = sample[:, :ch, :cw]
            cond_img = cond_img[:, :ch, :cw]
        sample = wavelet_reconstruction((sample + 1) / 2, cond_img)
        sample = bicubic_resize(sample, self.output_size)
        out = np.asarray(jnp.clip(sample * 255.0, 0, 255).astype(jnp.uint8))
        if size_bucket and orig_hw != tuple(lq.shape[1:3]):
            oh = round(orig_hw[0] * self.output_size[0] / lq.shape[1])
            ow = round(orig_hw[1] * self.output_size[1] / lq.shape[2])
            out = out[:, :oh, :ow]
        return out


class IdentityCleanerPipeline(Pipeline):
    """Bicubic-only stage-1 stub (minimum e2e slice; also useful for tests)."""

    def apply_cleaner(self, lq, tiled=False, tile_size=512, tile_stride=256):
        if min(lq.shape[1:3]) < self.min_cond_size:
            lq = resize_short_edge_to(lq, self.min_cond_size)
        return lq


class SwinIRPipeline(Pipeline):
    """x1 cleaner on a pre-upscaled input (pipeline.py:369-397)."""

    def apply_cleaner(self, lq, tiled=False, tile_size=512, tile_stride=256):
        if tiled and min(lq.shape[1:3]) < tile_size:
            tiled = False
        if not tiled:
            if min(lq.shape[1:3]) < self.min_cond_size:
                lq = resize_short_edge_to(lq, self.min_cond_size)
            h0, w0 = lq.shape[1:3]
            lq = pad_to_multiples_of(lq, 64)
            out = self.cleaner_apply(lq)[:, :h0, :w0, :]
        else:
            if tile_size % 64 != 0:
                raise ValueError("SwinIR tile size must be a multiple of 64")
            out = make_tiled_fn(self.cleaner_apply, tile_size, tile_stride)(lq)
            if min(out.shape[1:3]) < self.min_cond_size:
                out = resize_short_edge_to(out, self.min_cond_size)
        return out


class BSRNetPipeline(Pipeline):
    """x4 SR cleaner; output resized to lq*upscale (pipeline.py:324-366)."""

    def __init__(self, *args, upscale: float = 4.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.upscale = upscale

    def set_output_size(self, lq_hw):
        self.output_size = (
            int(lq_hw[0] * self.upscale), int(lq_hw[1] * self.upscale)
        )

    def apply_cleaner(self, lq, tiled=False, tile_size=512, tile_stride=256):
        if tiled and min(lq.shape[1:3]) < tile_size:
            tiled = False
        fn = self.cleaner_apply
        if tiled:
            fn = make_tiled_fn(fn, tile_size, tile_stride, scale_type="up", scale=4)
        out = fn(lq)
        if min(self.output_size) < self.min_cond_size:
            out = resize_short_edge_to(out, self.min_cond_size)
        else:
            out = bicubic_resize(out, self.output_size)
        return out


class SCUNetPipeline(Pipeline):
    """x1 denoise cleaner (pipeline.py:400-420)."""

    def apply_cleaner(self, lq, tiled=False, tile_size=512, tile_stride=256):
        if tiled and min(lq.shape[1:3]) < tile_size:
            tiled = False
        fn = self.cleaner_apply
        if tiled:
            fn = make_tiled_fn(fn, tile_size, tile_stride)
        out = fn(lq)
        if min(out.shape[1:3]) < self.min_cond_size:
            out = resize_short_edge_to(out, self.min_cond_size)
        return out
