"""ControlLDM: the stage-2 generation module {UNet, VAE, CLIP, ControlNet}.

Behavioral parity target: /root/reference/diffbir/model/cldm.py:20-210.
Differences by design (functional JAX):
- parameters live in an explicit pytree ``{"unet","vae","clip","controlnet"}``
  instead of module state; all methods are pure and jittable.
- SD-checkpoint surgery (module_map prefixes), controlnet-from-unet zero-pad
  init, and fp16-cast policy are reproduced as param-tree transforms.
- mixed precision is a construction-time dtype on the flax modules (GroupNorm
  stays fp32 inside, see layers.GroupNorm32) rather than a mutating cast.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..weights import convert
from .clip import CLIPTextEncoder
from .unet import ControlNet, UNetModel
from .vae import AutoencoderKL

Params = Any


@dataclasses.dataclass(frozen=True)
class ControlLDM:
    unet: UNetModel
    vae: AutoencoderKL
    clip: CLIPTextEncoder
    controlnet: ControlNet
    scale_factor: float = 0.18215

    # ------------------------------------------------------------------ #
    @classmethod
    def sd21(cls, dtype=jnp.bfloat16, use_checkpoint: bool = False,
             quant_dense: bool = False,
             fused_resblock: bool = False,
             quant_conv: bool = False) -> "ControlLDM":
        """Standard SD2.1-base + IRControlNet sizes (configs/inference/cldm.yaml).

        ``quant_dense``: int8 weight-only serving mode for the UNet/ControlNet
        dense sites — pair with ``quantize_dense_params`` on a float tree.
        ``fused_resblock``: Pallas fused-ResBlock serving mode (same param
        tree; differentiable via custom VJP, see ops/fused_resblock.py).
        ``quant_conv``: int8 ResBlock conv weights INSIDE the fused kernel
        (requires fused_resblock) — pair with ``quantize_conv_params``."""
        return cls(
            unet=UNetModel(dtype=dtype, use_checkpoint=use_checkpoint,
                           quant_dense=quant_dense,
                           fused_resblock=fused_resblock,
                           quant_conv=quant_conv),
            vae=AutoencoderKL(dtype=dtype),
            clip=CLIPTextEncoder(dtype=dtype),
            controlnet=ControlNet(dtype=dtype, use_checkpoint=use_checkpoint,
                                  quant_dense=quant_dense,
                                  fused_resblock=fused_resblock,
                                  quant_conv=quant_conv),
        )

    @classmethod
    def tiny(cls, dtype=jnp.float32, quant_dense: bool = False,
             fused_resblock: bool = False,
             quant_conv: bool = False) -> "ControlLDM":
        """Small CPU-runnable config for tests (still a true f8 VAE)."""
        kw = dict(
            model_channels=32, num_head_channels=16, channel_mult=(1, 2),
            attention_resolutions=(2, 1), context_dim=64, dtype=dtype,
            quant_dense=quant_dense, fused_resblock=fused_resblock,
            quant_conv=quant_conv,
        )
        return cls(
            unet=UNetModel(**kw),
            vae=AutoencoderKL(ch=32, ch_mult=(1, 1, 1, 1), num_res_blocks=1, dtype=dtype),
            clip=CLIPTextEncoder(width=64, heads=4, layers=3, dtype=dtype),
            controlnet=ControlNet(hint_channels=4, **kw),
        )

    # ------------------------------------------------------------------ #
    def init_params(self, rng: jax.Array, latent_hw: Tuple[int, int] = (8, 8)) -> Params:
        """Random-init full param tree (shapes only driven by configs)."""
        h, w = latent_hw
        ph, pw = h * 8, w * 8
        x = jnp.zeros((1, h, w, 4))
        t = jnp.zeros((1,))
        ctx = jnp.zeros((1, self.clip.context_length, self.clip.width))
        toks = jnp.zeros((1, self.clip.context_length), jnp.int32)
        img = jnp.zeros((1, ph, pw, 3))
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        return {
            "unet": self.unet.init(k1, x, t, ctx),
            "vae": self.vae.init(k2, img),
            "clip": self.clip.init(k3, toks),
            "controlnet": self.controlnet.init(k4, x, x, t, ctx),
        }

    def eval_shapes(self, latent_hw: Tuple[int, int] = (8, 8)) -> Params:
        return jax.eval_shape(
            lambda k: self.init_params(k, latent_hw), jax.random.PRNGKey(0)
        )

    # ------------------------------------------------------------------ #
    # forward paths (pure)
    # ------------------------------------------------------------------ #
    def __call__(
        self,
        params: Params,
        x_noisy: jax.Array,
        t: jax.Array,
        cond: Mapping[str, jax.Array],
        control_scales: Any = 1.0,
        hoisted: Optional[Mapping[str, Any]] = None,
    ) -> jax.Array:
        """ControlNet -> scaled residuals -> controlled UNet (cldm.py:160-172).

        ``hoisted``: optional {"unet": tree, "controlnet": tree} of
        loop-invariant values precomputed OUTSIDE the denoise scan
        (cross-attention context k/v, per-step temb projections — see
        hoist_context_kv / hoist_emb_tables). Exact math, fewer HBM reads
        per step."""
        cn_vars = params["controlnet"]
        unet_vars = params["unet"]
        if hoisted is not None:
            if hoisted.get("controlnet"):
                cn_vars = {**cn_vars, "hoisted": hoisted["controlnet"]}
            if hoisted.get("unet"):
                unet_vars = {**unet_vars, "hoisted": hoisted["unet"]}
        control = self.controlnet.apply(
            cn_vars, x_noisy, cond["c_img"], t, cond["c_txt"]
        )
        if isinstance(control_scales, (int, float)):
            control_scales = (float(control_scales),) * len(control)
        control = tuple(c * s for c, s in zip(control, control_scales))
        return self.unet.apply(
            unet_vars, x_noisy, t, cond["c_txt"], control=control
        )

    def vae_encode(
        self,
        params: Params,
        image: jax.Array,
        sample: bool = True,
        rng: Optional[jax.Array] = None,
        tiled: bool = False,
        tile_size: int = 256,
        tile_mode: str = "blend",
        tiles_per_chunk: int = 8,
    ) -> jax.Array:
        """image in [-1,1] NHWC -> scaled latent (cldm.py:92-119).

        tile_mode when ``tiled``:
        - "blend": encoder per overlapping tile, Gaussian blending of BOTH
          posterior moments (mean and logvar), then exact posterior sampling.
        - "sync_gn": non-overlapping tiles with a 32-px image halo; every
          GroupNorm reduces across ALL tiles (the reference tiled encoder,
          tilevae.py:232-304 encoder path) with chunked segment compute.
        """
        if tiled and tile_mode == "sync_gn":
            mean, logvar = self._vae_encode_sync(
                params, image, tile_size, chunk=tiles_per_chunk
            )
        elif tiled:
            from ..tiling import make_tiled_fn

            def enc_moments(x):
                m, lv = self.vae.apply(
                    params["vae"], x, method=self.vae.encode_moments
                )
                return jnp.concatenate([m, lv], axis=-1)

            moments = make_tiled_fn(
                enc_moments, tile_size, tile_size // 2, scale_type="down", scale=8,
                channel=2 * self.vae.embed_dim,
            )(image)
            mean, logvar = jnp.split(moments, 2, axis=-1)
        else:
            mean, logvar = self.vae.apply(
                params["vae"], image, method=self.vae.encode_moments
            )
        if sample:
            assert rng is not None, "sampling the posterior needs an rng"
            std = jnp.exp(0.5 * logvar)
            z = mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)
        else:
            z = mean
        return z * self.scale_factor

    def _vae_encode_sync(
        self, params: Params, image: jax.Array, tile_size: int,
        halo: int = 32, chunk: int = 8,
    ) -> Tuple[jax.Array, jax.Array]:
        """Cross-tile-GN tiled encode. ``tile_size``/``halo`` in image px
        (both multiples of 8); streaming segments via vae_stream."""
        from .vae_stream import encode_sync_moments

        assert image.shape[0] == 1, "sync_gn tiling supports batch 1"
        assert tile_size % 8 == 0 and halo % 8 == 0
        _, h, w, _ = image.shape
        ts = tile_size
        ph = (ts - h % ts) % ts
        pw = (ts - w % ts) % ts
        xp = jnp.pad(
            image, ((0, 0), (halo, halo + ph), (halo, halo + pw), (0, 0)),
            mode="edge",
        )
        coords = [(i, j) for i in range(0, h + ph, ts) for j in range(0, w + pw, ts)]
        tiles = jnp.concatenate(
            [xp[:, i: i + ts + 2 * halo, j: j + ts + 2 * halo, :] for i, j in coords],
            axis=0,
        )
        mean_t, logvar_t = encode_sync_moments(
            params["vae"], tiles, ch_mult=self.vae.ch_mult,
            num_res_blocks=self.vae.num_res_blocks, dtype=self.vae.dtype,
            chunk=chunk,
        )
        hl, wl = (h + ph) // 8, (w + pw) // 8
        tl, hal = ts // 8, halo // 8
        out = jnp.zeros((1, hl, wl, 2 * mean_t.shape[-1]), mean_t.dtype)
        mom_t = jnp.concatenate([mean_t, logvar_t], axis=-1)
        for t_idx, (i, j) in enumerate(coords):
            valid = mom_t[t_idx: t_idx + 1, hal: hal + tl, hal: hal + tl, :]
            out = out.at[:, i // 8: i // 8 + tl, j // 8: j // 8 + tl, :].set(valid)
        out = out[:, : h // 8, : w // 8, :]
        mean, logvar = jnp.split(out, 2, axis=-1)
        return mean, logvar

    def vae_decode(
        self,
        params: Params,
        z: jax.Array,
        tiled: bool = False,
        tile_size: int = 256,
        tile_mode: str = "blend",
    ) -> jax.Array:
        """tile_size is in LATENT pixels when tiled (pipeline divides by 8).

        tile_mode:
        - "blend": overlapping tiles + Gaussian blending (bounded memory,
          chunked execution).
        - "sync_gn": non-overlapping tiles with an 11-px latent halo ride the
          batch axis and every GroupNorm reduces across ALL tiles — the exact
          cross-tile statistics aggregation of the reference tiled VAE
          (tilevae.py:232-304), mathematically seam-free. Requires batch 1
          and enough HBM to hold all tiles at once.
        """
        if tiled and tile_mode == "sync_gn":
            return self._vae_decode_sync(params, z, tile_size)
        if tiled:
            from ..tiling import make_tiled_fn

            dec = lambda zt: self.vae.apply(  # noqa: E731
                params["vae"], zt / self.scale_factor, method=self.vae.decode
            )
            return make_tiled_fn(
                dec, tile_size, tile_size // 2, scale_type="up", scale=8, channel=3
            )(z)
        return self.vae.apply(params["vae"], z / self.scale_factor, method=self.vae.decode)

    def _vae_decode_sync(
        self, params: Params, z: jax.Array, tile_size: int, halo: int = 11,
        chunk: int = 8,
    ) -> jax.Array:
        """Cross-tile-GN tiled decode (tile_size/halo in LATENT px).

        GN statistics are exact across all tiles (reference tilevae
        decoder path); segment compute streams in ``chunk``-tile groups so
        the conv workspace stays bounded at high resolutions.
        """
        from .vae_stream import decode_sync

        assert z.shape[0] == 1, "sync_gn tiling supports batch 1"
        b, h, w, c = z.shape
        ts = tile_size
        ph = (ts - h % ts) % ts
        pw = (ts - w % ts) % ts
        zp = jnp.pad(z, ((0, 0), (halo, halo + ph), (halo, halo + pw), (0, 0)), mode="edge")
        coords = [(i, j) for i in range(0, h + ph, ts) for j in range(0, w + pw, ts)]
        tiles = jnp.concatenate(
            [zp[:, i: i + ts + 2 * halo, j: j + ts + 2 * halo, :] for i, j in coords],
            axis=0,
        )
        out_tiles = decode_sync(
            params["vae"], tiles / self.scale_factor, ch_mult=self.vae.ch_mult,
            num_res_blocks=self.vae.num_res_blocks, dtype=self.vae.dtype,
            chunk=chunk,
        )
        out = jnp.zeros((1, (h + ph) * 8, (w + pw) * 8, 3), out_tiles.dtype)
        for t_idx, (i, j) in enumerate(coords):
            valid = out_tiles[t_idx: t_idx + 1, halo * 8: (halo + ts) * 8, halo * 8: (halo + ts) * 8, :]
            out = out.at[:, i * 8: (i + ts) * 8, j * 8: (j + ts) * 8, :].set(valid)
        return out[:, : h * 8, : w * 8, :]

    def encode_text(self, params: Params, tokens: jax.Array) -> jax.Array:
        return self.clip.apply(params["clip"], tokens)

    def prepare_condition(
        self,
        params: Params,
        cond_img: jax.Array,
        tokens: jax.Array,
        tiled: bool = False,
        tile_size: int = 256,
        tile_mode: str = "blend",
    ) -> Dict[str, jax.Array]:
        """cond_img in [0,1] NHWC; tokens [B,77] int32 (cldm.py:143-158)."""
        return dict(
            c_txt=self.encode_text(params, tokens),
            c_img=self.vae_encode(
                params, cond_img * 2 - 1, sample=False, tiled=tiled,
                tile_size=tile_size, tile_mode=tile_mode,
            ),
        )

    # ------------------------------------------------------------------ #
    # checkpoint surgery
    # ------------------------------------------------------------------ #
    def load_pretrained_sd(
        self, params: Params, sd: Mapping[str, np.ndarray], strict: bool = True
    ) -> Params:
        """Fill unet/vae/clip subtrees from a full SD2.1 checkpoint."""
        out = dict(params)
        for name, module_params in (("unet", params["unet"]), ("vae", params["vae"]), ("clip", params["clip"])):
            filled, missing, _ = convert.fill_flax_params(
                module_params, sd, prefix=convert.SD_MODULE_MAP[name], strict=strict
            )
            out[name] = filled
        return out

    def load_controlnet_from_ckpt(
        self, params: Params, sd: Mapping[str, np.ndarray]
    ) -> Params:
        filled, missing, _ = convert.fill_flax_params(params["controlnet"], sd, strict=True)
        return {**params, "controlnet": filled}

    # ------------------------------------------------------------------ #
    # denoise-scan invariant hoisting (exact math, fewer HBM reads/step)
    # ------------------------------------------------------------------ #
    def hoist_context_kv(self, params: Params, c_txt: jax.Array):
        """Precompute every cross-attention site's k/v projection of the
        prompt context, once per prompt instead of once per denoise step.

        The context never changes across the scan, but XLA's while-loop
        LICM does not hoist dot ops out of the loop body (verified on
        compiled HLO), so each of the ~14 cross-attn sites re-read its
        ~1-5 MB kv kernels and re-ran the projection all 50 steps.

        ``c_txt`` must be EXACTLY the context tensor the model will see —
        i.e. the CFG-concatenated [2B, 77, 1024] under batched CFG. The
        math mirrors CrossAttention._fused_proj bit-for-bit (same concat,
        same casts; test_hoist.py checks against a primed forward).

        Returns {"unet": tree, "controlnet": tree} for the ``hoisted``
        kwarg of __call__ (partial flax variable collections)."""
        return {
            "unet": _hoist_kv_walk(
                params["unet"]["params"], c_txt, self.unet.dtype
            ),
            "controlnet": _hoist_kv_walk(
                params["controlnet"]["params"], c_txt, self.controlnet.dtype
            ),
        }

    def hoist_emb_tables(self, params: Params, model_ts) -> Any:
        """Precompute every ResBlock's temb projection for ALL sampler
        timesteps at once (the full t-grid is known before the scan).

        Each of the ~40 ResBlock sites re-read its [1280, co] emb kernel
        (~90 MB/step summed, bf16) and re-ran a tiny [B,1280] matmul every
        step — all of it a pure function of t. Tables are [T, 1, co]
        (rows are batch-identical since t is uniform across the batch);
        the pipeline slices row searchsorted(ts, t) per step and the
        ResBlock broadcasts over batch.

        ``model_ts`` must be sorted ascending (pipeline sorts); the math
        mirrors UNetModel's time_embed chain + ResBlock's emb_layers.1
        exactly (dense/QuantDense casts included)."""
        ts = jnp.asarray(model_ts, jnp.float32)
        out = {}
        for name, mod in (("unet", self.unet), ("controlnet", self.controlnet)):
            tree = params[name]["params"]
            emb = _emb_chain(tree, ts, mod.model_channels, mod.dtype)
            out[name] = _hoist_emb_walk(tree, jax.nn.silu(emb), mod.dtype)
        return out

    def make_hoist_lookup(
        self,
        params: Params,
        ctx_full: jax.Array,
        model_ts=None,
    ):
        """Precompute the denoise-scan invariants (hoist_context_kv always;
        hoist_emb_tables when the sampler publishes its t-grid) and return
        ``lookup(t) -> {"unet": tree, "controlnet": tree}`` resolving the
        per-step hoisted collection for a [B] timestep vector.

        ``ctx_full`` must be the context the model will actually see per
        step — the CFG-concatenated [2B, 77, 1024] under batched CFG
        (sampler/base.py::cfg_model_call concatenates [cond, uncond])."""
        return self.hoist_lookup_from(
            self.make_hoist_tables(params, ctx_full, model_ts)
        )

    def make_hoist_tables(self, params: Params, ctx_full: jax.Array, model_ts=None):
        """Pure pytree of the hoisted invariants — jit-traceable AND
        returnable from a jit, so a chunked-dispatch pipeline can compute
        them once in a prep dispatch and feed every scan segment."""
        hoisted_kv = self.hoist_context_kv(params, ctx_full)
        emb_tables = hoist_ts = None
        if model_ts is not None:
            ts_asc = np.unique(np.asarray(model_ts, np.float32))
            emb_tables = self.hoist_emb_tables(params, ts_asc)
            hoist_ts = jnp.asarray(ts_asc)
        return {"kv": hoisted_kv, "emb": emb_tables, "ts": hoist_ts}

    @staticmethod
    def hoist_lookup_from(tables):
        """``lookup(t)`` closure over a ``make_hoist_tables`` pytree."""
        hoisted_kv, emb_tables, hoist_ts = (
            tables["kv"], tables["emb"], tables["ts"]
        )

        def lookup(t):
            hoisted = hoisted_kv
            if emb_tables is not None:
                idx = jnp.searchsorted(hoist_ts, t[0].astype(jnp.float32))
                step_emb = jax.tree_util.tree_map(
                    lambda tab: tab[idx], emb_tables
                )
                hoisted = {
                    k: merge_hoisted(hoisted[k], step_emb[k])
                    for k in hoisted
                }
            return hoisted

        return lookup

    def hoisted_model_fn(
        self,
        params: Params,
        ctx_full: jax.Array,
        model_ts=None,
        control_scales: Any = 1.0,
    ):
        """Build a sampler ``model_fn`` with the denoise-scan invariants
        precomputed. Shared by the pipeline and bench.py so the hoist
        wiring exists exactly once."""
        lookup = self.make_hoist_lookup(params, ctx_full, model_ts)

        def model_fn(x, t, c):
            return self(
                params, x, t, c, control_scales=control_scales,
                hoisted=lookup(t),
            )

        return model_fn

    # ------------------------------------------------------------------ #
    def make_cached_control_model(
        self,
        params: Params,
        strength: float,
        interval: int,
        latent_hw: Tuple[int, int],
        call_batch: int,
        cache_unet_encoder: bool = False,
        hoist_lookup=None,
    ):
        """Turbo mode: recompute the ControlNet residuals only every
        ``interval`` denoise steps, reusing the cached 13 tensors in between
        (block-caching across timesteps — the control signal drifts slowly;
        cf. "Cache Me if You Can", arXiv:2312.03209; the reference lists
        DiffBIR-turbo as TODO, README.md:95-96).

        ``cache_unet_encoder`` additionally freezes the UNet encoder + middle
        features between refreshes (encoder propagation, arXiv:2312.09608) —
        only the decoder runs at cached steps.

        Returns a stateful model fn (``has_aux``) for the scan samplers.
        ``call_batch`` is the batch THE MODEL SEES (2B under batched CFG).

        ``hoist_lookup`` (make_hoist_lookup): optional per-step resolver of
        the scan-invariant 'hoisted' collection (context k/v + temb rows);
        exact math, applied to both the refresh and cached branches.
        """
        h, w = latent_hw
        b = call_batch
        x0 = jnp.zeros((b, h, w, 4))
        t0 = jnp.zeros((b,))
        ctx0 = jnp.zeros((b, self.clip.context_length, self.clip.width))
        cn_shapes = jax.eval_shape(
            lambda x, hint, t, ctx: self.controlnet.apply(
                params["controlnet"], x, hint, t, ctx
            ),
            x0, jnp.zeros((b, h, w, self.controlnet.hint_channels)), t0, ctx0,
        )
        zeros = lambda tree: jax.tree_util.tree_map(  # noqa: E731
            lambda s: jnp.zeros(s.shape, s.dtype), tree
        )
        if cache_unet_encoder:
            enc_shapes = jax.eval_shape(
                lambda x, t, ctx: self.unet.apply(
                    params["unet"], x, t, ctx, phase="encode"
                ),
                x0, t0, ctx0,
            )

        def init_aux():
            aux = (jnp.zeros((), jnp.int32), zeros(cn_shapes))
            if cache_unet_encoder:
                aux = aux + (zeros(enc_shapes),)
            return aux

        def model(x, t, c, aux):
            cn_vars, unet_vars = params["controlnet"], params["unet"]
            if hoist_lookup is not None:
                hv = hoist_lookup(t)
                if hv.get("controlnet"):
                    cn_vars = {**cn_vars, "hoisted": hv["controlnet"]}
                if hv.get("unet"):
                    unet_vars = {**unet_vars, "hoisted": hv["unet"]}
            if cache_unet_encoder:
                i, cached_ctrl, cached_enc = aux
                control, enc = jax.lax.cond(
                    i % interval == 0,
                    lambda _: (
                        self.controlnet.apply(
                            cn_vars, x, c["c_img"], t, c["c_txt"]
                        ),
                        self.unet.apply(
                            unet_vars, x, t, c["c_txt"], phase="encode"
                        ),
                    ),
                    lambda _: (cached_ctrl, cached_enc),
                    None,
                )
                scaled = tuple(ci * strength for ci in control)
                out = self.unet.apply(
                    unet_vars, x, t, c["c_txt"], control=scaled,
                    phase="decode", cached=enc,
                )
                return out, (i + 1, control, enc)
            i, cached = aux
            control = jax.lax.cond(
                i % interval == 0,
                lambda _: self.controlnet.apply(
                    cn_vars, x, c["c_img"], t, c["c_txt"]
                ),
                lambda _: cached,
                None,
            )
            scaled = tuple(ci * strength for ci in control)
            out = self.unet.apply(unet_vars, x, t, c["c_txt"], control=scaled)
            return out, (i + 1, control)

        model.has_aux = True
        model.init_aux = init_aux
        return model

    def load_controlnet_from_unet(self, params: Params) -> Params:
        """Init controlnet from the (loaded) UNet encoder; zero-pad the input
        conv for the extra hint channels (cldm.py:68-90)."""
        unet_flat = dict(
            jax.tree_util.tree_flatten_with_path(params["unet"])[0]
        )
        unet_by_path = {
            tuple(k.key for k in path): leaf for path, leaf in unet_flat.items()
        }
        cn_leaves, treedef = jax.tree_util.tree_flatten_with_path(params["controlnet"])
        new = []
        for path, leaf in cn_leaves:
            key = tuple(k.key for k in path)
            src = unet_by_path.get(key)
            if src is None:
                new.append(leaf)  # zero convs etc. keep scratch (zero) init
            elif src.shape == leaf.shape:
                new.append(src)
            else:
                # input conv: HWIO, pad input-channel axis (2) with zeros
                d_ic = leaf.shape[2] - src.shape[2]
                pad = jnp.zeros(src.shape[:2] + (d_ic,) + src.shape[3:], src.dtype)
                new.append(jnp.concatenate([src, pad], axis=2))
        cn = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(params["controlnet"]), new
        )
        return {**params, "controlnet": cn}


# --------------------------------------------------------------------------- #
# hoist builders (params-tree walks mirroring the module math exactly)
# --------------------------------------------------------------------------- #
def _dense_math(node: Mapping[str, jax.Array], x: jax.Array, dtype) -> jax.Array:
    """Replicates layers.dense (nn.Dense, param_dtype=f32, dtype=``dtype``)
    and layers.QuantDense on a raw param node: promote-to-dtype matmul plus
    bias. Must stay bit-identical to the module paths (test_hoist.py)."""
    if "kernel_q" in node:
        from ..ops.quant_matmul import quant_matmul

        y = quant_matmul(x.astype(dtype), node["kernel_q"], node["scale"])
    else:
        y = x.astype(dtype) @ node["kernel"].astype(dtype)
    if "bias" in node:
        y = y + node["bias"].astype(y.dtype)
    return y


def _hoist_kv_walk(tree, c_txt: jax.Array, dtype):
    """Emit {"<ResBlock-scope path>": {"attn2": {"kv": value}}} for every
    cross-attention site; mirrors CrossAttention._fused_proj (concat the
    fp32 kernels THEN cast, one matmul; int8 path via quant_matmul with
    concatenated scales)."""
    out = {}
    for key, val in tree.items():
        if not isinstance(val, dict):
            continue
        if key == "attn2" and "to_k" in val and "to_v" in val:
            tk, tv = val["to_k"], val["to_v"]
            if "kernel_q" in tk:
                from ..ops.quant_matmul import quant_matmul

                wq = jnp.concatenate([tk["kernel_q"], tv["kernel_q"]], axis=1)
                sc = jnp.concatenate([tk["scale"], tv["scale"]], axis=0)
                kv = quant_matmul(c_txt.astype(dtype), wq, sc)
            else:
                w = jnp.concatenate(
                    [tk["kernel"], tv["kernel"]], axis=1
                ).astype(dtype)
                kv = c_txt.astype(dtype) @ w
            out[key] = {"kv": kv}
        else:
            sub = _hoist_kv_walk(val, c_txt, dtype)
            if sub:
                out[key] = sub
    return out


def _emb_chain(tree, ts: jax.Array, model_channels: int, dtype) -> jax.Array:
    """time_embed chain for a [T] timestep vector (unet.py __call__:
    timestep_embedding -> time_embed.0 -> silu -> time_embed.2)."""
    from .layers import timestep_embedding

    t_emb = timestep_embedding(ts, model_channels)
    emb = _dense_math(tree["time_embed.0"], t_emb, dtype)
    emb = _dense_math(tree["time_embed.2"], jax.nn.silu(emb), dtype)
    return emb.astype(dtype)


def _hoist_emb_walk(tree, emb_silu: jax.Array, dtype):
    """Emit {"<ResBlock scope>": {"emb_out": [T, 1, co]}} for every ResBlock
    (any dict node holding an ``emb_layers.1`` param scope)."""
    out = {}
    for key, val in tree.items():
        if not isinstance(val, dict):
            continue
        sub = _hoist_emb_walk(val, emb_silu, dtype)
        if "emb_layers.1" in val and isinstance(val["emb_layers.1"], dict):
            e = _dense_math(val["emb_layers.1"], emb_silu, dtype)  # [T, co]
            sub = dict(sub)
            sub["emb_out"] = e[:, None, :]
        if sub:
            out[key] = sub
    return out


def merge_hoisted(a, b):
    """Deep-merge two partial ``hoisted`` collection trees (disjoint leaves:
    kv lives under attn2 scopes, emb_out under ResBlock scopes)."""
    out = dict(a)
    for k, v in b.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_hoisted(out[k], v)
        else:
            out[k] = v
    return out


# --------------------------------------------------------------------------- #
# int8 weight-only serving mode (pairs with sd21(quant_dense=True))
# --------------------------------------------------------------------------- #
_QUANT_DENSE_TAILS = (
    "to_q", "to_k", "to_v", "to_out.0",   # attention projections
    "proj", "net.2",                       # GEGLU / FFN
    "proj_in", "proj_out",                 # SpatialTransformer (linear mode)
    "emb_layers.1",                        # ResBlock temb projection
)


def quantize_dense_params(params: Params) -> Params:
    """Float ControlLDM params -> the int8 serving layout.

    Replaces each targeted 2-D ``kernel`` in the unet/controlnet subtrees
    with ``{kernel_q: int8, scale: f32[out]}`` (symmetric per-output-channel;
    ops/quant_matmul.quantize_weight). Biases/norms/convs stay float. The
    result matches the param tree of ``ControlLDM.sd21(quant_dense=True)``.
    VAE/CLIP are untouched (outside the denoise scan, negligible traffic).
    """
    from ..ops.quant_matmul import quantize_weight

    def walk(node, path):
        if not isinstance(node, dict):
            return node
        out = {}
        for key, val in node.items():
            if (
                isinstance(val, dict)
                and key in _QUANT_DENSE_TAILS
                and "kernel" in val
                and getattr(val["kernel"], "ndim", 0) == 2
            ):
                q, scale = quantize_weight(val["kernel"])
                slot = {"kernel_q": q, "scale": scale}
                if "bias" in val:
                    slot["bias"] = val["bias"]
                out[key] = slot
            else:
                out[key] = walk(val, path + (key,))
        return out

    return {
        **params,
        "unet": walk(dict(params["unet"]), ("unet",)),
        "controlnet": walk(dict(params["controlnet"]), ("controlnet",)),
    }


# ResBlock conv scopes (the fused kernel's weight streams); unique to
# ResBlock in the unet/controlnet trees.
_QUANT_CONV_TAILS = ("in_layers.2", "out_layers.3", "skip_connection")


def quantize_conv_params(params: Params) -> Params:
    """Float ControlLDM params -> int8 ResBlock-conv serving layout.

    Replaces each ResBlock conv ``kernel`` (4-D HWIO) in the unet/controlnet
    subtrees with ``{kernel_q: int8, scale: f32[out]}`` (symmetric
    per-output-channel over taps+Cin; ops/fused_resblock.quantize_conv_weight).
    Matches the param tree of ``sd21(fused_resblock=True, quant_conv=True)``.
    Composes with ``quantize_dense_params`` (disjoint key sets)."""
    from ..ops.fused_resblock import quantize_conv_weight

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for key, val in node.items():
            if (
                isinstance(val, dict)
                and key in _QUANT_CONV_TAILS
                and "kernel" in val
                and getattr(val["kernel"], "ndim", 0) == 4
            ):
                q, scale = quantize_conv_weight(val["kernel"])
                slot = {"kernel_q": q, "scale": scale}
                if "bias" in val:
                    slot["bias"] = val["bias"]
                out[key] = slot
            else:
                out[key] = walk(val)
        return out

    return {
        **params,
        "unet": walk(dict(params["unet"])),
        "controlnet": walk(dict(params["controlnet"])),
    }
