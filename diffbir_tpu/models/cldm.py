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
    ) -> jax.Array:
        """ControlNet -> scaled residuals -> controlled UNet (cldm.py:160-172)."""
        control = self.controlnet.apply(
            params["controlnet"], x_noisy, cond["c_img"], t, cond["c_txt"]
        )
        if isinstance(control_scales, (int, float)):
            control_scales = (float(control_scales),) * len(control)
        control = tuple(c * s for c, s in zip(control, control_scales))
        return self.unet.apply(
            params["unet"], x_noisy, t, cond["c_txt"], control=control
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
    def make_cached_control_model(
        self,
        params: Params,
        strength: float,
        interval: int,
        latent_hw: Tuple[int, int],
        call_batch: int,
        cache_unet_encoder: bool = False,
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
            if cache_unet_encoder:
                i, cached_ctrl, cached_enc = aux
                control, enc = jax.lax.cond(
                    i % interval == 0,
                    lambda _: (
                        self.controlnet.apply(
                            params["controlnet"], x, c["c_img"], t, c["c_txt"]
                        ),
                        self.unet.apply(
                            params["unet"], x, t, c["c_txt"], phase="encode"
                        ),
                    ),
                    lambda _: (cached_ctrl, cached_enc),
                    None,
                )
                scaled = tuple(ci * strength for ci in control)
                out = self.unet.apply(
                    params["unet"], x, t, c["c_txt"], control=scaled,
                    phase="decode", cached=enc,
                )
                return out, (i + 1, control, enc)
            i, cached = aux
            control = jax.lax.cond(
                i % interval == 0,
                lambda _: self.controlnet.apply(
                    params["controlnet"], x, c["c_img"], t, c["c_txt"]
                ),
                lambda _: cached,
                None,
            )
            scaled = tuple(ci * strength for ci in control)
            out = self.unet.apply(params["unet"], x, t, c["c_txt"], control=scaled)
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
