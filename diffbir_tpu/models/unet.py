"""SD2.1 UNet + IRControlNet, NHWC flax modules.

Behavioral parity targets:
- UNetModel: /root/reference/diffbir/model/unet.py:361-719 (ADM-style UNet,
  model_channels=320, mult (1,2,4,4), SpatialTransformer at ds 4/2/1,
  num_head_channels=64, context_dim=1024, linear transformer projections).
- SpatialTransformer stack: /root/reference/diffbir/model/attention.py
  (pre-LN self-attn -> cross-attn -> GEGLU FF, zero-init output proj).
- ControlledUnetModel / ControlNet: /root/reference/diffbir/model/controlnet.py
  (hint concatenated at the input conv; 13 zero-conv residuals).

TPU-first design decisions:
- NHWC layout; channel concat on the last axis.
- control residuals are a tuple argument (pure function), not a mutable list.
- fp32 GroupNorm + fp32 softmax inside bf16 compute (see layers.py/ops).
- gradient checkpointing via ``nn.remat`` on ResBlock/SpatialTransformer when
  ``use_checkpoint`` (reference uses a custom CheckpointFunction, util.py:85-125).

Module names are chosen so flax param paths mirror the torch checkpoint keys
(weights/convert.py does a mechanical string+layout transform).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import attention
from .layers import (
    Dtype,
    GroupNorm32,
    LayerNormFp32,
    QuantDense,
    conv,
    dense,
    nearest_upsample_2x,
    timestep_embedding,
)


class _GNParams(nn.Module):
    """Registers GroupNorm32-compatible params without running the norm
    (fused-ResBlock serving path; names/shapes/init identical)."""

    ch: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.ch,), jnp.float32),
            self.param("bias", nn.initializers.zeros, (self.ch,), jnp.float32),
        )


class _ConvParams(nn.Module):
    """Registers conv()-compatible kernel/bias params without the conv.

    ``quant``: int8 weight-only serving layout instead — {kernel_q, scale,
    bias} (pair with cldm.quantize_conv_params on a float tree); returns
    (kernel_q, scale, bias)."""

    shape: Tuple[int, ...]  # (kh, kw, cin, cout)
    zero_init: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self):
        bias = self.param("bias", nn.initializers.zeros, (self.shape[-1],),
                          jnp.float32)
        if self.quant:
            kq = self.param("kernel_q", nn.initializers.zeros_init(),
                            self.shape, jnp.int8)
            scale = self.param("scale", nn.initializers.ones_init(),
                               (self.shape[-1],), jnp.float32)
            return kq, scale, bias
        init = (nn.initializers.zeros_init() if self.zero_init
                else nn.initializers.lecun_normal())
        return self.param("kernel", init, self.shape, jnp.float32), bias


class ResBlock(nn.Module):
    """GN32 -> SiLU -> conv3x3 -> +temb -> GN32 -> SiLU -> zero-conv3x3, skip."""

    out_channels: int
    dtype: Dtype = jnp.float32
    quant: bool = False  # int8 emb_layers.1 (serving mode, see QuantDense)
    fused: bool = False  # Pallas fused-block serving mode (ops/fused_resblock)
    quant_conv: bool = False  # int8 conv weights INSIDE the fused kernel

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array) -> jax.Array:
        d = (functools.partial(QuantDense, dtype=self.dtype) if self.quant
             else functools.partial(dense, dtype=self.dtype))
        co = self.out_channels
        if self.quant_conv and not self.fused:
            raise ValueError("quant_conv requires the fused ResBlock path")

        def emb_out() -> jax.Array:
            """emb projection, or its hoisted per-step value.

            ``emb`` depends only on the timestep, and every sampler step's
            timestep is known before the scan starts — so the pipeline can
            precompute silu(emb) @ W_emb for ALL steps once
            (cldm.hoist_emb_tables; XLA does not hoist/batch these ~40
            small per-site matmuls itself) and pass the current step's
            slice ([1, co], rows are batch-identical) via the "hoisted"
            collection. Saves ~90 MB/step of emb-kernel HBM reads."""
            if self.has_variable("hoisted", "emb_out"):
                e = self.get_variable("hoisted", "emb_out")
                return jnp.broadcast_to(e, (x.shape[0], co))
            e = d(co, name="emb_layers.1")(nn.silu(emb))
            if (self.is_mutable_collection("hoisted")
                    and not self.is_initializing()):
                # priming mode: record the exact value (test oracle for the
                # params-walk hoist builders); init-guarded like the kv hook
                self.put_variable("hoisted", "emb_out", e)
            return e
        if self.fused:
            # Same param tree as the unfused branch (names/shapes/init match
            # the submodules), executed by one Pallas kernel per image.
            from ..ops.fused_resblock import fused_resblock

            qc = self.quant_conv
            g1s, g1b = _GNParams(x.shape[-1], name="in_layers.0")()
            cp1 = _ConvParams((3, 3, x.shape[-1], co), quant=qc,
                              name="in_layers.2")()
            e = emb_out()
            g2s, g2b = _GNParams(co, name="out_layers.0")()
            cp2 = _ConvParams((3, 3, co, co), zero_init=True, quant=qc,
                              name="out_layers.3")()
            p = dict(gn1_scale=g1s, gn1_bias=g1b, gn2_scale=g2s, gn2_bias=g2b)
            if qc:
                p["w1_q"], p["s1"], p["b1"] = cp1
                p["w2_q"], p["s2"], p["b2"] = cp2
            else:
                (p["w1"], p["b1"]), (p["w2"], p["b2"]) = cp1, cp2
            if x.shape[-1] != co:
                cps = _ConvParams((1, 1, x.shape[-1], co), quant=qc,
                                  name="skip_connection")()
                if qc:
                    p["w_skip_q"], p["s_skip"], p["b_skip"] = cps
                else:
                    p["w_skip"], p["b_skip"] = cps
            return fused_resblock(x.astype(self.dtype), e, p)
        h = GroupNorm32(name="in_layers.0")(x)
        h = nn.silu(h)
        h = conv(co, 3, dtype=self.dtype, name="in_layers.2")(h)
        e = emb_out()
        h = h + e[:, None, None, :].astype(h.dtype)
        h = GroupNorm32(name="out_layers.0")(h)
        h = nn.silu(h)
        h = conv(co, 3, zero_init=True, dtype=self.dtype, name="out_layers.3")(h)
        if x.shape[-1] != co:
            x = conv(co, 1, padding=0, dtype=self.dtype, name="skip_connection")(x)
        return x + h


class _Kernel(nn.Module):
    """Registers a Dense-compatible kernel param without running the matmul.

    Used by CrossAttention to fuse the q/k/v projections into ONE matmul
    while keeping the canonical per-projection param tree (path
    ``attn*/to_q/kernel`` etc. — identical names/shapes/init to
    ``dense(use_bias=False)``, so torch-key mapping, checkpoints, and
    sharding rules are untouched). With ``quant`` the scope holds the int8
    serving layout ``{kernel_q, scale}`` instead (see layers.QuantDense)."""

    features: int
    quant: bool = False

    @nn.compact
    def __call__(self, in_dim: int):
        if self.quant:
            kq = self.param(
                "kernel_q", nn.initializers.zeros_init(), (in_dim, self.features),
                jnp.int8,
            )
            scale = self.param(
                "scale", nn.initializers.ones_init(), (self.features,), jnp.float32
            )
            return kq, scale
        return self.param(
            "kernel", nn.initializers.lecun_normal(), (in_dim, self.features),
            jnp.float32,
        )


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when context is None."""

    heads: int
    dim_head: int
    query_dim: int
    dtype: Dtype = jnp.float32
    quant: bool = False  # int8 projections (serving mode)

    def _fused_proj(self, x: jax.Array, names: Sequence[str]) -> jax.Array:
        """One matmul over the concatenated projection kernels — reads the
        activation ONCE (vs once per projection: the HBM-bound step's
        currency). The kernel concat is loop-invariant, so XLA hoists it
        out of the denoise scan (verified: concatenate sits in ENTRY, not
        the while body). Exact for the int8 path too: per-output-channel
        scales concatenate alongside their columns."""
        inner = self.heads * self.dim_head
        ws = [_Kernel(inner, quant=self.quant, name=n)(x.shape[-1]) for n in names]
        if self.quant:
            from ..ops.quant_matmul import quant_matmul

            wq = jnp.concatenate([w for w, _ in ws], axis=1)
            sc = jnp.concatenate([s for _, s in ws], axis=0)
            return quant_matmul(x.astype(self.dtype), wq, sc)
        w = jnp.concatenate(ws, axis=1).astype(self.dtype)
        return x.astype(self.dtype) @ w

    @nn.compact
    def __call__(self, x: jax.Array, context: Optional[jax.Array] = None) -> jax.Array:
        inner = self.heads * self.dim_head
        if context is None:
            qkv = self._fused_proj(x, ("to_q", "to_k", "to_v"))
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            # cross-attention: q reads x; k/v share one read of the context
            q = self._fused_proj(x, ("to_q",))
            if self.has_variable("hoisted", "kv"):
                # kv is loop-invariant across the denoise scan (the prompt
                # context never changes), but XLA's while-loop LICM does not
                # hoist dot ops out of the scan body (verified on the
                # compiled HLO) — so the pipeline precomputes it once per
                # prompt (cldm.hoist_context_kv) and passes it in via the
                # "hoisted" variable collection.
                kv = self.get_variable("hoisted", "kv")
            else:
                kv = self._fused_proj(context, ("to_k", "to_v"))
                if (self.is_mutable_collection("hoisted")
                        and not self.is_initializing()):
                    # priming mode: record the exact value (test oracle for
                    # the params-walk hoist builders). Guarded against init
                    # (where EVERY collection is mutable) so the variable
                    # tree from .init() never carries a stale cache.
                    self.put_variable("hoisted", "kv", kv)
            k, v = jnp.split(kv, 2, axis=-1)
        b, sq, _ = q.shape
        skv = k.shape[1]
        q = q.reshape(b, sq, self.heads, self.dim_head)
        k = k.reshape(b, skv, self.heads, self.dim_head)
        v = v.reshape(b, skv, self.heads, self.dim_head)
        out = attention(q, k, v).reshape(b, sq, inner)
        d = QuantDense if self.quant else dense
        return d(self.query_dim, dtype=self.dtype, name="to_out.0")(out)


class GEGLU(nn.Module):
    inner_dim: int
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import os

        d = QuantDense if self.quant else dense
        h = d(self.inner_dim * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # exact erf gelu is reference parity (attention.py:66) — but it is
        # transcendental-bound on the VPU: 1.67 ms of the 26.4 ms step
        # (scripts/profile_step_ablation.py --ffn_ablation, r5 on-chip).
        # DIFFBIR_TPU_FAST_GELU=1 opts into the tanh approximation
        # (error ~1e-3 relative, the bf16 rounding scale) as a measured,
        # drift-accounted turbo knob. Read at trace time.
        approx = os.environ.get("DIFFBIR_TPU_FAST_GELU", "0") == "1"
        return h * nn.gelu(gate, approximate=approx)


class _KernelBias(nn.Module):
    """Dense-compatible {kernel, bias} params without running the matmul
    (the _Kernel trick, plus bias) — lets fused ops consume raw weights
    while the param tree stays checkpoint-identical to nn.Dense."""

    features: int

    @nn.compact
    def __call__(self, in_dim: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_dim, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class _GEGLUParams(nn.Module):
    """Param-tree twin of GEGLU (scope net.0/proj/{kernel,bias})."""

    features: int  # inner * 2

    @nn.compact
    def __call__(self, in_dim: int):
        return _KernelBias(self.features, name="proj")(in_dim)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops import fused_ffn as _ff

        inner = self.dim * self.mult
        if _ff.enabled() and not self.quant:
            # whole-FFN Pallas kernel: both matmuls + GEGLU with the (N, 8d)
            # and (N, 4d) intermediates pinned in VMEM (opt-in; see
            # ops/fused_ffn.py header for the e2e-measurement policy)
            w1, b1 = _GEGLUParams(inner * 2, name="net.0")(x.shape[-1])
            w2, b2 = _KernelBias(self.dim, name="net.2")(inner)
            b, s, c = x.shape
            out = _ff.fused_ffn(
                x.astype(self.dtype).reshape(b * s, c), w1, b1, w2, b2)
            return out.reshape(b, s, self.dim)
        h = GEGLU(inner, dtype=self.dtype, quant=self.quant, name="net.0")(x)
        d = QuantDense if self.quant else dense
        return d(self.dim, dtype=self.dtype, name="net.2")(h)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    dtype: Dtype = jnp.float32
    disable_self_attn: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, context: Optional[jax.Array]) -> jax.Array:
        a1 = CrossAttention(self.heads, self.dim_head, self.dim, dtype=self.dtype,
                            quant=self.quant, name="attn1")
        x = x + a1(LayerNormFp32(name="norm1")(x), context if self.disable_self_attn else None)
        a2 = CrossAttention(self.heads, self.dim_head, self.dim, dtype=self.dtype,
                            quant=self.quant, name="attn2")
        x = x + a2(LayerNormFp32(name="norm2")(x), context)
        x = x + FeedForward(self.dim, dtype=self.dtype, quant=self.quant, name="ff")(
            LayerNormFp32(name="norm3")(x)
        )
        return x


class SpatialTransformer(nn.Module):
    channels: int
    heads: int
    dim_head: int
    depth: int = 1
    use_linear: bool = True
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, context: Optional[jax.Array]) -> jax.Array:
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        x_in = x
        x = GroupNorm32(eps=1e-6, name="norm")(x)
        if not self.use_linear:
            x = conv(inner, 1, padding=0, dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, x.shape[-1])
        if self.use_linear:
            dd = QuantDense if self.quant else dense
            x = dd(inner, dtype=self.dtype, name="proj_in")(x)
        for d in range(self.depth):
            x = BasicTransformerBlock(
                inner, self.heads, self.dim_head, dtype=self.dtype,
                quant=self.quant, name=f"transformer_blocks.{d}",
            )(x, context)
        if self.use_linear:
            if self.quant:
                x = QuantDense(c, dtype=self.dtype, name="proj_out")(x)
            else:
                x = dense(c, zero_init=True, dtype=self.dtype, name="proj_out")(x)
            x = x.reshape(b, h, w, c)
        else:
            x = x.reshape(b, h, w, inner)
            x = conv(c, 1, padding=0, zero_init=True, dtype=self.dtype, name="proj_out")(x)
        return x + x_in


class Downsample(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return conv(self.channels, 3, stride=2, dtype=self.dtype, name="op")(x)


class Upsample(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return conv(self.channels, 3, dtype=self.dtype, name="conv")(nearest_upsample_2x(x))


def _head_split(ch: int, num_head_channels: int) -> Tuple[int, int]:
    return ch // num_head_channels, num_head_channels


class UNetModel(nn.Module):
    """SD2.1-base UNet with optional ControlNet residual injection.

    ``control`` (when given) is a tuple of 13 NHWC tensors: one per encoder
    block output (12) plus the middle block (1). This single module covers
    both UNetModel and ControlledUnetModel in the reference.
    """

    in_channels: int = 4
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_head_channels: int = 64
    transformer_depth: int = 1
    context_dim: int = 1024
    use_linear_in_transformer: bool = True
    use_checkpoint: bool = False
    quant_dense: bool = False  # int8 dense sites (inference serving mode)
    fused_resblock: bool = False  # Pallas fused ResBlock (inference serving)
    quant_conv: bool = False  # int8 conv weights in the fused kernel
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        context: jax.Array,
        control: Optional[Tuple[jax.Array, ...]] = None,
        only_mid_control: bool = False,
        phase: str = "full",
        cached: Optional[Tuple[jax.Array, Tuple[jax.Array, ...]]] = None,
    ) -> jax.Array:
        """``phase``: "full" | "encode" (returns (h_mid, hs)) | "decode"
        (consumes ``cached`` = (h_mid, hs) instead of running the encoder —
        encoder propagation across timesteps, arXiv:2312.09608)."""
        mc = self.model_channels
        ted = mc * 4
        Res = nn.remat(ResBlock) if self.use_checkpoint else ResBlock
        ST = nn.remat(SpatialTransformer, static_argnums=()) if self.use_checkpoint else SpatialTransformer
        Res = functools.partial(Res, quant=self.quant_dense,
                                fused=self.fused_resblock,
                                quant_conv=self.quant_conv)
        ST = functools.partial(ST, quant=self.quant_dense)

        t_emb = timestep_embedding(timesteps, mc)
        emb = dense(ted, dtype=self.dtype, name="time_embed.0")(t_emb)
        emb = dense(ted, dtype=self.dtype, name="time_embed.2")(nn.silu(emb))

        emb = emb.astype(self.dtype)
        context = context.astype(self.dtype)

        if phase == "decode":
            assert cached is not None
            h, hs = cached
            h = h.astype(self.dtype)
            hs = [s.astype(self.dtype) for s in hs]
            ch = h.shape[-1]
            ds = 2 ** (len(self.channel_mult) - 1)
        else:
            h = x.astype(self.dtype)
            hs = []
            h = conv(mc, 3, dtype=self.dtype, name="input_blocks.0.0")(h)
            hs.append(h)
            ch, ds, idx = mc, 1, 1
            for level, mult in enumerate(self.channel_mult):
                for _ in range(self.num_res_blocks):
                    h = Res(mult * mc, dtype=self.dtype, name=f"input_blocks.{idx}.0")(h, emb)
                    ch = mult * mc
                    if ds in self.attention_resolutions:
                        heads, dh = _head_split(ch, self.num_head_channels)
                        h = ST(
                            ch, heads, dh, depth=self.transformer_depth,
                            use_linear=self.use_linear_in_transformer,
                            dtype=self.dtype, name=f"input_blocks.{idx}.1",
                        )(h, context)
                    hs.append(h)
                    idx += 1
                if level != len(self.channel_mult) - 1:
                    h = Downsample(ch, dtype=self.dtype, name=f"input_blocks.{idx}.0")(h)
                    hs.append(h)
                    ds *= 2
                    idx += 1

            heads, dh = _head_split(ch, self.num_head_channels)
            h = Res(ch, dtype=self.dtype, name="middle_block.0")(h, emb)
            h = ST(
                ch, heads, dh, depth=self.transformer_depth,
                use_linear=self.use_linear_in_transformer,
                dtype=self.dtype, name="middle_block.1",
            )(h, context)
            h = Res(ch, dtype=self.dtype, name="middle_block.2")(h, emb)

            if phase == "encode":
                return h, tuple(hs)

        if control is not None:
            h = h + control[-1].astype(h.dtype)

        idx = 0
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                skip = hs.pop()
                if control is not None and not only_mid_control:
                    skip = skip + control[len(hs)].astype(skip.dtype)
                h = jnp.concatenate([h, skip], axis=-1)
                h = Res(mc * mult, dtype=self.dtype, name=f"output_blocks.{idx}.0")(h, emb)
                ch = mc * mult
                j = 1
                if ds in self.attention_resolutions:
                    heads, dh = _head_split(ch, self.num_head_channels)
                    h = ST(
                        ch, heads, dh, depth=self.transformer_depth,
                        use_linear=self.use_linear_in_transformer,
                        dtype=self.dtype, name=f"output_blocks.{idx}.{j}",
                    )(h, context)
                    j += 1
                if level and i == self.num_res_blocks:
                    h = Upsample(ch, dtype=self.dtype, name=f"output_blocks.{idx}.{j}")(h)
                    ds //= 2
                idx += 1

        h = GroupNorm32(name="out.0")(h)
        h = nn.silu(h)
        h = conv(self.out_channels, 3, zero_init=True, dtype=jnp.float32, name="out.2")(
            h.astype(jnp.float32)
        )
        return h


class ControlNet(nn.Module):
    """IRControlNet: UNet encoder+middle copy, VAE-latent hint concatenated at
    the input conv (in_channels + hint_channels), zero-conv per block output.

    Returns a tuple of 13 residual tensors (12 encoder + 1 middle).
    Parity: /root/reference/diffbir/model/controlnet.py:50-328.
    """

    in_channels: int = 4
    hint_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_head_channels: int = 64
    transformer_depth: int = 1
    context_dim: int = 1024
    use_linear_in_transformer: bool = True
    use_checkpoint: bool = False
    quant_dense: bool = False  # int8 dense sites (inference serving mode)
    fused_resblock: bool = False  # Pallas fused ResBlock (inference serving)
    quant_conv: bool = False  # int8 conv weights in the fused kernel
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        hint: jax.Array,
        timesteps: jax.Array,
        context: jax.Array,
    ) -> Tuple[jax.Array, ...]:
        mc = self.model_channels
        ted = mc * 4
        Res = nn.remat(ResBlock) if self.use_checkpoint else ResBlock
        ST = nn.remat(SpatialTransformer) if self.use_checkpoint else SpatialTransformer
        Res = functools.partial(Res, quant=self.quant_dense,
                                fused=self.fused_resblock,
                                quant_conv=self.quant_conv)
        ST = functools.partial(ST, quant=self.quant_dense)

        t_emb = timestep_embedding(timesteps, mc)
        emb = dense(ted, dtype=self.dtype, name="time_embed.0")(t_emb)
        emb = dense(ted, dtype=self.dtype, name="time_embed.2")(nn.silu(emb))

        h = jnp.concatenate([x, hint], axis=-1).astype(self.dtype)
        emb = emb.astype(self.dtype)
        context = context.astype(self.dtype)

        outs = []
        h = conv(mc, 3, dtype=self.dtype, name="input_blocks.0.0")(h)
        outs.append(conv(mc, 1, padding=0, zero_init=True, dtype=self.dtype, name="zero_convs.0.0")(h))
        ch, ds, idx = mc, 1, 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = Res(mult * mc, dtype=self.dtype, name=f"input_blocks.{idx}.0")(h, emb)
                ch = mult * mc
                if ds in self.attention_resolutions:
                    heads, dh = _head_split(ch, self.num_head_channels)
                    h = ST(
                        ch, heads, dh, depth=self.transformer_depth,
                        use_linear=self.use_linear_in_transformer,
                        dtype=self.dtype, name=f"input_blocks.{idx}.1",
                    )(h, context)
                outs.append(
                    conv(ch, 1, padding=0, zero_init=True, dtype=self.dtype, name=f"zero_convs.{idx}.0")(h)
                )
                idx += 1
            if level != len(self.channel_mult) - 1:
                h = Downsample(ch, dtype=self.dtype, name=f"input_blocks.{idx}.0")(h)
                outs.append(
                    conv(ch, 1, padding=0, zero_init=True, dtype=self.dtype, name=f"zero_convs.{idx}.0")(h)
                )
                ds *= 2
                idx += 1

        heads, dh = _head_split(ch, self.num_head_channels)
        h = Res(ch, dtype=self.dtype, name="middle_block.0")(h, emb)
        h = ST(
            ch, heads, dh, depth=self.transformer_depth,
            use_linear=self.use_linear_in_transformer,
            dtype=self.dtype, name="middle_block.1",
        )(h, context)
        h = Res(ch, dtype=self.dtype, name="middle_block.2")(h, emb)
        outs.append(conv(ch, 1, padding=0, zero_init=True, dtype=self.dtype, name="middle_block_out.0")(h))
        return tuple(outs)
