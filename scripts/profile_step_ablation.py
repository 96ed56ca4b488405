"""Ablation timing of ONE denoise step (batch-2 CFG ControlLDM forward).

Times the full step, then variants with a component stubbed to identity, to
attribute step latency: ControlNet, SpatialTransformers, GroupNorms, attention
impl. Each variant is a separate jitted program (compile amortized by the
persistent cache). Run on the real TPU:

    PYTHONPATH=/root/.axon_site python scripts/profile_step_ablation.py
"""

import os
import sys
import time
from contextlib import contextmanager

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from diffbir_tpu.models.cldm import ControlLDM

SIZE = int(os.environ.get("BENCH_SIZE", 512))
N_INNER = 10  # chained steps inside one jit to hide dispatch latency


def _bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree
    )


@contextmanager
def patched(obj, name, repl):
    orig = getattr(obj, name)
    setattr(obj, name, repl)
    try:
        yield
    finally:
        setattr(obj, name, orig)


def time_step(cldm, params, label, use_control=True):
    lat = SIZE // 8
    x = jax.random.normal(jax.random.PRNGKey(0), (2, lat, lat, 4), jnp.float32)
    c = {
        "c_txt": jnp.zeros((2, 77, 1024), jnp.bfloat16),
        "c_img": jnp.zeros((2, lat, lat, 4), jnp.float32),
    }
    t = jnp.full((2,), 500.0)

    @jax.jit
    def loop(params, x):
        # params MUST be an argument: closing over them bakes 2.4 GB of
        # weights into the program as constants (and breaks remote compile)
        def body(i, acc):
            if use_control:
                eps = cldm(params, acc, t, c, control_scales=1.0)
            else:  # UNet only — isolates the ControlNet share
                eps = cldm.unet.apply(
                    params["unet"], acc, t, c["c_txt"], control=None
                )
            return acc + 0.001 * eps

        return jax.lax.fori_loop(0, N_INNER, body, x)

    s = float(jnp.sum(loop(params, x)))  # compile
    t0 = time.time()
    s = float(jnp.sum(loop(params, x)))
    per = (time.time() - t0) / N_INNER
    print(f"{label:42s} {per * 1e3:8.2f} ms/step  (checksum {s:.2f})")
    return per


def main():
    import diffbir_tpu.models.unet as unet_mod
    import diffbir_tpu.models.layers as layers_mod

    print(f"# device: {jax.devices()[0]}")
    cldm = ControlLDM.sd21(dtype=jnp.bfloat16)
    lat = SIZE // 8
    params = _bf16(
        jax.jit(cldm.init_params, static_argnums=1)(jax.random.PRNGKey(0), (lat, lat))
    )

    if "--flash_threshold_sweep" in sys.argv:
        # Settle the dispatch-threshold question at the STEP level (the
        # microbench wobbles session-to-session at the 256/1024 margins —
        # TPU_RUNBOOK_r4.json bench_attention_packed note). Each threshold
        # re-traces because time_step builds a fresh jit per call and
        # attention() reads the env at trace time.
        for thr in ("4096", "1024", "256"):
            os.environ["DIFFBIR_TPU_FLASH_MIN_SELF"] = thr
            time_step(cldm, params, f"flash min-self-tokens = {thr}")
        os.environ.pop("DIFFBIR_TPU_FLASH_MIN_SELF", None)
        return

    full = time_step(cldm, params, "full step (unet+controlnet)")
    no_cn = time_step(cldm, params, "no controlnet", use_control=False)
    print(f"{'-> controlnet share':42s} {(full - no_cn) * 1e3:8.2f} ms")

    st_call = unet_mod.SpatialTransformer.__call__

    def st_identity(self, x, context):
        return x

    with patched(unet_mod.SpatialTransformer, "__call__", st_identity):
        no_st = time_step(cldm, params, "spatial transformers -> identity")
    print(f"{'-> transformer share':42s} {(full - no_st) * 1e3:8.2f} ms")

    import flax.linen as nn

    class GNAffine(nn.Module):
        """Same param tree as GroupNorm32, stats removed (affine only)."""

        num_groups: int = 32
        eps: float = 1e-5
        cross_batch: bool = False

        @nn.compact
        def __call__(self, x):
            cch = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (cch,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (cch,), jnp.float32)
            return x * scale.astype(x.dtype) + bias.astype(x.dtype)

    with patched(unet_mod, "GroupNorm32", GNAffine):
        no_gn = time_step(cldm, params, "groupnorm stats -> affine only")
    print(f"{'-> gn-stats share':42s} {(full - no_gn) * 1e3:8.2f} ms")

    def attn_v(q, k, v, mask=None, bias=None, impl=None):
        return v[:, : q.shape[1]] if v.shape[1] >= q.shape[1] else jnp.broadcast_to(
            v[:, :1], q.shape
        )

    with patched(unet_mod, "attention", attn_v):
        no_attn = time_step(cldm, params, "attention -> passthrough")
    print(f"{'-> attention share':42s} {(full - no_attn) * 1e3:8.2f} ms")

    real_attn = unet_mod.attention

    def self_pass(q, k, v, mask=None, bias=None, impl=None):
        if k.shape[1] == q.shape[1]:  # self-attention stubbed, cross real
            return attn_v(q, k, v)
        return real_attn(q, k, v, mask=mask, bias=bias, impl=impl)

    def cross_pass(q, k, v, mask=None, bias=None, impl=None):
        if k.shape[1] != q.shape[1]:  # cross-attention stubbed, self real
            return attn_v(q, k, v)
        return real_attn(q, k, v, mask=mask, bias=bias, impl=impl)

    with patched(unet_mod, "attention", self_pass):
        no_self = time_step(cldm, params, "self-attn -> passthrough")
    print(f"{'-> self-attn share':42s} {(full - no_self) * 1e3:8.2f} ms")

    with patched(unet_mod, "attention", cross_pass):
        no_cross = time_step(cldm, params, "cross-attn -> passthrough")
    print(f"{'-> cross-attn share':42s} {(full - no_cross) * 1e3:8.2f} ms")

    def attn_xla(q, k, v, mask=None, bias=None, impl=None):
        return real_attn(q, k, v, mask=mask, bias=bias, impl="xla")

    with patched(unet_mod, "attention", attn_xla):
        all_xla = time_step(cldm, params, "attention impl=xla (no flash)")
    print(f"{'-> flash-dispatch win':42s} {(all_xla - full) * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
