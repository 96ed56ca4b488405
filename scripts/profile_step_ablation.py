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
TINY = os.environ.get("BENCH_TINY", "0") == "1"  # CPU smoke of every flag path
N_INNER = 10  # chained steps inside one jit to hide dispatch latency
CTX_DIM = 64 if TINY else 1024


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
        "c_txt": jnp.zeros((2, 77, CTX_DIM), jnp.bfloat16),
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


def analyze_perfetto(path):
    """Device-track utilization/gap analysis of a JAX Chrome/perfetto JSON
    trace (plugins/profile/<run>/perfetto_trace.json.gz). Answers the one
    question the ablation can't: how much of the step is the device IDLE
    (scheduling gaps) vs executing ops."""
    import gzip
    import json as _json
    from collections import defaultdict

    try:
        op = gzip.open if path.endswith(".gz") else open
        with op(path, "rb") as f:
            data = _json.loads(f.read().decode())
    except Exception as e:  # binary protobuf perfetto -> skip gracefully
        print(f"trace parse failed ({e}); inspect {path} in perfetto UI",
              flush=True)
        return
    events = data.get("traceEvents", data if isinstance(data, list) else [])
    # map pid/tid -> name to find the TPU device op track
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") in ("process_name", "thread_name"):
            names[(e.get("pid"), e.get("tid"))] = e["args"].get("name", "")
            names[(e.get("pid"), None)] = names.get((e.get("pid"), None), "") \
                or (e["args"].get("name", "") if e["name"] == "process_name" else "")
    tracks = defaultdict(list)
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            tracks[(e.get("pid"), e.get("tid"))].append(e)
    for key, evs in sorted(tracks.items(), key=lambda kv: -len(kv[1])):
        pname = names.get((key[0], None), "")
        tname = names.get(key, "")
        label = f"{pname}/{tname}".lower()
        if not ("tpu" in label or "xla" in label or "device" in label):
            continue
        evs.sort(key=lambda e: e["ts"])
        t0, t1 = evs[0]["ts"], max(e["ts"] + e["dur"] for e in evs)
        busy = 0.0
        cur_end = t0
        gaps = []
        for e in evs:
            s, d = e["ts"], e["dur"]
            if s > cur_end:
                gaps.append((cur_end, s - cur_end))
            busy += d
            cur_end = max(cur_end, s + d)
        span = t1 - t0
        gaps.sort(key=lambda g: -g[1])
        by_op = defaultdict(float)
        for e in evs:
            by_op[e.get("name", "?")[:60]] += e["dur"]
        print(f"track {pname}/{tname}: span {span/1e3:.2f} ms, busy "
              f"{busy/1e3:.2f} ms ({100*busy/max(span,1):.1f}%), "
              f"{len(evs)} events, top gaps (us): "
              f"{[round(g[1],1) for g in gaps[:8]]}", flush=True)
        for op_name, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:20]:
            print(f"    {dur/1e3:8.3f} ms  {op_name}", flush=True)


def main():
    import diffbir_tpu.models.unet as unet_mod
    import diffbir_tpu.models.layers as layers_mod

    print(f"# device: {jax.devices()[0]}")
    cldm = (ControlLDM.tiny(dtype=jnp.bfloat16) if TINY
            else ControlLDM.sd21(dtype=jnp.bfloat16))
    lat = SIZE // 8
    params = _bf16(
        jax.jit(cldm.init_params, static_argnums=1)(jax.random.PRNGKey(0), (lat, lat))
    )

    if "--flash_bq_sweep" in sys.argv:
        # r4 swept BQ/BK per-call at 2048/1024 only; VERDICT r4 asks for the
        # STEP-level A/B at the >=2048-token sites (grid/pipelining context
        # differs from the microbench — the min-self lesson).
        for bq, bk in ((2048, 1024), (1024, 1024), (2048, 2048),
                       (1024, 512), (512, 512)):
            os.environ["DIFFBIR_TPU_FLASH_BQ"] = str(bq)
            os.environ["DIFFBIR_TPU_FLASH_BK"] = str(bk)
            time_step(cldm, params, f"flash BQ={bq} BK={bk}")
        os.environ.pop("DIFFBIR_TPU_FLASH_BQ", None)
        os.environ.pop("DIFFBIR_TPU_FLASH_BK", None)
        return

    if "--ffn_ablation" in sys.argv:
        # the ~7.5 ms transformer-minus-attention share has had zero
        # dedicated experiments (VERDICT r4 weak #1) — split it:
        # FFN (GEGLU+proj matmuls), LayerNorms, attn out-proj.
        full = time_step(cldm, params, "full step (unet+controlnet)")

        def ffn_zero(self, x):
            return x * 0.0  # residual add becomes identity; no param reads

        with patched(unet_mod.FeedForward, "__call__", ffn_zero):
            no_ffn = time_step(cldm, params, "feedforward -> zero")
        print(f"{'-> ffn share':42s} {(full - no_ffn) * 1e3:8.2f} ms")

        ln_call = layers_mod.LayerNormFp32.__call__

        def ln_id(self, x):
            return x

        with patched(layers_mod.LayerNormFp32, "__call__", ln_id), \
                patched(unet_mod, "LayerNormFp32", layers_mod.LayerNormFp32):
            no_ln = time_step(cldm, params, "layernorms -> identity")
        print(f"{'-> layernorm share':42s} {(full - no_ln) * 1e3:8.2f} ms")

        # fused GEGLU-MLP Pallas kernel A/B (ops/fused_ffn.py; opt-in env
        # read at trace time — each time_step builds a fresh jit)
        os.environ["DIFFBIR_TPU_FUSED_FFN"] = "1"
        fused = time_step(cldm, params, "fused-ffn kernel (pallas)")
        os.environ.pop("DIFFBIR_TPU_FUSED_FFN", None)
        print(f"{'-> fused-ffn delta (neg = win)':42s} "
              f"{(fused - full) * 1e3:8.2f} ms")

        # GEGLU nonlinearity only (keep both matmuls): gelu -> identity.
        # Patch the nn.gelu BINDING inside unet (GEGLU is its only gelu
        # call site) — patching a @nn.compact method after class creation
        # breaks flax's scope binding (params land in the parent scope).
        with patched(unet_mod.nn, "gelu",
                     lambda x, approximate=False: x):
            no_gelu = time_step(cldm, params, "geglu gelu -> mul only")
        print(f"{'-> gelu share':42s} {(full - no_gelu) * 1e3:8.2f} ms")

        # SiLU share (ResBlock GN->silu pairs + temb MLPs): sigmoid is the
        # same VPU-transcendental class the gelu win came from
        with patched(unet_mod.nn, "silu", lambda x: x):
            no_silu = time_step(cldm, params, "silu -> identity")
        print(f"{'-> silu share':42s} {(full - no_silu) * 1e3:8.2f} ms")
        # hard-silu approximation (x * relu6(x+3)/6): no transcendental
        with patched(unet_mod.nn, "silu", unet_mod.nn.hard_silu):
            hard = time_step(cldm, params, "silu -> hard_silu")
        print(f"{'-> hard-silu delta (neg = win)':42s} "
              f"{(hard - full) * 1e3:8.2f} ms")
        return

    if "--trace" in sys.argv:
        # jax.profiler timeline through the axon tunnel (VERDICT r4 2a —
        # never captured). Perfetto trace -> device-track gap analysis.
        logdir = "/tmp/diffbir_trace"
        import glob
        import shutil

        shutil.rmtree(logdir, ignore_errors=True)
        lat = SIZE // 8
        x = jax.random.normal(jax.random.PRNGKey(0), (2, lat, lat, 4), jnp.float32)
        c = {"c_txt": jnp.zeros((2, 77, CTX_DIM), jnp.bfloat16),
             "c_img": jnp.zeros((2, lat, lat, 4), jnp.float32)}
        t = jnp.full((2,), 500.0)

        @jax.jit
        def loop(params, x):
            def body(i, acc):
                return acc + 0.001 * cldm(params, acc, t, c, control_scales=1.0)
            return jax.lax.fori_loop(0, N_INNER, body, x)

        float(jnp.sum(loop(params, x)))  # compile outside the trace
        jax.profiler.start_trace(logdir, create_perfetto_trace=True)
        float(jnp.sum(loop(params, x)))
        jax.profiler.stop_trace()
        files = glob.glob(os.path.join(logdir, "**", "*"), recursive=True)
        for f in sorted(files):
            if os.path.isfile(f):
                print(f"  {os.path.getsize(f):>10d}  {f}", flush=True)
        pt = [f for f in files if f.endswith(".perfetto-trace")
              or f.endswith("trace.json.gz")]
        if pt:
            analyze_perfetto(pt[0])
        else:
            print("no perfetto trace produced (axon tunnel limitation?)",
                  flush=True)
        return

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
