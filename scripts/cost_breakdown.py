"""Per-module HBM-byte attribution of one denoise step from optimized HLO.

Compiles the batch-2 CFG ControlLDM forward for the TPU backend (AOT, shape
structs only — no weights allocated), then parses the optimized HLO: every
instruction's RESULT bytes are bucketed by the flax module path in its
`op_name` metadata. Result bytes ~= HBM writes of materialized tensors,
which is the activation-round-trip currency the XLA cost analysis says the
step is bound by (CLAUDE.md: ~18.8 GB accessed / step at ~26 ms ~= the HBM
roofline). Use this to rank block-fusion targets.

    PYTHONPATH=/root/.axon_site python scripts/cost_breakdown.py
"""

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("COST_UNOPT"):
    # unopt mode never executes; keep the (possibly busy) TPU out of it —
    # the axon plugin ignores JAX_PLATFORMS, this is the supported override
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from diffbir_tpu.models.cldm import ControlLDM

SIZE = int(os.environ.get("BENCH_SIZE", 512))

DTYPE_BYTES = {
    "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
    "pred": 1, "s64": 8, "u64": 8, "f64": 8, "s16": 2, "u16": 2, "f8e4m3fn": 1,
    "f8e5m2": 1, "s4": 1, "u4": 1,
}

SHAPE_RE = re.compile(r"^\s*(?:ROOT\s+)?%?[\w.\-]+ = \(?([a-z0-9]+)\[([\d,]*)\]")
OPNAME_RE = re.compile(r'op_name="([^"]+)"')
OPCODE_RE = re.compile(r"= \(?[a-z0-9]+\[[\d,]*\][^ ]* ([a-z\-]+)\(")


def shape_bytes(dtype: str, dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dtype, 4)


def bucket_of(op_name: str) -> str:
    """Map a jax/flax scope path to a coarse component bucket."""
    # paths look like:
    #   jit(<lambda>)/UNetModel/input_blocks.4.1/transformer_blocks.0/attn1/to_q/dot_general
    p = op_name.lower()
    if "controlnet" in p:
        side = "controlnet"
    elif "unet" in p:
        side = "unet"
    else:
        side = "other"
    for pat, tag in [
        (r"attn1", "self-attn"),
        (r"attn2", "cross-attn"),
        (r"(ff/|geglu|mlp)", "ffn"),
        (r"(in_layers\.0|out_layers\.0)", "resblock-gn"),
        (r"(in_layers\.2|out_layers\.3|skip_connection)", "resblock-conv"),
        (r"emb_layers", "resblock-emb"),
        (r"(norm|groupnorm|layernorm)", "norm"),
        (r"(proj_in|proj_out)", "st-proj"),
        (r"(op\.|downsample|upsample)", "resample"),
        (r"(input_hint|zero_convs|middle_block_out)", "cn-heads"),
        (r"time_embed", "temb"),
    ]:
        if re.search(pat, p):
            return f"{side}/{tag}"
    return f"{side}/misc"


TENSOR_RE = re.compile(r"tensor<([0-9x]*)x?([a-z0-9]+)>")
LOCDEF_RE = re.compile(r'^#loc(\d+) = loc\("([^"]+)"')
LOCREF_RE = re.compile(r"loc\(#loc(\d+)\)\s*$")
OP_RE = re.compile(r"^\s*%\S+ = \"?([\w.]+)\"?")


def _tensor_bytes(dims: str, dtype: str) -> int:
    n = 1
    for d in dims.split("x"):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dtype, 4)


def unopt_report(txt: str) -> None:
    locs = {}
    for line in txt.splitlines():
        m = LOCDEF_RE.match(line)
        if m:
            locs[m.group(1)] = m.group(2)
    by_bucket = defaultdict(int)
    by_opcode = defaultdict(int)
    total = 0
    for line in txt.splitlines():
        om = OP_RE.match(line)
        if not om:
            continue
        op = om.group(1).replace("stablehlo.", "")
        if op in ("func.call", "stablehlo.constant", "constant", "func.return",
                  "call"):
            continue
        tm = TENSOR_RE.findall(line)
        if not tm:
            continue
        dims, dtype = tm[-1]  # last tensor<> on the line = result type
        b = _tensor_bytes(dims, dtype)
        lr = LOCREF_RE.search(line)
        scope = locs.get(lr.group(1), "") if lr else ""
        if scope.startswith("/"):  # bare file loc, no scope path
            scope = ""
        total += b
        by_bucket[bucket_of(scope)] += b
        by_opcode[op] += b
    print(f"\ntotal dataflow tensor bytes (pre-fusion upper bound): "
          f"{total / 1e9:.2f} GB")
    print("\n== by component bucket ==")
    for k, v in sorted(by_bucket.items(), key=lambda kv: -kv[1])[:24]:
        print(f"  {k:26s} {v / 1e9:7.3f} GB  ({100 * v / total:4.1f}%)")
    print("\n== by opcode ==")
    for k, v in sorted(by_opcode.items(), key=lambda kv: -kv[1])[:14]:
        print(f"  {k:26s} {v / 1e9:7.3f} GB  ({100 * v / total:4.1f}%)")


def main():
    cldm = ControlLDM.sd21(dtype=jnp.bfloat16)
    lat = SIZE // 8
    p_shapes = jax.eval_shape(
        lambda k: cldm.init_params(k, (lat, lat)), jax.random.PRNGKey(0)
    )
    p_shapes = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype
        ),
        p_shapes,
    )
    x = jax.ShapeDtypeStruct((2, lat, lat, 4), jnp.float32)
    t = jax.ShapeDtypeStruct((2,), jnp.float32)
    c = {
        "c_txt": jax.ShapeDtypeStruct((2, 77, 1024), jnp.bfloat16),
        "c_img": jax.ShapeDtypeStruct((2, lat, lat, 4), jnp.float32),
    }

    def step(params, x, t, c):
        return cldm(params, x, t, c, control_scales=1.0)

    lowered = jax.jit(step).lower(p_shapes, x, t, c)
    if os.environ.get("COST_UNOPT"):
        # backend-neutral: parse the UNOPTIMIZED stablehlo (pure dataflow
        # tensor sizes — an upper bound on round-trips before fusion; the
        # relative per-module ranking is what matters). No compile; the
        # debug_info locs carry the flax scope path per op.
        print("parsing unoptimized stablehlo (no compile)...", flush=True)
        return unopt_report(lowered.as_text(debug_info=True))
    else:
        print("lowering + compiling (TPU backend, AOT)...", flush=True)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        print(f"cost_analysis: {ca.get('flops', 0) / 1e12:.2f} TFLOP, "
              f"{ca.get('bytes accessed', 0) / 1e9:.2f} GB accessed", flush=True)
        hlo = compiled.as_text()
    print(f"HLO: {len(hlo) / 1e6:.1f} MB text", flush=True)

    by_bucket = defaultdict(int)
    by_opcode = defaultdict(int)
    total = 0
    for line in hlo.splitlines():
        m = SHAPE_RE.match(line)
        if not m or "= parameter(" in line or " constant(" in line:
            continue
        b = shape_bytes(m.group(1), m.group(2))
        oc = OPCODE_RE.search(line)
        opcode = oc.group(1) if oc else "?"
        if opcode in ("tuple", "get-tuple-element", "bitcast"):
            continue  # no data movement
        total += b
        on = OPNAME_RE.search(line)
        by_bucket[bucket_of(on.group(1) if on else "")] += b
        by_opcode[opcode] += b

    print(f"\ntotal materialized result bytes: {total / 1e9:.2f} GB")
    print("\n== by component bucket ==")
    for k, v in sorted(by_bucket.items(), key=lambda kv: -kv[1]):
        print(f"  {k:26s} {v / 1e9:7.3f} GB  ({100 * v / total:4.1f}%)")
    print("\n== by opcode ==")
    for k, v in sorted(by_opcode.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {k:26s} {v / 1e9:7.3f} GB  ({100 * v / total:4.1f}%)")


if __name__ == "__main__":
    main()
