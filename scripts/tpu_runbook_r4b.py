"""Round-4 session-2 TPU measurement runbook (hoist validation + artifacts).

Same safety rules as scripts/tpu_runbook.py: cheap probe first, generous
timeouts, a timeout aborts the rest (a killed TPU process can wedge the
remote chip). Results append to TPU_RUNBOOK_r4b.json incrementally,
decision-critical steps first.

Phases:
  A (default): probe, bench.py (hoist ON, no fused A/B), bench.py
     DIFFBIR_TPU_HOIST=0 A/B, profile_step_ablation.
  B: evidence artifacts — quant_quality (QUANT_QUALITY.json), bench_turbo,
     bench_highres, bench_train_step (hoist does not affect training; run
     only if requested), fidelity dry-run (random-init, bucket 512),
     bench_llava int8-vs-bf16.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable

BASE_ENV = dict(os.environ)
BASE_ENV["PYTHONPATH"] = "/root/.axon_site"

OUT = os.path.join(REPO, "TPU_RUNBOOK_r4b.json")


def load():
    if os.path.exists(OUT):
        with open(OUT) as f:
            return json.load(f)
    return {"round": "4b", "steps": []}


def step(name, argv, env=None, timeout=1800):
    e = dict(BASE_ENV)
    if env:
        e.update(env)
    t0 = time.time()
    try:
        p = subprocess.run(
            argv, cwd=REPO, env=e, timeout=timeout,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        rc, out, timed_out = p.returncode, p.stdout, False
    except subprocess.TimeoutExpired as exc:
        rc, timed_out = -1, True
        out = (exc.stdout or b"").decode() if isinstance(exc.stdout, bytes) else (exc.stdout or "")
    dt = time.time() - t0
    tail = "\n".join(out.strip().splitlines()[-30:])
    print(f"\n===== {name} (rc={rc}, {dt:.0f}s{', TIMEOUT' if timed_out else ''}) =====")
    print(tail, flush=True)
    return {"name": name, "rc": rc, "seconds": round(dt, 1),
            "timed_out": timed_out, "env": env or {}, "tail": tail}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="A", choices=["A", "B", "C", "D"])
    args = ap.parse_args()

    data = load()
    results = data["steps"]

    probe = step(
        "probe",
        [PY, "-c",
         "import jax, jax.numpy as jnp; x=jnp.ones((1024,1024),jnp.bfloat16);"
         "print('PROBE_OK', float(jnp.sum((x@x).astype(jnp.float32))))"],
        timeout=570,
    )
    results.append(probe)
    ok = probe["rc"] == 0 and "PROBE_OK" in probe["tail"]

    def flush():
        with open(OUT, "w") as f:
            json.dump(data, f, indent=1)

    flush()
    if not ok:
        print("!! probe failed — aborting (chip/tunnel down)")
        return 1

    if args.phase == "A":
        plan = [
            ("bench_hoist", [PY, "bench.py"], {"BENCH_AB": "0"}, 1800),
            ("bench_nohoist", [PY, "bench.py"],
             {"BENCH_AB": "0", "DIFFBIR_TPU_HOIST": "0"}, 1800),
            ("profile_step_ablation",
             [PY, "scripts/profile_step_ablation.py"], None, 2400),
        ]
    elif args.phase == "C":
        # step-level flash-dispatch threshold sweep (new knob), then the
        # headline at the sweep's winner is measured manually via bench.py.
        plan = [
            ("flash_threshold_sweep",
             [PY, "scripts/profile_step_ablation.py",
              "--flash_threshold_sweep"], None, 2400),
        ]
    elif args.phase == "D":
        # The two phase-B artifacts that never ran, with effectively
        # unbounded timeouts: a fired subprocess timeout kills the TPU
        # process mid-run and can wedge the remote chip for hours
        # (CLAUDE.md), and the fidelity dry-run compiles up to 7 distinct
        # full-pipeline programs (~500 s each cold).
        plan = [
            # backend parity of the wide-head/ragged flash paths BEFORE
            # betting hours of chip time on the fidelity run (Mosaic
            # backend-only failures are a demonstrated risk: the int4
            # scale-slice bug passed interpret + AOT lowering)
            ("flash_wide_parity",
             [PY, "scripts/check_flash_wide_chip.py"], None, 1800),
            ("fidelity_dryrun",
             [PY, "scripts/fidelity_gate.py", "--dryrun",
              "--size_bucket", "512",
              "--input", "/root/reference/inputs/real47"], None, 36000),
            # tiny-shape backend check of the int4/int8 decode kernels
            # (same rationale as flash_wide_parity) before the 7B bench
            # spends ~30 min on synthetic-weight generation + transfers
            ("bench_llava_tiny",
             [PY, "scripts/bench_llava.py", "--new", "4",
              "--prompt_len", "64", "--layers", "2", "--dim", "256"],
             None, 3600),
            ("bench_llava_quant", [PY, "scripts/bench_llava.py"], None, 14400),
        ]
    else:
        plan = [
            ("quant_quality", [PY, "scripts/quant_quality.py"], None, 5400),
            ("bench_turbo", [PY, "scripts/bench_turbo.py"], None, 2400),
            ("bench_highres", [PY, "scripts/bench_highres.py"], None, 2400),
            ("fidelity_dryrun",
             [PY, "scripts/fidelity_gate.py", "--dryrun",
              "--size_bucket", "512",
              "--input", "/root/reference/inputs/real47"], None, 7200),
            ("bench_llava_quant", [PY, "scripts/bench_llava.py"], None, 2400),
        ]

    done = {r["name"] for r in results
            if r.get("rc") == 0 and not r.get("timed_out")}
    for name, argv, env, to in plan:
        if name in done:
            print(f"===== {name}: already recorded ok, skipping =====")
            continue
        r = step(name, argv, env=env, timeout=to)
        results.append(r)
        flush()
        if r["timed_out"]:
            print("!! step timed out — chip may be wedged; aborting runbook")
            break

    print(f"\nwrote {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
