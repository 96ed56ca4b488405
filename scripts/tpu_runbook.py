"""Automated TPU-return measurement runbook (round 3).

Executes the CLAUDE.md "TPU-return measurement runbook" in order, one step
at a time (single chip — steps never overlap), captures each step's output,
and writes TPU_RUNBOOK_r3.json at the repo root.

Safety rules encoded here (see CLAUDE.md):
  - A cheap 60 s matmul probe runs first; if it fails, the runbook aborts
    without touching the chip further.
  - Timeouts are generous (worst-case compile ~250-400 s after a code
    change) and a timeout ABORTS the remaining steps: a killed TPU process
    can wedge the remote chip for hours, so we never keep hammering a chip
    that just ate a kill.

Usage:  python scripts/tpu_runbook.py [--quick] [--skip-extras]
  --quick        only probe + bench.py variants (steps 1,3,4,5)
  --skip-extras  skip bench_turbo / bench_highres (steps 8)
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
    print(tail)
    return {"name": name, "rc": rc, "seconds": round(dt, 1),
            "timed_out": timed_out, "tail": tail}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip-extras", action="store_true")
    args = ap.parse_args()

    results = []

    # 1. probe — cheap matmul; abort everything if the tunnel is down/wedged
    probe = step(
        "probe",
        [PY, "-c",
         "import jax, jax.numpy as jnp; x=jnp.ones((1024,1024),jnp.bfloat16);"
         "print('PROBE_OK', float(jnp.sum((x@x).astype(jnp.float32))))"],
        timeout=570,
    )
    results.append(probe)
    ok = probe["rc"] == 0 and "PROBE_OK" in probe["tail"]

    plan = []
    if ok:
        plan.append(("bench_baseline", [PY, "bench.py"], None, 1800))
        if not args.quick:
            plan.append(("bench_fused_resblock",
                         [PY, "scripts/bench_fused_resblock.py"], None, 1800))
        plan.append(("bench_fused", [PY, "bench.py"], {"BENCH_FUSED": "1"}, 1800))
        if not args.quick:
            plan.append(("bench_train_step",
                         [PY, "scripts/bench_train_step.py"], None, 1800))
        plan.append(("bench_quant", [PY, "bench.py"], {"BENCH_QUANT": "1"}, 1800))
        plan.append(("bench_fused_quant", [PY, "bench.py"],
                     {"BENCH_FUSED": "1", "BENCH_QUANT": "1"}, 1800))
        if not args.quick:
            plan.append(("train_step_flash_bwd_xla",
                         [PY, "scripts/bench_train_step.py"],
                         {"DIFFBIR_TPU_FLASH_BWD": "xla"}, 1800))
            plan.append(("profile_step_ablation",
                         [PY, "scripts/profile_step_ablation.py"], None, 1800))
        plan.append(("bench_quant_conv", [PY, "bench.py"],
                     {"BENCH_QUANT_CONV": "1"}, 1800))
        plan.append(("bench_all_modes", [PY, "bench.py"],
                     {"BENCH_QUANT_CONV": "1", "BENCH_QUANT": "1"}, 1800))
        if not args.quick:
            if not args.skip_extras:
                plan.append(("bench_turbo", [PY, "scripts/bench_turbo.py"], None, 2400))
                plan.append(("bench_highres", [PY, "scripts/bench_highres.py"], None, 2400))

    out_path = os.path.join(REPO, "TPU_RUNBOOK_r3.json")

    def flush():
        with open(out_path, "w") as f:
            json.dump({"probe_ok": ok, "steps": results}, f, indent=1)

    flush()
    for name, argv, env, to in plan:
        r = step(name, argv, env=env, timeout=to)
        results.append(r)
        flush()
        if r["timed_out"]:
            print("!! step timed out — chip may be wedged; aborting runbook")
            break

    print(f"\nwrote {out_path}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
