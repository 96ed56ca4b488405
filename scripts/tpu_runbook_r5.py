"""Round-5 TPU measurement runbook (VERDICT r4 task list).

Safety rules (CLAUDE.md): cheap probe first; a fired timeout can wedge the
remote chip, so decision-critical long steps get effectively-unbounded
timeouts and the runbook aborts on any timeout. Results append to
TPU_RUNBOOK_r5.json incrementally.

Phases (run one at a time, chip is serial):
  A: probe -> stress_flash (per-shape subprocess isolation at the REAL
     fidelity bucket shapes; VERDICT #1 prereq) -> fidelity dry-run.
  B: perf experiments in VERDICT order — profiler trace, flash BQ/BK
     step-level sweep, FFN ablation, then the headline bench.
  C: stale-number refresh — 1024^2 tiled ttb=1/3, batch-4 throughput,
     fused-ResBlock single-best-site bisect, 8x SR envelope.
  D: LLaVA 7B-shaped quant bench (tiny backend check first).
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

OUT = os.path.join(REPO, "TPU_RUNBOOK_r5.json")


def load():
    if os.path.exists(OUT):
        with open(OUT) as f:
            return json.load(f)
    return {"round": 5, "steps": []}


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
    tail = "\n".join(out.strip().splitlines()[-40:])
    print(f"\n===== {name} (rc={rc}, {dt:.0f}s{', TIMEOUT' if timed_out else ''}) =====")
    print(tail, flush=True)
    return {"name": name, "rc": rc, "seconds": round(dt, 1),
            "timed_out": timed_out, "env": env or {}, "tail": tail}


PHASES = {
    "A": [
        ("stress_flash", [PY, "scripts/stress_flash_buckets.py"], None, 14400),
        ("fidelity_dryrun",
         [PY, "scripts/fidelity_gate.py", "--dryrun", "--size_bucket", "512",
          "--input", "/root/reference/inputs/real47"], None, 36000),
    ],
    "B": [
        ("profile_trace",
         [PY, "scripts/profile_step_ablation.py", "--trace"], None, 2400),
        ("flash_bq_sweep",
         [PY, "scripts/profile_step_ablation.py", "--flash_bq_sweep"],
         None, 3600),
        ("ffn_ablation",
         [PY, "scripts/profile_step_ablation.py", "--ffn_ablation"],
         None, 3600),
        ("bench_headline", [PY, "bench.py"], {"BENCH_AB": "0"}, 1800),
        ("bench_fused_ffn", [PY, "bench.py"],
         {"BENCH_AB": "0", "DIFFBIR_TPU_FUSED_FFN": "1"}, 1800),
    ],
    "C": [
        ("bench_highres_ttb1",
         [PY, "scripts/bench_highres.py", "--tiles_per_batch", "1"],
         None, 2400),
        ("bench_highres_ttb3",
         [PY, "scripts/bench_highres.py", "--tiles_per_batch", "3"],
         None, 2400),
        ("bench_batch4", [PY, "bench.py"],
         {"BENCH_AB": "0", "BENCH_IMG_BATCH": "4"}, 2400),
        # fused-ResBlock bisect (VERDICT #6): single best site only
        # (MIN_WIN 1.7 -> just the x1.70 (2560,1280,256) site), then the
        # two-site config — separates boundary cost from noisy tables.
        ("bench_fused_min17", [PY, "bench.py"],
         {"BENCH_AB": "0", "BENCH_FUSED": "1",
          "DIFFBIR_TPU_FUSED_MIN_WIN": "1.7"}, 2400),
        ("bench_fused_min14", [PY, "bench.py"],
         {"BENCH_AB": "0", "BENCH_FUSED": "1",
          "DIFFBIR_TPU_FUSED_MIN_WIN": "1.4"}, 2400),
        ("sr8x_envelope", [PY, "scripts/bench_8x_sr.py"], None, 14400),
    ],
    "D": [
        ("bench_llava_tiny",
         [PY, "scripts/bench_llava.py", "--new", "4", "--prompt_len", "64",
          "--layers", "2", "--dim", "256"], None, 3600),
        ("bench_llava_7b", [PY, "scripts/bench_llava.py"], None, 14400),
    ],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="A", choices=sorted(PHASES))
    ap.add_argument("--skip_probe", action="store_true")
    args = ap.parse_args()

    data = load()
    results = data["steps"]

    def flush():
        with open(OUT, "w") as f:
            json.dump(data, f, indent=1)

    if not args.skip_probe:
        probe = step(
            "probe",
            [PY, "-u", "-c",
             "import jax, jax.numpy as jnp; x=jnp.ones((1024,1024),jnp.bfloat16);"
             "print('PROBE_OK', float(jnp.sum((x@x).astype(jnp.float32))))"],
            timeout=570,
        )
        results.append(probe)
        flush()
        if probe["rc"] != 0 or "PROBE_OK" not in probe["tail"]:
            print("!! probe failed — aborting (chip/tunnel down or wedged)")
            return 1

    done = {r["name"] for r in results
            if r.get("rc") == 0 and not r.get("timed_out")}
    for name, argv, env, to in PHASES[args.phase]:
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
