"""One-command fidelity gate: the BASELINE.md "within 0.5 dB on real47" check.

Weights-gated driver around scripts/eval_real47.py (VERDICT r1 next #2b):
the moment checkpoints land under weights/, this single command restores
real47 with the paper settings (50-step spaced, cfg 4.0, v2.1) and emits
FIDELITY.json with the PSNR-vs-torch-reference table.

Usage:
  PYTHONPATH=/root/.axon_site python scripts/fidelity_gate.py \
      [--ref_outputs DIR]   # dir of torch-reference restorations to PSNR against

Without --ref_outputs it still runs the restoration (producing
results/real47/) so outputs can be compared offline; the 0.5 dB verdict
requires the torch outputs.
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REQUIRED = ["swinir_realesrgan", "sd_v2.1_zsnr", "v2.1"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/reference/inputs/real47")
    ap.add_argument("--output", default=os.path.join(ROOT, "results", "real47"))
    ap.add_argument("--ref_outputs", default=None)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--size_bucket", type=int, default=0,
                    help="static-shape bucketing passed through to "
                    "eval_real47 (31 distinct real47 sizes -> ~25 XLA "
                    "programs at the exact x64 padding vs 7 at bucket=512). "
                    "Keep 0 for the fidelity verdict; use 512 for --dryrun")
    ap.add_argument("--resume", action="store_true",
                    help="forward --skip_existing to eval_real47 (crash "
                    "recovery: only restore missing outputs)")
    ap.add_argument("--dryrun", action="store_true",
                    help="run the full harness with RANDOM-INIT weights "
                    "(DIFFBIR_TPU_RANDOM_INIT=1): proves the one-command "
                    "gate executes end-to-end before checkpoints land; "
                    "outputs are garbage and no PSNR verdict is produced")
    args = ap.parse_args()

    sys.path.insert(0, ROOT)
    from diffbir_tpu.inference.pretrained_models import MODELS, weights_dir

    if args.dryrun:
        os.environ["DIFFBIR_TPU_RANDOM_INIT"] = "1"
    missing = []
    for name in REQUIRED if not args.dryrun else []:
        fname = os.path.basename(MODELS[name].split("?")[0])
        if not os.path.exists(os.path.join(weights_dir(), fname)):
            missing.append(f"{name} ({fname})")
    if missing:
        print("FIDELITY GATE BLOCKED — place these checkpoints under "
              f"{weights_dir()}:")
        for m in missing:
            print(f"  - {m}")
        sys.exit(2)
    if not os.path.isdir(args.input):
        print(f"FIDELITY GATE BLOCKED — input testset missing: {args.input}")
        sys.exit(2)

    cmd = [
        sys.executable, os.path.join(ROOT, "scripts", "eval_real47.py"),
        "--input", args.input, "--output", args.output,
        "--steps", str(args.steps), "--sampler", "spaced",
        "--cfg_scale", "4.0", "--version", "v2.1", "--upscale", "4",
        "--size_bucket", str(args.size_bucket),
    ]
    if args.resume:
        cmd += ["--skip_existing"]
    if args.ref_outputs:
        cmd += ["--ref", args.ref_outputs]
    print(" ".join(cmd), flush=True)
    t0 = time.time()
    # stream (don't capture): per-image [loop] lines must reach the console
    # the moment they print so a mid-run TPU crash names its image/program
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    captured = []
    for line in proc.stdout:
        sys.stdout.write(line)
        sys.stdout.flush()
        captured.append(line)
    rc = proc.wait()
    wall_s = round(time.time() - t0, 1)
    if rc != 0:
        raise subprocess.CalledProcessError(rc, cmd, "".join(captured))
    out_stdout = "".join(captured)

    result = {"output_dir": args.output, "steps": args.steps,
              "size_bucket": args.size_bucket, "wall_s": wall_s}
    if args.dryrun:
        # harness-exercise record only — never the fidelity verdict
        n_out = len([f for f in os.listdir(args.output) if f.endswith(".png")])
        result.update({"dryrun_random_init": True, "images_restored": n_out})
        path = os.path.join(ROOT, "FIDELITY_DRYRUN.json")
        with open(path, "w") as f:
            json.dump(result, f, indent=2)
        print(f"wrote {path} (dryrun — random weights, no PSNR verdict)")
        return
    for line in out_stdout.splitlines():
        m = re.match(
            r"PSNR vs reference outputs: ([\d.]+) dB \(Y: ([\d.]+) dB\)", line
        )
        if m:
            result["psnr_db"] = float(m.group(1))
            result["psnr_y_db"] = float(m.group(2))
            result["within_0.5db_of"] = "see BASELINE.md criterion"
    with open(os.path.join(ROOT, "FIDELITY.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {os.path.join(ROOT, 'FIDELITY.json')}")


if __name__ == "__main__":
    main()
