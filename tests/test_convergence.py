"""CI-runnable convergence test (marked slow; VERDICT r2 next-step #1).

The full gate is ``scripts/convergence_gate.py`` (emits CONVERGENCE.json at
the repo root; stage-1 SwinIR regression AND stage-2 ControlNet diffusion
through fsdp+accum+orbax-resume). This shortened stage-1 run proves in CI
that the composed path dataset -> degradation -> prefetch -> jitted train
step -> optimizer still *learns* — the reference's de-facto training QA
(/root/reference/train_stage1.py:166-234).

Opt-in via DIFFBIR_RUN_SLOW=1 (about a minute on the 1-vCPU CI box).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

pytestmark = pytest.mark.slow


@pytest.mark.skipif(
    not os.environ.get("DIFFBIR_RUN_SLOW"),
    reason="slow convergence run; set DIFFBIR_RUN_SLOW=1 to enable",
)
def test_stage1_learns(tmp_path):
    from convergence_gate import run_stage1

    res = run_stage1(str(tmp_path), steps=150)
    # Thresholds are looser than the 400-step gate's (3.0 / +3 dB).
    assert res["loss_ratio"] >= 2.0, res
    assert res["val_psnr_after"] >= res["val_psnr_before"] + 2.0, res
