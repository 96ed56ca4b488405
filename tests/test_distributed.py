"""Multi-host launch path (SURVEY §5.8; VERDICT r2 missing #3).

Launches TWO real processes with `jax.distributed.initialize` (4 virtual
CPU devices each), builds the global (dcn=2, data=4, tensor=1) mesh, runs
one FSDP-sharded AdamW step on a global batch assembled from per-process
local shards, and checks both processes agree with each other AND with a
single-process 8-device run on the concatenated batch — i.e. the multi-host
program is numerically the same training step.

Reference behavior matched: `accelerate launch` multi-rank DDP
(/root/reference/train_stage2.py:22-23,99; README.md:372,390).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def run_workers(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dist")
    port = _free_port()
    procs, outs = [], []
    for pid in range(2):
        out = str(tmp / f"p{pid}.json")
        outs.append(out)
        env = dict(os.environ)
        env.update({
            "DIFFBIR_COORDINATOR": f"127.0.0.1:{port}",
            "DIFFBIR_NUM_PROCESSES": "2",
            "DIFFBIR_PROCESS_ID": str(pid),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "JAX_PLATFORMS": "cpu",
        })
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, "--out", out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]
    return [json.load(open(o)) for o in outs]


def test_two_process_launch(run_workers):
    r0, r1 = sorted(run_workers, key=lambda r: r["process"])
    assert r0["n_processes"] == r1["n_processes"] == 2
    assert r0["mesh_shape"] == {"dcn": 2, "data": 4, "tensor": 1}
    assert r0["is_main"] and not r1["is_main"]
    # both ranks observe the identical global program results
    assert r0["loss"] == pytest.approx(r1["loss"], rel=0, abs=0)
    assert r0["param_sum"] == pytest.approx(r1["param_sum"], rel=0, abs=0)


def test_matches_single_process(run_workers):
    """The 2-process global step == a single-process step on the
    concatenated global batch (per-rank shards in dcn-major order)."""
    r0 = sorted(run_workers, key=lambda r: r["process"])[0]

    k = jax.random.PRNGKey(0)
    params = {
        "w1": jax.random.normal(k, (16, 64)) * 0.1,
        "w2": jax.random.normal(jax.random.fold_in(k, 1), (64, 4)) * 0.1,
    }
    opt = optax.adamw(1e-2)
    opt_state = opt.init(params)

    xs, ys = [], []
    for pid in range(2):
        g = np.random.default_rng(100 + pid)
        xs.append(g.standard_normal((4, 16), dtype=np.float32))
        ys.append(g.standard_normal((4, 4), dtype=np.float32))
    batch = {"x": jnp.concatenate([jnp.asarray(a) for a in xs]),
             "y": jnp.concatenate([jnp.asarray(a) for a in ys])}

    def loss_fn(p, b):
        h = jnp.tanh(b["x"] @ p["w1"])
        return jnp.mean((h @ p["w2"] - b["y"]) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params, batch)
    upd, _ = opt.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, upd)
    psum = float(sum(np.abs(np.asarray(v)).sum() for v in new_params.values()))

    assert r0["loss"] == pytest.approx(float(loss), rel=1e-5)
    assert r0["param_sum"] == pytest.approx(psum, rel=1e-5)
