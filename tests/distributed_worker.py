"""Worker for tests/test_distributed.py: one process of a 2-process
jax.distributed launch on CPU devices.

Runs one FSDP-sharded AdamW step of a small MLP over the global
(dcn, data, tensor) mesh and writes {loss, param_sum, mesh_shape,
is_main} to --out. Data: each rank contributes a deterministic local
shard (seeded by rank) so the parent can recompute the global batch.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # axon plugin ignores the env var
    jax.config.update("jax_compilation_cache_dir", "/tmp/diffbir_tpu_jax_cache")

    from diffbir_tpu.parallel.distributed import (
        gather_to_host, is_main_process, make_global_mesh,
        maybe_initialize_distributed, shard_global_batch, sync_processes,
    )

    assert maybe_initialize_distributed(), "env contract not set"
    pid = jax.process_index()

    import numpy as np
    import jax.numpy as jnp
    import optax

    from diffbir_tpu.parallel.fsdp import fsdp_shard_params, fsdp_sharding_tree

    mesh = make_global_mesh()

    # -- tiny MLP + AdamW ------------------------------------------------- #
    k = jax.random.PRNGKey(0)  # same init on every process
    w1 = jax.random.normal(k, (16, 64)) * 0.1
    w2 = jax.random.normal(jax.random.fold_in(k, 1), (64, 4)) * 0.1
    params = {"w1": w1, "w2": w2}
    opt = optax.adamw(1e-2)
    opt_state = opt.init(params)

    p_sh = fsdp_sharding_tree(mesh, params)
    o_sh = fsdp_sharding_tree(mesh, opt_state)
    params = fsdp_shard_params(mesh, params)
    opt_state = fsdp_shard_params(mesh, opt_state)

    def loss_fn(p, batch):
        h = jnp.tanh(batch["x"] @ p["w1"])
        out = h @ p["w2"]
        return jnp.mean((out - batch["y"]) ** 2)

    @jax.jit
    def step(p, o, batch):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch)
        upd, o = opt.update(grads, o, p)
        return optax.apply_updates(p, upd), o, loss

    step = jax.jit(step.__wrapped__, out_shardings=(p_sh, o_sh, None))

    # -- per-rank local data, globally = concat(rank0, rank1) ------------- #
    g = np.random.default_rng(100 + pid)
    local = {"x": g.standard_normal((4, 16), dtype=np.float32),
             "y": g.standard_normal((4, 4), dtype=np.float32)}
    batch = shard_global_batch(mesh, local)
    assert batch["x"].shape[0] == 4 * jax.process_count()

    params, opt_state, loss = step(params, opt_state, batch)
    host = gather_to_host(mesh, params)
    sync_processes("done")

    with open(args.out, "w") as f:
        json.dump({
            "process": pid,
            "n_processes": jax.process_count(),
            "mesh_shape": dict(mesh.shape),
            "is_main": is_main_process(),
            "loss": float(loss),
            "param_sum": float(sum(np.abs(v).sum() for v in host.values())),
        }, f)


if __name__ == "__main__":
    main()
