"""Stage-1 SwinIR trainer entry point.

Behavioral parity target: /root/reference/train_stage1.py:21-254 — MSE(sum)
regression lq->gt, AdamW, periodic val (PSNR), tensorboard scalars + image
grids, checkpoints every ckpt_every.

TPU-native: ``Mesh(("data","tensor"))`` data parallelism (XLA grad
allreduce), orbax checkpoints with optimizer + step state (unlike the
reference, resume restores the full training state), host data workers.
"""

import argparse
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--platform", default=None, help="override jax platform")
    args = ap.parse_args()

    import jax

    from diffbir_tpu.parallel.distributed import maybe_initialize_distributed

    from diffbir_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # multi-host: DIFFBIR_COORDINATOR/NUM_PROCESSES/PROCESS_ID env (or
    # DIFFBIR_AUTO_DISTRIBUTED=1 on a TPU pod slice); must precede backend init
    maybe_initialize_distributed()

    import numpy as np
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from diffbir_tpu import config as cfglib
    from diffbir_tpu import dataset as _ds  # noqa: F401 (registry)
    from diffbir_tpu.parallel.distributed import (
        batch_pspec, is_main_process, make_global_mesh, process_seed,
        shard_global_batch,
    )
    from diffbir_tpu.parallel.mesh import make_mesh
    from diffbir_tpu.train import stage1

    cfg = cfglib.load_yaml(args.config)
    tcfg = cfg["train"]
    os.makedirs(tcfg["exp_dir"], exist_ok=True)

    if jax.process_count() > 1:
        mesh = make_global_mesh()
        n_data = mesh.shape["dcn"] * mesh.shape["data"]
    else:
        mesh = make_mesh(n_data=tcfg.get("n_data"))
        n_data = mesh.shape["data"]
    main = is_main_process()
    if main:
        print(f"mesh: {dict(mesh.shape)}")

    model = cfglib.instantiate(cfg["model"]["swinir"])
    ds = cfglib.instantiate(cfg["dataset"]["train"])
    val_ds = cfglib.instantiate(cfg["dataset"]["val"]) if "val" in cfg["dataset"] else None
    bs = tcfg["batch_size"]
    assert bs % n_data == 0, "batch size must divide the data mesh"

    rng = jax.random.PRNGKey(tcfg.get("seed", 231))
    sample = ds[0]
    init_x = jnp.zeros((1,) + sample["lq"].shape, jnp.float32)
    params = jax.jit(model.init)(rng, init_x)
    optimizer = stage1.make_optimizer(float(tcfg["learning_rate"]))
    state = stage1.init_state(params, optimizer)

    ckpt_mgr = ocp.CheckpointManager(
        os.path.abspath(os.path.join(tcfg["exp_dir"], "checkpoints")),
        options=ocp.CheckpointManagerOptions(max_to_keep=3),
    )
    if tcfg.get("resume"):
        state = ckpt_mgr.restore(int(tcfg["resume"]), args=ocp.args.StandardRestore(state))
        if main:
            print(f"resumed from step {int(state.step)}")

    rep = NamedSharding(mesh, P())
    dat = NamedSharding(mesh, batch_pspec(mesh))
    state = jax.device_put(state, rep)
    train_step = jax.jit(stage1.make_train_step(model.apply, optimizer),
                         donate_argnums=(0,))
    val_step = jax.jit(stage1.make_val_step(model.apply))

    writer = None
    if main:
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(os.path.join(tcfg["exp_dir"], "tb"))
        except ImportError:
            pass

    assert bs % jax.process_count() == 0
    bs_local = bs // jax.process_count()
    seed = process_seed(tcfg.get("seed", 231))  # per-process data stream
    native = bool(tcfg.get("native_loader", False))
    if native:
        from diffbir_tpu.dataset.native_loader import native_available

        native = native_available()
        if main:
            print(f"native C++ data loader: {'on' if native else 'unavailable, python fallback'}")
    if native:
        it = ds.as_iterator(bs_local, seed=seed, native=True)
    else:
        it = ds.as_iterator(bs_local, seed=seed)
    step = int(state.step)
    t0 = time.time()
    while step < tcfg["train_steps"]:
        batch = next(it)
        # gt/lq to [0,1] for regression (dataset gt is [-1,1])
        dev_batch = shard_global_batch(
            mesh, {"gt": (batch["gt"] + 1) / 2, "lq": batch["lq"]}, dat.spec
        )
        state, metrics = train_step(state, dev_batch)
        step += 1
        if step % tcfg["log_every"] == 0:
            loss = float(metrics["loss"])
            ips = tcfg["log_every"] * bs / (time.time() - t0)
            t0 = time.time()
            if main:
                print(f"step {step}: loss={loss:.1f} images/s={ips:.1f}")
            if writer:
                writer.add_scalar("train/loss", loss, step)
        if val_ds is not None and step % tcfg["val_every"] == 0:
            # average over up to val_batches batches (was: the same first
            # batch every time, which hid overfitting to the rest of the set).
            # every process walks the same val stream; val_step is a global
            # program so all must participate (metrics end up identical)
            vit = val_ds.as_iterator(bs_local, shuffle=False)
            psnrs = []
            for _ in range(int(tcfg.get("val_batches", 8))):
                try:
                    vbatch = next(vit)
                except StopIteration:
                    break
                vm = val_step(
                    state.params,
                    shard_global_batch(
                        mesh, {"gt": (vbatch["gt"] + 1) / 2, "lq": vbatch["lq"]}, dat.spec
                    ),
                )
                psnrs.append(float(vm["psnr"]))
            vpsnr = float(np.mean(psnrs)) if psnrs else float("nan")
            if main:
                print(f"step {step}: val psnr={vpsnr:.2f} ({len(psnrs)} batches)")
            if writer:
                writer.add_scalar("val/psnr", vpsnr, step)
        if step % tcfg["ckpt_every"] == 0:
            ckpt_mgr.save(step, args=ocp.args.StandardSave(state))
            if main:
                print(f"saved checkpoint @ {step}")
    if step not in ckpt_mgr.all_steps():  # avoid StepAlreadyExistsError when
        ckpt_mgr.save(step, args=ocp.args.StandardSave(state))  # loop ended on ckpt_every
    ckpt_mgr.wait_until_finished()


if __name__ == "__main__":
    main()
