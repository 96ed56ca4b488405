"""Stage-2 IRControlNet trainer entry point.

Behavioral parity target: /root/reference/train_stage2.py:20-241 — frozen SD
(unet/vae/clip) + frozen SwinIR condition; ControlNet-only AdamW; v/eps
p_losses; controlnet-only deployable checkpoint every ckpt_every; periodic
50-step SpacedSampler preview grids.

TPU-native: data mesh via jax.sharding; one jitted train step (grad psum by
XLA); orbax checkpoints: full train state for resume + controlnet-only
subtree as the deployable artifact.
"""

import argparse
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    from diffbir_tpu.parallel.distributed import maybe_initialize_distributed

    from diffbir_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # multi-host: DIFFBIR_COORDINATOR/NUM_PROCESSES/PROCESS_ID env (or
    # DIFFBIR_AUTO_DISTRIBUTED=1 on a TPU pod slice) — the `accelerate
    # launch` equivalent; must precede any backend init
    maybe_initialize_distributed()

    import numpy as np
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from diffbir_tpu import config as cfglib
    from diffbir_tpu import dataset as _ds  # noqa: F401
    from diffbir_tpu.models.cldm import ControlLDM
    from diffbir_tpu.models.tokenizer import get_tokenizer
    from diffbir_tpu.parallel.distributed import (
        batch_pspec, gather_to_host, is_main_process, make_global_mesh,
        process_seed, shard_global_batch, sync_processes,
    )
    from diffbir_tpu.parallel.mesh import make_mesh
    from diffbir_tpu.sampler import SpacedSampler
    from diffbir_tpu.schedule import Schedule
    from diffbir_tpu.train import stage2
    from diffbir_tpu.weights.convert import fill_flax_params, load_torch_state_dict
    from diffbir_tpu.inference.pretrained_models import resolve_model

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
    bs = tcfg["batch_size"]
    assert bs % n_data == 0
    assert bs % jax.process_count() == 0
    bs_local = bs // jax.process_count()
    if main:
        print(f"mesh: {dict(mesh.shape)}; global batch {bs} "
              f"({jax.process_count()} proc x {bs_local})")

    # ---- models ----
    cldm = ControlLDM.sd21(
        dtype=jnp.bfloat16,
        use_checkpoint=bool(cfg["model"]["cldm"].get("use_checkpoint")),
        # Pallas fused-ResBlock forward (custom VJP backprops through the
        # XLA math); composes with remat — fwd recompute uses the kernel
        fused_resblock=bool(cfg["model"]["cldm"].get("fused_resblock")),
    )
    schedule = Schedule.create(
        timesteps=1000, beta_schedule="linear", linear_start=0.00085, linear_end=0.0120,
        parameterization=cfg["model"].get("parameterization", "eps"),
        zero_snr=bool(cfg["model"].get("zero_snr", False)),
    )
    shapes = cldm.eval_shapes((64, 64))
    sd = load_torch_state_dict(resolve_model(tcfg["sd_path"]))
    params = cldm.load_pretrained_sd(shapes, sd)
    # controlnet init from the loaded UNet with zero-padded hint channels
    cn_shapes = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes["controlnet"]
    )
    params = {**params, "controlnet": cn_shapes}
    params = cldm.load_controlnet_from_unet(params)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    swinir = cfglib.instantiate(cfg["model"]["swinir"], dtype=jnp.bfloat16)
    swin_sd = load_torch_state_dict(resolve_model(tcfg["swinir_path"]))
    swin_shapes = jax.eval_shape(
        swinir.init, jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3), jnp.float32)
    )
    swin_params, _, _ = fill_flax_params(swin_shapes, swin_sd, strict=True)
    swin_params = jax.tree_util.tree_map(jnp.asarray, swin_params)
    cleaner_apply = jax.jit(
        lambda x: jnp.clip(swinir.apply(swin_params, x), 0.0, 1.0)
    )

    tokenizer = get_tokenizer()

    # ---- training state ----
    optimizer = stage2.make_optimizer(
        float(tcfg["learning_rate"]),
        accum_steps=int(tcfg.get("accum_steps", 1)),
    )
    state = stage2.init_train_state(params, optimizer)
    # donate the state: otherwise old+new TrainState (params + AdamW
    # moments, ~6 GB at SD2.1 scale) are both live across the update
    train_step = jax.jit(
        stage2.make_train_step(
            cldm, schedule, optimizer, cleaner_apply,
            noise_aug_timestep=int(tcfg.get("noise_aug_timestep", 0)),
        ),
        donate_argnums=(0,),
    )
    ckpt_mgr = ocp.CheckpointManager(
        os.path.abspath(os.path.join(tcfg["exp_dir"], "checkpoints")),
        options=ocp.CheckpointManagerOptions(max_to_keep=3),
    )
    if tcfg.get("resume"):
        state = ckpt_mgr.restore(int(tcfg["resume"]), args=ocp.args.StandardRestore(state))
        if main:
            print(f"resumed @ {int(state.step)}")

    rep = NamedSharding(mesh, P())
    dat = NamedSharding(mesh, batch_pspec(mesh))
    if tcfg.get("fsdp", False):
        # ZeRO-style: every param leaf + AdamW moment sharded over the data
        # axis (largest divisible dim); XLA all-gathers weights per use and
        # reduce-scatters grads. Cuts the ~6 GB replicated state n_data-fold.
        from diffbir_tpu.parallel.fsdp import fsdp_shard_params, fsdp_sharding_tree

        state_shardings = fsdp_sharding_tree(mesh, state)
        state = fsdp_shard_params(mesh, state)
        train_step = jax.jit(
            stage2.make_train_step(
                cldm, schedule, optimizer, cleaner_apply,
                noise_aug_timestep=int(tcfg.get("noise_aug_timestep", 0)),
            ),
            donate_argnums=(0,),
            out_shardings=(state_shardings, None),
        )
        if main:
            print(f"fsdp: state sharded over data={mesh.shape['data']}"
                  + (f" x dcn-replicated {mesh.shape['dcn']}"
                     if "dcn" in mesh.axis_names else ""))
    else:
        state = jax.device_put(state, rep)

    # ---- data (degradation synthesis prefetched on a worker thread) ----
    from diffbir_tpu.dataset.prefetch import PrefetchIterator

    ds = cfglib.instantiate(cfg["dataset"]["train"])
    bt = cfglib.instantiate(cfg["batch_transform"])
    native = bool(tcfg.get("native_loader", False))
    if native:
        from diffbir_tpu.dataset.native_loader import native_available

        native = native_available()
        print(f"native C++ data loader: {'on' if native else 'unavailable, python fallback'}")
    seed = process_seed(tcfg.get("seed", 231))  # per-process data stream
    src = (ds.as_iterator(bs_local, seed=seed, native=True)
           if native else ds.as_iterator(bs_local, seed=seed))
    it = PrefetchIterator(src, transform=bt)

    writer = None
    if main:
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(os.path.join(tcfg["exp_dir"], "tb"))
        except ImportError:
            pass

    deploy_ckptr = ocp.StandardCheckpointer()

    # periodic preview sampling (train_stage2.py:184-223): 50-step spaced
    # sampler on the current batch's condition, logged as image grids
    preview_sampler = SpacedSampler(schedule.betas, schedule.parameterization, False)

    def preview(params, clean, tokens, rng):
        cond = cldm.prepare_condition(params, clean, tokens)
        x_T = jax.random.normal(rng, cond["c_img"].shape, jnp.float32)

        def model_fn(x, t, c):
            return cldm(params, x, t, c)

        z = preview_sampler.sample(model_fn, x_T, cond, None, 1.0, 50, rng)
        return jnp.clip((cldm.vae_decode(params, z) + 1) / 2, 0.0, 1.0)

    preview_fn = jax.jit(preview)

    rng = jax.random.PRNGKey(tcfg.get("seed", 231))
    step = int(state.step)
    t0 = time.time()
    while step < tcfg["train_steps"]:
        batch = next(it)
        tokens = tokenizer(batch["txt"] if "txt" in batch else batch["prompt"])
        dev_batch = shard_global_batch(
            mesh, {"gt": batch["gt"], "lq": batch["lq"], "tokens": tokens}, dat.spec
        )
        rng, sub = jax.random.split(rng)
        state, metrics = train_step(state, dev_batch, sub)
        step += 1
        if step % tcfg["log_every"] == 0:
            loss = float(metrics["loss"])
            ips = tcfg["log_every"] * bs / (time.time() - t0)
            t0 = time.time()
            if main:
                print(f"step {step}: loss={loss:.4f} grad={float(metrics['grad_norm']):.3f} images/s={ips:.1f}")
            if writer:
                writer.add_scalar("train/loss", loss, step)
        if writer and jax.process_count() == 1 and step % tcfg.get("image_every", 1000) == 0:
            n = min(4, bs)
            clean_small = cleaner_apply(dev_batch["lq"][:n])
            grid = preview_fn(state.params, clean_small, dev_batch["tokens"][:n],
                              jax.random.fold_in(rng, step))
            writer.add_images(
                "train/preview", np.asarray(grid).transpose(0, 3, 1, 2), step
            )
            writer.add_images(
                "train/lq", np.asarray(dev_batch["lq"][:n]).transpose(0, 3, 1, 2), step
            )
        if step % tcfg["ckpt_every"] == 0:
            # all processes participate in the orbax save (multihost protocol)
            ckpt_mgr.save(step, args=ocp.args.StandardSave(state))
            # deployable artifact: controlnet subtree only (train_stage2.py:178-182);
            # gather_to_host all-gathers FSDP shards so every host can read,
            # process 0 writes
            cn_host = gather_to_host(mesh, state.params["controlnet"])
            if main:
                deploy_ckptr.save(
                    os.path.abspath(os.path.join(tcfg["exp_dir"], f"controlnet_{step}")),
                    {"controlnet": cn_host},
                )
                if tcfg.get("export_torch", False):
                    # torch-layout .pth consumable by the reference stack
                    from diffbir_tpu.weights.convert import (
                        flax_to_torch_state_dict, save_torch_checkpoint,
                    )

                    save_torch_checkpoint(
                        flax_to_torch_state_dict(cn_host),
                        os.path.join(tcfg["exp_dir"], f"controlnet_{step}.pth"),
                    )
                print(f"saved checkpoints @ {step}")
            sync_processes("ckpt")
    if step not in ckpt_mgr.all_steps():  # avoid StepAlreadyExistsError when
        ckpt_mgr.save(step, args=ocp.args.StandardSave(state))  # loop ended on ckpt_every
    ckpt_mgr.wait_until_finished()


if __name__ == "__main__":
    main()
