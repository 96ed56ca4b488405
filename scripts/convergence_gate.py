"""Tiny-overfit convergence gate: proof that the training stack LEARNS.

The reference's de-facto training QA is watching val metrics fall/rise
(/root/reference/train_stage1.py:166-234) and eyeballing preview grids
(/root/reference/train_stage2.py:184-223). Everything else in this repo
checks one step's finiteness or cross-sharding equality; this gate runs the
REAL composed path end-to-end until the numbers move:

stage 1:  synthetic images -> CodeformerDataset (real degradation synth)
          -> PrefetchIterator -> jitted MSE(sum) train step -> AdamW
          -> val PSNR before/after. Gate: loss falls by a large factor and
          val PSNR rises materially (random-init output toward the identity
          ceiling; the mild degradation keeps the LQ input itself near that
          ceiling, so "beats LQ" is not the criterion).

stage 2:  synthetic images -> RealESRGANDataset (kernel synth)
          -> RealESRGANBatchTransform (two-stage degradation + pair queue)
          -> PrefetchIterator -> tokenizer -> 8-device FSDP mesh +
          gradient accumulation -> ControlNet-only AdamW -> orbax
          save/RESTORE MID-RUN (fresh process-state) -> deployable
          controlnet export (orbax + torch .pth). Gate: smoothed diffusion
          loss falls by a large factor and the resumed trajectory continues
          to improve.

The frozen UNet here is random-init; its zero-init output convs
(models/unet.py out_layers.3/proj_out/out.2 — the SD zero_module sites)
would make the frozen backbone a constant-zero function and kill all
gradient flow into the ControlNet. Real training loads pretrained SD where
these are non-zero (/root/reference/diffbir/model/cldm.py:33-62), so the
gate perturbs exactly the all-zero frozen leaves (never the controlnet's
own zero-convs, whose zero-init IS the ControlNet training dynamic).

Runs on 8 virtual CPU devices; emits CONVERGENCE.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

# -- virtual 8-device CPU platform (must precede jax import) ---------------
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # axon plugin ignores JAX_PLATFORMS
jax.config.update("jax_compilation_cache_dir", "/tmp/diffbir_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def make_images(out_dir: str, n: int, size: int, seed: int = 0) -> str:
    """Structured synthetic images (smooth color fields + hard edges) so
    restoration is learnable; returns the file-list path."""
    from PIL import Image

    g = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(n):
        low = g.random((4, 4, 3)).astype(np.float32)
        img = np.asarray(
            Image.fromarray((low * 255).astype(np.uint8)).resize((size, size), Image.BICUBIC),
            np.float32,
        ) / 255.0
        # hard-edged rectangle: gives the models an edge to reconstruct
        y, x = g.integers(8, size - 24, 2)
        img[y : y + 16, x : x + 16] = g.random(3)
        p = os.path.join(out_dir, f"im{i}.png")
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(p)
        paths.append(p)
    flist = os.path.join(out_dir, "list.txt")
    with open(flist, "w") as f:
        f.write("\n".join(f"{p}\ta synthetic test pattern" for p in paths))
    return flist


# ======================================================================== #
# stage 1
# ======================================================================== #
def run_stage1(work_dir: str, steps: int = 400, batch_size: int = 4,
               size: int = 64, log=print) -> dict:
    from diffbir_tpu.dataset.codeformer import CodeformerDataset
    from diffbir_tpu.dataset.prefetch import PrefetchIterator
    from diffbir_tpu.models.swinir import SwinIR
    from diffbir_tpu.train import stage1
    from diffbir_tpu.utils.common import psnr

    flist = make_images(os.path.join(work_dir, "s1_imgs"), n=8, size=size)
    ds = CodeformerDataset(
        file_list=flist,
        file_backend_cfg={"target": "hard_disk_backend"},
        out_size=size, crop_type="none", blur_kernel_size=21,
        kernel_list=["iso", "aniso"], kernel_prob=[0.5, 0.5],
        blur_sigma=[0.1, 2.0], downsample_range=[1, 2],
        noise_range=[0, 5], jpeg_range=[80, 95],
    )
    model = SwinIR(
        embed_dim=16, depths=(2, 2), num_heads=(2, 2), window_size=4,
        sf=8, unshuffle=True, unshuffle_scale=8,
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3))
    )
    opt = stage1.make_optimizer(2e-4)
    state = stage1.init_state(params, opt)
    train_step = jax.jit(stage1.make_train_step(model.apply, opt), donate_argnums=(0,))
    val_step = jax.jit(stage1.make_val_step(model.apply))

    def val(params):
        vit = ds.as_iterator(batch_size, shuffle=False)
        scores, lq_scores = [], []
        for _ in range(2):
            b = next(vit)
            vb = {"gt": jnp.asarray((b["gt"] + 1) / 2), "lq": jnp.asarray(b["lq"])}
            scores.append(float(val_step(params, vb)["psnr"]))
            lq_scores.append(float(jnp.mean(psnr(vb["lq"], vb["gt"]))))
        return float(np.mean(scores)), float(np.mean(lq_scores))

    psnr_before, psnr_lq = val(state.params)
    it = PrefetchIterator(ds.as_iterator(batch_size, seed=0))
    losses = []
    t0 = time.time()
    for step in range(steps):
        b = next(it)
        batch = {"gt": jnp.asarray((b["gt"] + 1) / 2), "lq": jnp.asarray(b["lq"])}
        state, metrics = train_step(state, batch)
        losses.append(float(metrics["loss"]))
        if (step + 1) % 100 == 0:
            log(f"  stage1 step {step+1}: loss={losses[-1]:.1f}")
    it.close()
    psnr_after, _ = val(state.params)

    first = float(np.mean(losses[:20]))
    last = float(np.mean(losses[-20:]))
    res = {
        "steps": steps,
        "loss_first20": first,
        "loss_last20": last,
        "loss_ratio": first / max(last, 1e-9),
        "val_psnr_before": psnr_before,
        "val_psnr_after": psnr_after,
        "val_psnr_lq_input": psnr_lq,
        "wall_s": round(time.time() - t0, 1),
    }
    res["ok"] = bool(res["loss_ratio"] >= 3.0 and psnr_after >= psnr_before + 3.0)
    return res


# ======================================================================== #
# stage 2
# ======================================================================== #
def _unfreeze_zero_init(tree, rng, scale=0.05):
    """Replace all-zero leaves of a FROZEN subtree with small noise (stand-in
    for pretrained SD weights; see module docstring)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(rng, len(leaves))
    out = []
    for leaf, k in zip(leaves, keys):
        if leaf.size and not np.any(np.asarray(leaf)):
            out.append(jax.random.normal(k, leaf.shape, leaf.dtype) * scale)
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def run_stage2(work_dir: str, steps: int = 360, batch_size: int = 8,
               size: int = 64, accum_steps: int = 2, log=print) -> dict:
    import orbax.checkpoint as ocp

    from diffbir_tpu.dataset.batch_transform import RealESRGANBatchTransform
    from diffbir_tpu.dataset.prefetch import PrefetchIterator
    from diffbir_tpu.dataset.realesrgan import RealESRGANDataset
    from diffbir_tpu.models.cldm import ControlLDM
    from diffbir_tpu.models.tokenizer import get_tokenizer
    from diffbir_tpu.parallel.fsdp import fsdp_shard_params, fsdp_sharding_tree
    from diffbir_tpu.parallel.mesh import make_mesh
    from diffbir_tpu.schedule import Schedule
    from diffbir_tpu.train import stage2
    from diffbir_tpu.weights.convert import flax_to_torch_state_dict, save_torch_checkpoint

    flist = make_images(os.path.join(work_dir, "s2_imgs"), n=batch_size, size=size)
    ds = RealESRGANDataset(
        file_list=flist,
        file_backend_cfg={"target": "hard_disk_backend"},
        out_size=size, crop_type="none", use_hflip=False,
    )
    bt = RealESRGANBatchTransform(
        use_sharpener=False, queue_size=batch_size * 2,
        resize_prob=[0.2, 0.7, 0.1], resize_range=[0.5, 1.2],
        gray_noise_prob=0.0, gaussian_noise_prob=0.5, noise_range=[1, 10],
        poisson_scale_range=[0.05, 0.5], jpeg_range=[80, 95],
        second_blur_prob=0.5, stage2_scale=1.0,
        resize_prob2=[0.3, 0.4, 0.3], resize_range2=[0.6, 1.2],
        gray_noise_prob2=0.0, gaussian_noise_prob2=0.5, noise_range2=[1, 8],
        poisson_scale_range2=[0.05, 0.5], jpeg_range2=[80, 95],
    )
    tokenizer = get_tokenizer()

    mesh = make_mesh(n_data=8)
    cldm = ControlLDM.tiny()
    schedule = Schedule.create(timesteps=100, parameterization="eps")
    lat = size // 8
    params = jax.jit(cldm.init_params, static_argnums=1)(
        jax.random.PRNGKey(0), (lat, lat)
    )
    # frozen backbone must be non-degenerate (see module docstring); the
    # trainable controlnet keeps its true zero-conv init.
    k = jax.random.PRNGKey(99)
    params = {
        **{n: _unfreeze_zero_init(params[n], jax.random.fold_in(k, i))
           for i, n in enumerate(("unet", "vae", "clip"))},
        "controlnet": params["controlnet"],
    }

    opt = stage2.make_optimizer(2e-3, accum_steps=accum_steps)
    state = stage2.init_train_state(params, opt)
    shardings = fsdp_sharding_tree(mesh, state)
    state = fsdp_shard_params(mesh, state)
    train_step = jax.jit(
        stage2.make_train_step(cldm, schedule, opt, cleaner_apply=None,
                               noise_aug_timestep=10),
        donate_argnums=(0,),
        out_shardings=(shardings, None),
    )

    ckpt_dir = os.path.abspath(os.path.join(work_dir, "s2_ckpt"))
    ckpt_mgr = ocp.CheckpointManager(
        ckpt_dir, options=ocp.CheckpointManagerOptions(max_to_keep=2)
    )

    def data_iter(seed):
        return PrefetchIterator(ds.as_iterator(batch_size, seed=seed), transform=bt)

    rng = jax.random.PRNGKey(231)
    losses = []
    t0 = time.time()
    mid = steps // 2
    it = data_iter(0)
    for step in range(mid):
        b = next(it)
        batch = {
            "gt": jnp.asarray(b["gt"]), "lq": jnp.asarray(b["lq"]),
            "tokens": jnp.asarray(tokenizer(list(b["txt"]))),
        }
        rng, sub = jax.random.split(rng)
        state, metrics = train_step(state, batch, sub)
        losses.append(float(metrics["loss"]))
        if (step + 1) % 20 == 0:
            log(f"  stage2 step {step+1}: loss={np.mean(losses[-20:]):.4f} "
                f"({time.time() - t0:.0f}s)")
    it.close()

    # --- orbax save + restore into a FRESH state (mid-run resume) ---------
    ckpt_mgr.save(mid, args=ocp.args.StandardSave(jax.device_get(state)))
    ckpt_mgr.wait_until_finished()
    log(f"  stage2 orbax save done ({time.time() - t0:.0f}s)")
    fresh = stage2.init_train_state(params, opt)  # abstract target tree
    restored = ckpt_mgr.restore(mid, args=ocp.args.StandardRestore(fresh))
    assert int(restored.step) == mid, (int(restored.step), mid)
    state = fsdp_shard_params(mesh, restored)
    log(f"  stage2 resumed from orbax @ step {mid} ({time.time() - t0:.0f}s)")

    it = data_iter(1)
    for step in range(mid, steps):
        b = next(it)
        batch = {
            "gt": jnp.asarray(b["gt"]), "lq": jnp.asarray(b["lq"]),
            "tokens": jnp.asarray(tokenizer(list(b["txt"]))),
        }
        rng, sub = jax.random.split(rng)
        state, metrics = train_step(state, batch, sub)
        losses.append(float(metrics["loss"]))
        if (step + 1) % 20 == 0:
            log(f"  stage2 step {step+1}: loss={np.mean(losses[-20:]):.4f} "
                f"({time.time() - t0:.0f}s)")
    it.close()

    # --- deployable export: controlnet subtree (orbax) + torch .pth -------
    cn = jax.device_get(state.params["controlnet"])
    ocp.StandardCheckpointer().save(
        os.path.join(ckpt_dir, "controlnet_final"), {"controlnet": cn}
    )
    pth = os.path.join(work_dir, "controlnet_final.pth")
    save_torch_checkpoint(flax_to_torch_state_dict(cn), pth)
    import torch

    n_exported = len(torch.load(pth, map_location="cpu", weights_only=True))

    first = float(np.mean(losses[:30]))
    last = float(np.mean(losses[-30:]))
    pre_resume = float(np.mean(losses[mid - 30 : mid]))
    res = {
        "steps": steps,
        "fsdp_devices": int(mesh.shape["data"]),
        "accum_steps": accum_steps,
        "loss_first30": first,
        "loss_last30": last,
        "loss_ratio": first / max(last, 1e-9),
        "loss_pre_resume30": pre_resume,
        "resumed_at": mid,
        "torch_export_tensors": n_exported,
        "wall_s": round(time.time() - t0, 1),
    }
    res["ok"] = bool(
        res["loss_ratio"] >= 2.0
        and last < pre_resume * 1.05  # resume continued the descent
        and n_exported > 0
    )
    return res


def main():
    import faulthandler
    import tempfile

    # periodic all-thread stack dumps to stderr: a hang in a jitted call,
    # orbax I/O, or the prefetch worker becomes diagnosable post-mortem
    faulthandler.dump_traceback_later(900, repeat=True)

    with tempfile.TemporaryDirectory() as work:
        print("== stage 1 (SwinIR regression) ==")
        s1 = run_stage1(work)
        print(json.dumps(s1, indent=2))
        print("== stage 2 (ControlNet diffusion, 8-dev FSDP + accum + resume) ==")
        s2 = run_stage2(work)
        print(json.dumps(s2, indent=2))

    out = {"stage1": s1, "stage2": s2, "ok": bool(s1["ok"] and s2["ok"])}
    path = os.path.join(REPO, "CONVERGENCE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}: ok={out['ok']}")
    if not out["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
