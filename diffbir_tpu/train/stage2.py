"""Stage-2 trainer core: IRControlNet training over a data-parallel mesh.

Behavioral parity target: /root/reference/train_stage2.py:20-241:
- SD (unet/vae/clip) frozen; only ``controlnet`` params receive gradients
  (AdamW over cldm.controlnet.parameters(), train_stage2.py:78);
- condition = frozen cleaner(lq) -> prepare_condition (+ optional noise aug,
  :135-143); z_0 = vae_encode(gt), t ~ U[0,1000), v/eps target p_losses.

TPU-native: one jitted ``train_step`` over a ``Mesh(("data","tensor"))``;
the gradient allreduce is inserted by XLA from the shardings (no NCCL
surface). Metrics come back replicated (the psum-mean is inside the step).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.cldm import ControlLDM
from ..schedule import Schedule


@struct.dataclass
class TrainState:
    params: Any          # full ControlLDM param tree (frozen + trainable)
    opt_state: Any       # optimizer state over params["controlnet"] only
    step: jax.Array


def make_optimizer(learning_rate: float = 1e-4, weight_decay: float = 0.0,
                   accum_steps: int = 1):
    """AdamW matching torch defaults (betas 0.9/0.999, eps 1e-8).

    ``accum_steps > 1`` wraps the update in optax.MultiSteps (gradient
    accumulation): the reference recipe's global batch 256
    (train_stage2.yaml) then fits on few chips — k micro-batches average
    into one AdamW step, equivalent to one k-times-larger batch."""
    opt = optax.adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                      weight_decay=weight_decay)
    if accum_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=accum_steps)
    return opt


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params["controlnet"]),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    cldm: ControlLDM,
    schedule: Schedule,
    optimizer,
    cleaner_apply: Optional[Callable[[jax.Array], jax.Array]] = None,
    noise_aug_timestep: int = 0,
):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: {"gt": [-1,1] NHWC, "lq": [0,1] NHWC, "tokens": [B,77] int32}.
    """

    def train_step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        rng, k_z, k_clean_aug, k_t, k_noise = jax.random.split(rng, 5)

        # frozen preprocessing (no grad): latents + condition
        z_0 = cldm.vae_encode(state.params, batch["gt"], sample=True, rng=k_z)
        clean = cleaner_apply(batch["lq"]) if cleaner_apply is not None else batch["lq"]

        def loss_fn(cn_params):
            params = {**state.params, "controlnet": cn_params}
            cond = cldm.prepare_condition(params, clean, batch["tokens"])
            if noise_aug_timestep > 0:
                t_aug = jnp.full((z_0.shape[0],), noise_aug_timestep, jnp.int32)
                cond = {
                    **cond,
                    "c_img": schedule.q_sample(
                        cond["c_img"], t_aug,
                        jax.random.normal(k_clean_aug, cond["c_img"].shape, jnp.float32),
                    ),
                }
            bs = z_0.shape[0]
            t = jax.random.randint(k_t, (bs,), 0, schedule.num_timesteps)
            noise = jax.random.normal(k_noise, z_0.shape, jnp.float32)
            x_noisy = schedule.q_sample(z_0, t, noise)
            pred = cldm(params, x_noisy, t.astype(jnp.float32), cond)
            target = schedule.target(z_0, noise, t)
            return schedule.loss(pred.astype(jnp.float32), target)

        loss, grads = jax.value_and_grad(loss_fn)(state.params["controlnet"])
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params["controlnet"]
        )
        cn = optax.apply_updates(state.params["controlnet"], updates)
        new_state = TrainState(
            params={**state.params, "controlnet": cn},
            opt_state=opt_state,
            step=state.step + 1,
        )
        gnorm = optax.global_norm(grads)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    return train_step
