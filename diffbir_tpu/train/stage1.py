"""Stage-1 trainer core: SwinIR lq->gt regression over a data mesh.

Behavioral parity target: /root/reference/train_stage1.py:21-254 (AdamW,
MSE with reduction='sum', val PSNR; DDP via accelerate). Here: one jitted
train step; grad allreduce by sharding; PSNR metric from utils.common.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..utils.common import psnr


@struct.dataclass
class Stage1State:
    params: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(learning_rate: float = 1e-4):
    return optax.adamw(learning_rate)


def init_state(params, optimizer) -> Stage1State:
    return Stage1State(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def make_train_step(model_apply: Callable, optimizer):
    """batch: {"gt": [0,1] NHWC, "lq": [0,1] NHWC}. MSE(sum) like the ref."""

    def train_step(state: Stage1State, batch: Dict[str, jax.Array]):
        def loss_fn(params):
            pred = model_apply(params, batch["lq"])
            return jnp.sum((pred.astype(jnp.float32) - batch["gt"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return Stage1State(params, opt_state, state.step + 1), {"loss": loss}

    return train_step


def make_val_step(model_apply: Callable):
    def val_step(params, batch):
        pred = jnp.clip(model_apply(params, batch["lq"]), 0.0, 1.0)
        return {
            "psnr": jnp.mean(psnr(pred, batch["gt"])),
            "mse": jnp.mean((pred - batch["gt"]) ** 2),
        }

    return val_step
