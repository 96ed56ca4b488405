"""Checkpoint/resume round-trip for the stage-2 trainer (orbax).

Mirrors the reference's resume path (train_stage2.py --resume): saving the
full TrainState and restoring it must reproduce the EXACT same training
trajectory (bit-equal params after the next step).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffbir_tpu.models.cldm import ControlLDM
from diffbir_tpu.schedule import Schedule
from diffbir_tpu.train.stage2 import init_train_state, make_optimizer, make_train_step


@pytest.fixture(scope="module")
def trainer():
    cldm = ControlLDM.tiny()
    schedule = Schedule.create(timesteps=100, parameterization="eps")
    params = jax.jit(cldm.init_params, static_argnums=1)(jax.random.PRNGKey(0), (8, 8))
    opt = make_optimizer(learning_rate=1e-3)
    step = jax.jit(make_train_step(cldm, schedule, opt))
    batch = {
        "gt": jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 2 - 1,
        "lq": jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3)),
        "tokens": jnp.zeros((2, 77), jnp.int32),
    }
    return params, opt, step, batch


def test_orbax_roundtrip_resumes_exactly(trainer, tmp_path):
    ocp = pytest.importorskip("orbax.checkpoint")
    params, opt, step, batch = trainer

    state = init_train_state(params, opt)
    state, _ = step(state, batch, jax.random.PRNGKey(10))
    state, _ = step(state, batch, jax.random.PRNGKey(11))

    ckptr = ocp.StandardCheckpointer()
    path = tmp_path / "ckpt"
    ckptr.save(path, state)
    ckptr.wait_until_finished()

    fresh = init_train_state(params, opt)  # abstract target tree
    restored = ckptr.restore(path, fresh)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state.params, restored.params,
    )
    assert int(restored.step) == 2

    # the next step from the restored state matches the uninterrupted run
    cont, m1 = step(state, batch, jax.random.PRNGKey(12))
    resumed, m2 = step(restored, batch, jax.random.PRNGKey(12))
    np.testing.assert_array_equal(
        np.asarray(m1["loss"]), np.asarray(m2["loss"])
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        cont.params["controlnet"], resumed.params["controlnet"],
    )


def test_gradient_accumulation_equivalence():
    """accum_steps=2 with the SAME micro-batch+rng twice == one plain AdamW
    step on that batch (mean of identical grads is the grad); and the params
    must not move until the k-th micro-step."""
    import numpy as np
    from diffbir_tpu.models.cldm import ControlLDM
    from diffbir_tpu.schedule import Schedule

    cldm = ControlLDM.tiny()
    schedule = Schedule.create(timesteps=50)
    params = jax.jit(cldm.init_params, static_argnums=1)(jax.random.PRNGKey(0), (8, 8))
    batch = {
        "gt": jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 64, 64, 3)) * 0.2, jnp.float32
        ),
        "lq": jnp.asarray(np.random.default_rng(1).random((2, 64, 64, 3)), jnp.float32),
        "tokens": jnp.zeros((2, 77), jnp.int32),
    }
    rng = jax.random.PRNGKey(3)

    opt_plain = make_optimizer(1e-3)
    step_plain = jax.jit(make_train_step(cldm, schedule, opt_plain))
    s_plain, _ = step_plain(init_train_state(params, opt_plain), batch, rng)

    opt_acc = make_optimizer(1e-3, accum_steps=2)
    step_acc = jax.jit(make_train_step(cldm, schedule, opt_acc))
    s1, _ = step_acc(init_train_state(params, opt_acc), batch, rng)
    # micro-step 1: accumulation only, no param change
    l0 = jax.tree_util.tree_leaves(params["controlnet"])[0]
    l1 = jax.tree_util.tree_leaves(s1.params["controlnet"])[0]
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    s2, _ = step_acc(s1, batch, rng)

    a = jax.tree_util.tree_leaves(s_plain.params["controlnet"])
    b = jax.tree_util.tree_leaves(s2.params["controlnet"])
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
