"""End-to-end smoke: step-0 supervised training on synthetic data,
sharded over the virtual 8-device CPU mesh, loss must decrease."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full jitted phase programs

import jax
import jax.numpy as jnp
import numpy as np

from cl4wsis_tpu.core import create_mesh, shard_batch, replicate
from cl4wsis_tpu.data.synthetic import synthetic_batches
from cl4wsis_tpu.models import CL4WSISModel
from cl4wsis_tpu.train import schedule
from cl4wsis_tpu.train.step0 import init_state, make_step0_train_step


def test_step0_loss_decreases_on_mesh():
    model = CL4WSISModel(classes=(3,), pooling_size=2,
                         backbone_structure=(1, 1, 1, 1))
    tx = schedule.make_optimizer(
        None, "adam", schedule.make_schedule("poly", 5e-4, 100),
        group_scale=None)
    state = init_state(model, tx, jax.random.PRNGKey(0),
                       input_shape=(1, 64, 64, 3))
    mesh = create_mesh()
    state = replicate(state, mesh)
    train_step = make_step0_train_step(model, tx, sigma=3, max_inst=8)

    losses_seen = []
    rng = jax.random.PRNGKey(1)
    batches = synthetic_batches(8, 64, n_classes=2, seed=0, n_batches=8)
    fixed = next(batches)  # overfit one batch: loss must drop
    for i in range(8):
        rng, sub = jax.random.split(rng)
        batch = shard_batch(
            {"image": jnp.asarray(fixed["image"]),
             "seg": jnp.asarray(fixed["seg"]),
             "inst": jnp.asarray(fixed["inst"])}, mesh)
        state, metrics = train_step(state, batch, sub)
        losses_seen.append(float(metrics["loss"]))

    assert np.isfinite(losses_seen).all()
    assert losses_seen[-1] < losses_seen[0], losses_seen
    assert int(state.step) == 8
