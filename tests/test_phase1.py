"""Phase-1 (CL-WSSS) train step: compiles and runs on the 8-device mesh,
loss finite, pseudolabeler learns the image-level labels."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full jitted phase programs

import jax
import jax.numpy as jnp
import numpy as np

from cl4wsis_tpu.core import create_mesh, replicate, shard_batch
from cl4wsis_tpu.data.synthetic import synthetic_batches
from cl4wsis_tpu.models import CL4WSISModel
from cl4wsis_tpu.train import schedule
from cl4wsis_tpu.train.phase1 import make_phase1_train_step, phase1_group_fn
from cl4wsis_tpu.train.state import TrainState
from cl4wsis_tpu.wss import PeakGenerator, PseudoLabeler

OLD, NEW = 3, 2  # classes (3,) -> (3, 2); old_classes = 3
TOT = OLD + NEW


def _setup():
    model = CL4WSISModel(classes=(OLD, NEW), pooling_size=2, has_instance=False,
                         backbone_structure=(1, 1, 1, 1))
    model_old = CL4WSISModel(classes=(OLD,), pooling_size=2, has_instance=False,
                             backbone_structure=(1, 1, 1, 1))
    pl_mod = PseudoLabeler(num_classes=TOT)
    pg_mod = PeakGenerator(num_classes=TOT - 1, old_classes=OLD - 1)

    x = jnp.zeros((1, 64, 64, 3))
    mv = model.init(jax.random.PRNGKey(0), x, train=False)
    ov = model_old.init(jax.random.PRNGKey(0), x, train=False)
    feat = jnp.zeros((1, 4, 4, 2048))
    plv = pl_mod.init(jax.random.PRNGKey(1), feat, train=False)
    cam = jnp.zeros((1, 4, 4, TOT))
    pgv = pg_mod.init(jax.random.PRNGKey(2), cam, train=True)

    params = {"model": mv["params"], "pseudolabeler": plv["params"],
              "peakgenerator": pgv["params"]}
    stats = {"model": mv["batch_stats"], "pseudolabeler": plv["batch_stats"],
             "peakgenerator": {}}
    tx = schedule.make_optimizer(
        params, "sgd", schedule.make_schedule("warmup", 1e-3, 100, start_decay=50),
        group_scale={"body": 1.0, "seg": 10.0, "pseudo": 1.0},
        group_fn=phase1_group_fn)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=stats, opt_state=tx.init(params))
    return model, model_old, pl_mod, pg_mod, tx, state, ov


def _batch(mesh):
    b = next(synthetic_batches(8, 64, n_classes=TOT - 1, seed=0, n_batches=1))
    return shard_batch({"image": jnp.asarray(b["image"]),
                        "l1h": jnp.asarray(b["l1h"][:, 1:])}, mesh)


def test_phase1_warmup_and_pseudo_variants():
    model, model_old, pl_mod, pg_mod, tx, state, ov = _setup()
    mesh = create_mesh()
    state = replicate(state, mesh)
    ov = replicate(ov, mesh)
    batch = _batch(mesh)

    losses_seen = []
    for use_pseudo in (False, True):
        step = make_phase1_train_step(
            model, model_old, pl_mod, pg_mod, tx, old_classes=OLD,
            use_pseudo=use_pseudo)
        for i in range(2):
            state, metrics = step(state, batch, ov, jax.random.PRNGKey(i))
            losses_seen.append(float(metrics["loss"]))
            assert np.isfinite(losses_seen[-1]), metrics
    # pseudo variant adds l_seg/l_cls terms
    assert float(metrics["l_cls"]) != 0.0 or float(metrics["l_seg"]) != 0.0
    assert int(state.step) == 4


def test_phase1_cam_learns_labels():
    """Few steps of warmup phase must reduce the image-level CAM loss."""
    model, model_old, pl_mod, pg_mod, tx, state, ov = _setup()
    mesh = create_mesh()
    state = replicate(state, mesh)
    ov = replicate(ov, mesh)
    batch = _batch(mesh)
    step = make_phase1_train_step(model, model_old, pl_mod, pg_mod, tx,
                                  old_classes=OLD, use_pseudo=False,
                                  use_flac=False)
    first = last = None
    for i in range(6):
        state, metrics = step(state, batch, ov, jax.random.PRNGKey(i))
        v = float(metrics["l_cam_new"])
        first = v if first is None else first
        last = v
    assert last < first, (first, last)
