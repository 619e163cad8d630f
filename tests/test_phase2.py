"""Phase-2 train step: the full program (TTA seg, CAM peaks, device label
factory, refinement, losses) compiles and runs on the 8-device mesh; only
the instance branch trains."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full jitted phase programs

import jax
import jax.numpy as jnp
import numpy as np

from cl4wsis_tpu.core import create_mesh, replicate, shard_batch
from cl4wsis_tpu.data.synthetic import synthetic_batches
from cl4wsis_tpu.models import CL4WSISModel
from cl4wsis_tpu.train import schedule
from cl4wsis_tpu.train.phase2 import make_phase2_train_step
from cl4wsis_tpu.train.state import TrainState
from cl4wsis_tpu.wss import PeakGenerator, PseudoLabeler

OLD, NEW = 3, 2
TOT = OLD + NEW


def _setup():
    model = CL4WSISModel(classes=(OLD, NEW), pooling_size=2, has_instance=True,
                         detach_instance=True, backbone_structure=(1, 1, 1, 1))
    model_old = CL4WSISModel(classes=(OLD,), pooling_size=2, has_instance=True,
                             backbone_structure=(1, 1, 1, 1))
    pl_mod = PseudoLabeler(num_classes=TOT)
    pg_mod = PeakGenerator(num_classes=TOT - 1, old_classes=OLD - 1)
    x = jnp.zeros((1, 64, 64, 3))
    mv = model.init(jax.random.PRNGKey(0), x, train=False)
    ov = model_old.init(jax.random.PRNGKey(0), x, train=False)
    plv = pl_mod.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 4, 2048)), train=False)
    pgv = pg_mod.init(jax.random.PRNGKey(2), jnp.zeros((1, 4, 4, TOT)), train=True)
    aux = {"pseudolabeler": plv, "peakgenerator": pgv}

    params = {"model": mv["params"]}
    stats = {"model": mv["batch_stats"]}
    tx = schedule.make_optimizer(
        params, "adam", schedule.make_schedule("poly", 5e-5, 100),
        group_scale={"body": 0.0, "seg": 0.0, "instance": 10.0, "pseudo": 0.0},
        group_fn=lambda p: schedule.default_group_fn(p.split("/", 1)[1]))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=stats, opt_state=tx.init(params))
    return model, model_old, pl_mod, pg_mod, tx, state, ov, aux


def test_phase2_step_runs_and_freezes_body():
    model, model_old, pl_mod, pg_mod, tx, state, ov, aux = _setup()
    mesh = create_mesh()
    state = replicate(state, mesh)
    ov, aux = replicate(ov, mesh), replicate(aux, mesh)

    b = next(synthetic_batches(8, 64, n_classes=TOT - 1, seed=0, n_batches=1))
    batch = shard_batch({"image": jnp.asarray(b["image"]),
                         "l1h": jnp.asarray(b["l1h"][:, 1:])}, mesh)

    step = make_phase2_train_step(model, model_old, pl_mod, pg_mod, tx,
                                  old_classes=OLD, nms_kernel=15,
                                  max_peaks=8, cc_iters=8)
    body_before = np.asarray(
        jax.tree_util.tree_leaves(state.params["model"]["body"])[0])
    ins_before = np.asarray(
        jax.tree_util.tree_leaves(state.params["model"]["instance_head"])[0])

    for i in range(2):
        state, metrics = step(state, batch, ov, aux, jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["loss"])), metrics

    body_after = np.asarray(
        jax.tree_util.tree_leaves(state.params["model"]["body"])[0])
    ins_after = np.asarray(
        jax.tree_util.tree_leaves(state.params["model"]["instance_head"])[0])
    np.testing.assert_array_equal(body_before, body_after)
    assert not np.allclose(ins_before, ins_after)  # instance branch trained
    # body BN stats not polluted by the frozen passes
    np.testing.assert_array_equal(
        np.asarray(state.batch_stats["model"]["body"]["mod1_bn1"]["mean"]),
        np.zeros(64, np.float32))


def test_phase2_no_refine_variant():
    """--run_refine false: pseudo labels only, no self-refinement pass."""
    model, model_old, pl_mod, pg_mod, tx, state, ov, aux = _setup()
    mesh = create_mesh()
    state = replicate(state, mesh)
    ov, aux = replicate(ov, mesh), replicate(aux, mesh)
    b = next(synthetic_batches(8, 64, n_classes=TOT - 1, seed=1, n_batches=1))
    batch = shard_batch({"image": jnp.asarray(b["image"]),
                         "l1h": jnp.asarray(b["l1h"][:, 1:])}, mesh)
    step = make_phase2_train_step(model, model_old, pl_mod, pg_mod, tx,
                                  old_classes=OLD, nms_kernel=15,
                                  max_peaks=8, cc_iters=8, run_refine=False)
    state, metrics = step(state, batch, ov, aux, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"])), metrics


def test_phase2_shardmap_factory_matches_gspmd():
    """With `mesh` the label factory runs under shard_map (device-local CC
    fixpoints, no per-sweep collectives); the step must produce the same
    loss as the plain-GSPMD program on the same sharded batch."""
    model, model_old, pl_mod, pg_mod, tx, state, ov, aux = _setup()
    mesh = create_mesh()
    state = replicate(state, mesh)
    ov, aux = replicate(ov, mesh), replicate(aux, mesh)
    b = next(synthetic_batches(8, 64, n_classes=TOT - 1, seed=2, n_batches=1))
    batch = shard_batch({"image": jnp.asarray(b["image"]),
                         "l1h": jnp.asarray(b["l1h"][:, 1:])}, mesh)
    common = dict(old_classes=OLD, nms_kernel=15, max_peaks=8, cc_iters=8)
    step_plain = make_phase2_train_step(model, model_old, pl_mod, pg_mod,
                                        tx, **common)
    step_sm = make_phase2_train_step(model, model_old, pl_mod, pg_mod,
                                     tx, mesh=mesh, **common)
    # donate_argnums=0: run each step on its own copy of the state
    state2 = jax.tree_util.tree_map(jnp.copy, state)
    _, m_plain = step_plain(state, batch, ov, aux, jax.random.PRNGKey(7))
    _, m_sm = step_sm(state2, batch, ov, aux, jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(m_plain["loss"]), float(m_sm["loss"]),
                               rtol=1e-5)
    np.testing.assert_array_equal(int(m_plain["label_truncated"]),
                                  int(m_sm["label_truncated"]))
