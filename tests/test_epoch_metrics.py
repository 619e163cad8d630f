"""Epoch metrics are means over all batches, not last-batch values
(VERDICT r1 weak #3; reference train.py:543,568-580), and interval logging
emits interval means every print_interval steps (train.py:552-566)."""

import jax.numpy as jnp
import numpy as np

from cl4wsis_tpu.cli.config import Config
from cl4wsis_tpu.train.trainer import Trainer


class _FakeLogger:
    def __init__(self):
        self.scalars = []
        self.commits = 0

    def add_scalar(self, tag, value, step=None, intermediate=False):
        self.scalars.append((tag, float(value), step, intermediate))

    def commit(self, intermediate=False):
        self.commits += 1

    def debug(self, msg):
        pass


def _fake_trainer(print_interval=2, n_batches=5):
    """A Trainer shell exercising only the train_epoch aggregation logic —
    no model build, no compilation."""
    t = object.__new__(Trainer)
    t.cfg = Config(print_interval=print_interval, epochs=1,
                   debug=False, profile_dir=None).finalize(n_batches)
    t.supervised_pseudo = False
    t.state = None

    losses = [1.0, 3.0, 5.0, 7.0, 9.0][:n_batches]

    def fake_step(state, batch, rng):
        return state, {"loss": jnp.asarray(batch["loss"]),
                       "l_seg": jnp.asarray(2.0 * batch["loss"])}

    t._get_step = lambda epoch: fake_step
    t._device_batch = lambda b: b
    batches = [{"loss": v} for v in losses]
    return t, batches, losses


def test_epoch_metrics_are_means():
    t, batches, losses = _fake_trainer()
    m = t.train_epoch(0, batches)
    assert np.isclose(m["loss"], np.mean(losses))
    assert np.isclose(m["l_seg"], 2.0 * np.mean(losses))
    assert m["n_batches"] == len(losses)


def test_interval_logging_means():
    t, batches, losses = _fake_trainer(print_interval=2)
    log = _FakeLogger()
    t.train_epoch(0, batches, logger=log)
    tot = [(v, step) for tag, v, step, inter in log.scalars
           if tag == "Loss/tot" and inter]
    # 5 batches, interval 2 -> prints after batches 2 and 4
    assert len(tot) == 2
    assert np.isclose(tot[0][0], np.mean(losses[0:2]))
    assert np.isclose(tot[1][0], np.mean(losses[2:4]))
    # global-step x axis: epoch*iters_per_epoch + step (train.py:559)
    assert tot[0][1] == 2 and tot[1][1] == 4
    assert log.commits == 2
    # epoch mean still covers ALL batches including the tail after the
    # last print
    m = t.train_epoch(1, batches, logger=log)
    assert np.isclose(m["loss"], np.mean(losses))


def test_no_logger_no_interval_sync():
    t, batches, losses = _fake_trainer(print_interval=1)
    m = t.train_epoch(0, batches, logger=None)
    assert np.isclose(m["loss"], np.mean(losses))
