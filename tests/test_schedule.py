import jax
import jax.numpy as jnp
import numpy as np

from cl4wsis_tpu.train import schedule


def test_poly():
    fn = schedule.poly_schedule(1.0, 100, power=0.9)
    assert float(fn(0)) == 1.0
    np.testing.assert_allclose(float(fn(50)), 0.5 ** 0.9, rtol=1e-6)
    assert float(fn(100)) == 0.0


def test_warmup_poly():
    fn = schedule.warmup_poly_schedule(2.0, 100, start_decay=20)
    assert float(fn(0)) == 2.0
    assert float(fn(19)) == 2.0
    # poly term counts from global step, not from start_decay
    np.testing.assert_allclose(float(fn(20)), 2.0 * 0.8 ** 0.9, rtol=1e-6)


def test_optimizer_group_scaling_and_freeze():
    params = {
        "body": {"k": jnp.ones((3,))},
        "seg_head": {"k": jnp.ones((3,))},
        "instance_head": {"k": jnp.ones((3,))},
    }
    tx = schedule.make_optimizer(
        params, "sgd", lambda s: 0.1,
        group_scale={"body": 0.0, "seg": 1.0, "instance": 10.0, "pseudo": 1.0})
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(updates["body"]["k"][0]) == 0.0          # frozen
    # torch-SGD nesterov first step: update = g * (1 + momentum) = 1.9
    np.testing.assert_allclose(float(updates["seg_head"]["k"][0]), -0.19, rtol=1e-6)
    np.testing.assert_allclose(float(updates["instance_head"]["k"][0]), -1.9, rtol=1e-6)
