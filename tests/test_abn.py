import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cl4wsis_tpu.core import ABN, create_mesh, shard_batch


def _init(features=8, activation="leaky_relu", **kw):
    m = ABN(features=features, activation=activation, **kw)
    x = jnp.zeros((2, 4, 4, features))
    variables = m.init(jax.random.PRNGKey(0), x, train=True)
    return m, variables


def test_abn_train_matches_numpy():
    m, variables = _init()
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 5, 6, 8)) * 3.0 + 1.0
    y, updated = m.apply(variables, x, train=True, mutable=["batch_stats"])
    xn = np.asarray(x, np.float64)
    mean = xn.mean(axis=(0, 1, 2))
    var = xn.var(axis=(0, 1, 2))
    ref = (xn - mean) / np.sqrt(var + 1e-5)
    ref = np.where(ref >= 0, ref, 0.01 * ref)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)
    # running stats updated with torch momentum 0.1, unbiased var
    n = 4 * 5 * 6
    np.testing.assert_allclose(np.asarray(updated["batch_stats"]["mean"]),
                               0.1 * mean, atol=1e-4)
    np.testing.assert_allclose(np.asarray(updated["batch_stats"]["var"]),
                               0.9 * 1.0 + 0.1 * var * n / (n - 1), atol=1e-4)


def test_abn_eval_uses_running_stats():
    m, variables = _init()
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 3, 8)) + 5.0
    y = m.apply(variables, x, train=False)
    # running mean 0, var 1 at init → y == activation(x)
    ref = np.asarray(x)
    ref = np.where(ref >= 0, ref, 0.01 * ref)
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-3)


def test_abn_identity_activation():
    m, variables = _init(activation="identity")
    x = -jnp.ones((2, 3, 3, 8))
    y = m.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=2e-3)


def test_abn_matches_torch_batchnorm():
    torch = pytest.importorskip("torch")
    m, variables = _init(features=6)
    x = np.random.RandomState(0).randn(3, 5, 5, 6).astype(np.float32)
    y, updated = m.apply(variables, jnp.asarray(x), train=True, mutable=["batch_stats"])

    bn = torch.nn.BatchNorm2d(6, eps=1e-5, momentum=0.1)
    bn.train()
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    yt = torch.nn.functional.leaky_relu(bn(xt), 0.01).detach().permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, atol=1e-4)
    np.testing.assert_allclose(np.asarray(updated["batch_stats"]["mean"]),
                               bn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(updated["batch_stats"]["var"]),
                               bn.running_var.numpy(), atol=1e-5)


def test_abn_sync_across_mesh():
    """Global-batch stats under jit + sharded batch == host computation.

    This is the TPU-native replacement for InPlaceABNSync's per-layer NCCL
    all-reduce: the batch axis is sharded over 8 devices and XLA turns the
    stats reduction into a cross-device collective.
    """
    mesh = create_mesh()
    assert len(jax.devices()) == 8
    m, variables = _init()
    x = jax.random.normal(jax.random.PRNGKey(3), (16, 4, 4, 8)) * 2.0 - 1.0
    xs = shard_batch(x, mesh)

    @jax.jit
    def f(v, x):
        return m.apply(v, x, train=True, mutable=["batch_stats"])

    y_sharded, stats_sharded = f(variables, xs)
    y_local, stats_local = f(variables, x)
    np.testing.assert_allclose(np.asarray(y_sharded), np.asarray(y_local), atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats_sharded["batch_stats"]["mean"]),
                               np.asarray(stats_local["batch_stats"]["mean"]), atol=1e-6)


def test_abn_grad_through_batch_stats():
    """End-to-end ABN gradient (stats + fused pass) vs explicit formula-free
    numerical check on a tiny input."""
    m, variables = _init(features=4)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 3, 4))

    def f(x):
        y, _ = m.apply(variables, x, train=True, mutable=["batch_stats"])
        return jnp.sum(jnp.square(y))

    g = jax.grad(f)(x)
    # numerical gradient on a few coordinates
    eps = 1e-3
    for idx in [(0, 0, 0, 0), (1, 2, 1, 3)]:
        xp = x.at[idx].add(eps)
        xm = x.at[idx].add(-eps)
        num = (f(xp) - f(xm)) / (2 * eps)
        np.testing.assert_allclose(float(g[idx]), float(num), rtol=2e-2, atol=2e-3)


def test_ain_matches_torch_instance_norm():
    torch = pytest.importorskip("torch")
    from cl4wsis_tpu.core.norms import AIN
    m = AIN(features=6)
    x = np.random.RandomState(0).randn(2, 5, 5, 6).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    y, _ = m.apply(v, jnp.asarray(x), train=True, mutable=["batch_stats"])
    inorm = torch.nn.InstanceNorm2d(6, eps=1e-5, affine=True)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    yt = torch.nn.functional.leaky_relu(inorm(xt), 0.01)
    np.testing.assert_allclose(np.asarray(y), yt.detach().permute(0, 2, 3, 1).numpy(),
                               atol=1e-4)


def test_abr_train_mode_runs():
    from cl4wsis_tpu.core.norms import ABR
    m = ABR(features=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 3, 4)) * 2 + 1
    v = m.init(jax.random.PRNGKey(0), x, train=True)
    y, st = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(y)).all()
    # momentum=1.0 (torch 0.0): running stats frozen
    np.testing.assert_allclose(np.asarray(st["batch_stats"]["mean"]), 0.0)


def test_norm_factory_wiring():
    from cl4wsis_tpu.core.norms import norm_factory, ABR, AIN
    from cl4wsis_tpu.core.abn import ABN
    assert norm_factory("iabn_sync") is ABN
    assert norm_factory("abr") is ABR
    assert norm_factory("ain") is AIN
