import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cl4wsis_tpu.cl.ckpt import (convert_torch_resnet, expand_for_new_step,
                                 init_balanced_classifier, load_checkpoint,
                                 save_checkpoint, tree_merge, ckpt_path)
from cl4wsis_tpu.models import CL4WSISModel


def _init(classes):
    m = CL4WSISModel(classes=classes, pooling_size=2,
                     backbone_structure=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    return m, m.init(jax.random.PRNGKey(0), x, train=False)


def test_expand_for_new_step_preserves_old_logits():
    m1, v1 = _init((4,))
    m2, v2 = _init((4, 2))
    merged = expand_for_new_step(v2, v1, classes=(4, 2))
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 64, 64, 3))
    p1, _ = m1.apply(v1, x, train=False)
    p2, _ = m2.apply(merged, x, train=False)
    np.testing.assert_allclose(np.asarray(p1["seg"]),
                               np.asarray(p2["seg"][..., :4]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(p1["center"]),
                               np.asarray(p2["center"][..., :3]), atol=1e-5)


def test_init_balanced():
    _, v = _init((4, 2))
    p = init_balanced_classifier(v["params"], (4, 2), cls_path=("cls",))
    c0 = p["cls"]["cls_0"]
    c1 = p["cls"]["cls_1"]
    # new weights = bkg weight row, new bias = bkg_bias - log(3)
    np.testing.assert_allclose(np.asarray(c1["kernel"][..., 0]),
                               np.asarray(c0["kernel"][..., 0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1["bias"]),
                               np.asarray(c0["bias"][0]), atol=1e-6)


def test_save_load_roundtrip(tmp_path):
    _, v = _init((3,))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, {"variables": v, "epoch": 7})
    restored = load_checkpoint(path)
    assert restored["epoch"] == 7
    lk = jax.tree_util.tree_leaves(v["params"])
    lr = jax.tree_util.tree_leaves(restored["variables"]["params"])
    for a, b in zip(lk, lr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_ckpt_path():
    assert ckpt_path("checkpoints", "voc", "15-5", True, "exp", 1) == \
        "checkpoints/step/voc-15-5-ov/exp_1"


def test_convert_torch_resnet():
    torch = pytest.importorskip("torch")
    from cl4wsis_tpu.models.resnet import ResNet

    # tiny torch-like state dict mirroring reference resnet key layout
    sd = {}
    sd["mod1.conv1.weight"] = np.random.RandomState(0).randn(64, 3, 7, 7).astype(np.float32)
    for f in ["weight", "bias", "running_mean", "running_var"]:
        sd[f"mod1.bn1.{f}"] = (np.abs(np.random.RandomState(1).randn(64)) + 0.5).astype(np.float32)
    # one bottleneck block per mod, matching structure (1,1,1,1)
    cin = [64, 256, 512, 1024]
    ch = [(64, 64, 256), (128, 128, 512), (256, 256, 1024), (512, 512, 2048)]
    rs = np.random.RandomState(2)
    for mi, (ci, (c0, c1, c2)) in enumerate(zip(cin, ch), start=2):
        b = f"mod{mi}.block1"
        sd[f"{b}.convs.conv1.weight"] = rs.randn(c0, ci, 1, 1).astype(np.float32)
        sd[f"{b}.convs.conv2.weight"] = rs.randn(c1, c0, 3, 3).astype(np.float32)
        sd[f"{b}.convs.conv3.weight"] = rs.randn(c2, c1, 1, 1).astype(np.float32)
        sd[f"{b}.proj_conv.weight"] = rs.randn(c2, ci, 1, 1).astype(np.float32)
        for bn, c in [("bn1", c0), ("bn2", c1), ("bn3", c2), ("proj_bn", c2)]:
            pre = f"{b}.convs.{bn}" if bn.startswith("bn") else f"{b}.{bn}"
            for f, v in [("weight", np.abs(rs.randn(c)) + 0.5), ("bias", rs.randn(c)),
                         ("running_mean", rs.randn(c)), ("running_var", np.abs(rs.randn(c)) + 0.5)]:
                sd[f"{pre}.{f}"] = v.astype(np.float32)

    converted = convert_torch_resnet(sd)
    model = ResNet(structure=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    ref = model.init(jax.random.PRNGKey(0), x, train=False)

    # structural match: converted tree slots into the flax init exactly
    merged_p = tree_merge(ref["params"], converted["params"])
    merged_s = tree_merge(ref["batch_stats"], converted["batch_stats"])
    assert jax.tree_util.tree_structure(merged_p) == \
        jax.tree_util.tree_structure(ref["params"])
    # every leaf was overwritten by the torch values
    n_conv = sum("kernel" in str(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(converted["params"])[0])
    assert n_conv == 1 + 4 * 4  # mod1 + 4 convs per block
    out = model.apply({"params": merged_p, "batch_stats": merged_s}, x, train=False)
    assert np.isfinite(np.asarray(out["res5"])).all()
