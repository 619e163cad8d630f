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


def _count_leaves(tree):
    return len(jax.tree_util.tree_leaves(tree))


def test_convert_torch_full_model():
    """Synthetic full-model torch state dict (reference key layout) converts
    into a tree that slots into the flax init and covers every parameter."""
    from cl4wsis_tpu.cl.ckpt import convert_torch_cl4wsis

    m, v = _init((4, 2))  # tiny backbone, classes (4,2)
    rs = np.random.RandomState(0)
    sd = {}

    def t4(p):  # flax (kh,kw,cin,cout) -> torch (cout,cin,kh,kw)
        return np.asarray(p).transpose(3, 2, 0, 1)

    # backbone
    def emit_bn(prefix, node, stat):
        sd[f"{prefix}.weight"] = np.asarray(node["scale"])
        sd[f"{prefix}.bias"] = np.asarray(node["bias"])
        sd[f"{prefix}.running_mean"] = np.asarray(stat["mean"])
        sd[f"{prefix}.running_var"] = np.asarray(stat["var"])

    bp, bs = v["params"]["body"], v["batch_stats"]["body"]
    sd["body.mod1.conv1.weight"] = t4(bp["mod1_conv1"]["kernel"])
    emit_bn("body.mod1.bn1", bp["mod1_bn1"], bs["mod1_bn1"])
    for mod in range(2, 6):
        base = f"mod{mod}_block1"
        for c in ("conv1", "conv2", "conv3"):
            sd[f"body.mod{mod}.block1.convs.{c}.weight"] = t4(bp[base][c]["kernel"])
        for b in ("bn1", "bn2", "bn3"):
            emit_bn(f"body.mod{mod}.block1.convs.{b}", bp[base][b], bs[base][b])
        sd[f"body.mod{mod}.block1.proj_conv.weight"] = t4(bp[base]["proj_conv"]["kernel"])
        emit_bn(f"body.mod{mod}.block1.proj_bn", bp[base]["proj_bn"], bs[base]["proj_bn"])

    # deeplab head
    hp, hs = v["params"]["seg_head"], v["batch_stats"]["seg_head"]
    for i in range(4):
        sd[f"head.map_convs.{i}.weight"] = t4(hp[f"map_conv{i}"]["kernel"])
    emit_bn("head.map_bn", hp["map_bn"], hs["map_bn"])
    sd["head.global_pooling_conv.weight"] = t4(hp["global_pooling_conv"]["kernel"])
    emit_bn("head.global_pooling_bn", hp["global_pooling_bn"], hs["global_pooling_bn"])
    sd["head.red_conv.weight"] = t4(hp["red_conv"]["kernel"])
    sd["head.pool_red_conv.weight"] = t4(hp["pool_red_conv"]["kernel"])
    emit_bn("head.red_bn", hp["red_bn"], hs["red_bn"])

    # classifiers
    for i in range(2):
        sd[f"cls.{i}.weight"] = t4(v["params"]["cls"][f"cls_{i}"]["kernel"])
        sd[f"cls.{i}.bias"] = np.asarray(v["params"]["cls"][f"cls_{i}"]["bias"])

    # instance decoder
    dp, ds = v["params"]["instance_decoder"], v["batch_stats"]["instance_decoder"]
    for i in range(4):
        sd[f"decoder.instance_decoder.aspp.convs.{i}.0.weight"] = \
            t4(dp["aspp"][f"branch{i}"]["conv"]["kernel"])
        emit_bn(f"decoder.instance_decoder.aspp.convs.{i}.1",
                dp["aspp"][f"branch{i}"]["bn"], ds["aspp"][f"branch{i}"]["bn"])
    sd["decoder.instance_decoder.aspp.convs.4.aspp_pooling.1.weight"] = \
        t4(dp["aspp"]["pool_conv"]["kernel"])
    sd["decoder.instance_decoder.aspp.project.0.weight"] = \
        t4(dp["aspp"]["project_conv"]["kernel"])
    emit_bn("decoder.instance_decoder.aspp.project.1",
            dp["aspp"]["project_bn"], ds["aspp"]["project_bn"])
    for i in range(3):
        sd[f"decoder.instance_decoder.project.{i}.0.weight"] = \
            t4(dp[f"project_{i}"]["conv"]["kernel"])
        emit_bn(f"decoder.instance_decoder.project.{i}.1",
                dp[f"project_{i}"]["bn"], ds[f"project_{i}"]["bn"])
        fb = f"decoder.instance_decoder.fuse.{i}"
        sd[f"{fb}.0.0.0.weight"] = t4(dp[f"fuse_{i}"]["depthwise"]["conv"]["kernel"])
        emit_bn(f"{fb}.0.0.1", dp[f"fuse_{i}"]["depthwise"]["bn"],
                ds[f"fuse_{i}"]["depthwise"]["bn"])
        sd[f"{fb}.0.1.weight"] = t4(dp[f"fuse_{i}"]["pointwise"]["kernel"])
        emit_bn(f"{fb}.0.2", dp[f"fuse_{i}"]["pointwise_bn"],
                ds[f"fuse_{i}"]["pointwise_bn"])

    # instance head
    ip, isd = v["params"]["instance_head"], v["batch_stats"]["instance_head"]
    for head, fuse in [("center", "center_fuse"), ("offset", "offset_fuse")]:
        fb = f"instance_head.classifier.{head}.fuse"
        sd[f"{fb}.0.0.0.weight"] = t4(ip[fuse]["depthwise"]["conv"]["kernel"])
        emit_bn(f"{fb}.0.0.1", ip[fuse]["depthwise"]["bn"], isd[fuse]["depthwise"]["bn"])
        sd[f"{fb}.0.1.weight"] = t4(ip[fuse]["pointwise"]["kernel"])
        emit_bn(f"{fb}.0.2", ip[fuse]["pointwise_bn"], isd[fuse]["pointwise_bn"])
    for i in range(2):
        sd[f"instance_head.classifier.center.cls.{i}.weight"] = \
            t4(ip[f"center_cls_{i}"]["kernel"])
        sd[f"instance_head.classifier.center.cls.{i}.bias"] = \
            np.asarray(ip[f"center_cls_{i}"]["bias"])
    sd["instance_head.classifier.offset.cls.0.weight"] = t4(ip["offset_cls_0"]["kernel"])
    sd["instance_head.classifier.offset.cls.0.bias"] = np.asarray(ip["offset_cls_0"]["bias"])

    conv = convert_torch_cl4wsis(sd, abs_bn_weight=False)
    merged_p = tree_merge(v["params"], conv["params"])
    merged_s = tree_merge(v["batch_stats"], conv["batch_stats"])
    # structure preserved, every converted leaf covers an existing one
    assert jax.tree_util.tree_structure(merged_p) == \
        jax.tree_util.tree_structure(v["params"])
    assert _count_leaves(conv["params"]) == _count_leaves(v["params"])
    assert _count_leaves(conv["batch_stats"]) == _count_leaves(v["batch_stats"])
    # round-trip exactness (the sd was built FROM v)
    for a, b in zip(jax.tree_util.tree_leaves(merged_p),
                    jax.tree_util.tree_leaves(v["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # converted model runs
    out, _ = _init((4, 2))[0].apply({"params": merged_p, "batch_stats": merged_s},
                                    jnp.zeros((1, 64, 64, 3)), train=False)
    assert out["seg"].shape[-1] == 6
