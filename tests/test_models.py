import jax
import jax.numpy as jnp
import numpy as np

from cl4wsis_tpu.models import CL4WSISModel, make_model
from cl4wsis_tpu.models.resnet import ResNet


def _tiny_resnet(**kw):
    # structure (1,1,1,1) keeps CPU tests fast while exercising every stage
    return ResNet(structure=(1, 1, 1, 1), **kw)


def test_resnet_stage_shapes_os16():
    m = _tiny_resnet(output_stride=16)
    x = jnp.zeros((1, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    outs = m.apply(variables, x, train=False)
    assert outs["res1"].shape == (1, 16, 16, 64)
    assert outs["res2"].shape == (1, 16, 16, 256)
    assert outs["res3"].shape == (1, 8, 8, 512)
    assert outs["res4"].shape == (1, 4, 4, 1024)
    assert outs["res5"].shape == (1, 4, 4, 2048)


def test_resnet_stage_shapes_os8():
    m = _tiny_resnet(output_stride=8)
    x = jnp.zeros((1, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    outs = m.apply(variables, x, train=False)
    assert outs["res4"].shape == (1, 8, 8, 1024)
    assert outs["res5"].shape == (1, 8, 8, 2048)


def _init_model(classes=(4, 2), **kw):
    # 1-block-per-stage backbone keeps CPU tests fast
    m = CL4WSISModel(classes=classes, pooling_size=4,
                     backbone_structure=(1, 1, 1, 1), **kw)
    x = jnp.zeros((1, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    return m, variables


def test_model_forward_shapes():
    m, variables = _init_model()
    x = jnp.zeros((2, 64, 64, 3))
    pred, feats = m.apply(variables, x, train=False)
    assert pred["seg"].shape == (2, 64, 64, 6)
    assert pred["center"].shape == (2, 64, 64, 5)  # 6 classes - bg
    assert pred["offset"].shape == (2, 64, 64, 2)
    assert feats["body"].shape == (2, 4, 4, 2048)


def test_model_no_interpolate():
    m, variables = _init_model()
    x = jnp.zeros((1, 64, 64, 3))
    pred, _ = m.apply(variables, x, train=False, interpolate=False)
    assert pred["seg"].shape == (1, 4, 4, 6)       # OS16 head resolution
    assert pred["center"].shape == (1, 16, 16, 5)  # decoder at res2 (/4)


def test_forward_seg_only():
    m, variables = _init_model()
    x = jnp.zeros((1, 64, 64, 3))
    pred, feats = m.apply(variables, x, train=False, method="forward_seg")
    assert set(pred.keys()) == {"seg"}
    assert set(feats["features"].keys()) == {"res1", "res2", "res3", "res4", "res5"}


def test_forward_instance_on_features():
    """Phase-2 path: instance branch applied to precomputed features."""
    m, variables = _init_model()
    x = jnp.zeros((1, 64, 64, 3))
    _, feats = m.apply(variables, x, train=False, method="forward_seg")
    out = m.apply(variables, feats["features"], train=False, method="forward_instance")
    assert out["center"].shape == (1, 16, 16, 5)
    assert out["offset"].shape == (1, 16, 16, 2)


def test_incremental_classifier_old_logits_stable():
    """Adding a step must not change old-class logits (param isolation)."""
    m1, v1 = _init_model(classes=(4,))
    m2, v2 = _init_model(classes=(4, 2))
    # copy shared params from the 1-step model into the 2-step model
    import flax
    p2 = flax.core.unfreeze(v2["params"])

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                merge(dst[k], v)
            else:
                dst[k] = v
    merge(p2, flax.core.unfreeze(v1["params"]))
    v2 = {"params": p2, "batch_stats": v1["batch_stats"]}

    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 3))
    pred1, _ = m1.apply(v1, x, train=False)
    pred2, _ = m2.apply(v2, x, train=False)
    np.testing.assert_allclose(np.asarray(pred1["seg"]),
                               np.asarray(pred2["seg"][..., :4]), atol=1e-5)


def test_train_mode_updates_stats():
    m, variables = _init_model()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    (pred, _), updated = m.apply(variables, x, train=True,
                                 mutable=["batch_stats"],
                                 rngs={"dropout": jax.random.PRNGKey(2)})
    before = variables["batch_stats"]["body"]["mod1_bn1"]["mean"]
    after = updated["batch_stats"]["body"]["mod1_bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_resnet_variant_factories():
    """Reference exposes 18/34/50/101/152 (models/resnet.py:126-138); the
    basic-block nets (18/34) top out at 512 channels."""
    from cl4wsis_tpu.models import resnet18, resnet34, resnet50, resnet101, resnet152
    assert resnet18().structure == (2, 2, 2, 2) and not resnet18().bottleneck
    assert resnet34().structure == (3, 4, 6, 3) and not resnet34().bottleneck
    assert resnet50().structure == (3, 4, 6, 3) and resnet50().bottleneck
    assert resnet101().structure == (3, 4, 23, 3)
    assert resnet152().structure == (3, 8, 36, 3)
    assert resnet18().out_channels == 512
    assert resnet101().out_channels == 2048


def test_basicblock_backbone_assembly():
    """make_model dispatches resnet18/34 with 512-ch res5 into the heads."""
    m = CL4WSISModel(classes=(4, 2), backbone="resnet18", pooling_size=4,
                     backbone_structure=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    pred, feats = m.apply(variables, x, train=False)
    assert pred["seg"].shape == (1, 64, 64, 6)
    assert pred["center"].shape == (1, 64, 64, 5)
    assert feats["body"].shape == (1, 4, 4, 512)


def test_wide_resnet38_shapes():
    from cl4wsis_tpu.models.wide_resnet import WiderResNet38A2
    m = WiderResNet38A2(structure=(1, 1, 1, 1, 1, 1))  # tiny for CPU
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    outs = m.apply(v, x, train=False)
    assert outs["res1"].shape == (1, 16, 16, 256)    # /4, pre-act of mod4
    assert outs["res2"].shape == (1, 8, 8, 512)      # /8
    assert outs["res3"].shape == (1, 8, 8, 1024)
    assert outs["res4"].shape == (1, 8, 8, 2048)
    assert outs["res5"].shape == (1, 8, 8, 4096)


def test_wide_resnet_model_assembly():
    from cl4wsis_tpu.models.wide_resnet import WiderResNet38A2
    m = CL4WSISModel(classes=(3, 2), backbone="wider_resnet38_a2",
                     output_stride=8, pooling_size=2)
    # patch a tiny structure through a subclassless trick: init is too heavy
    # otherwise on 1 CPU core; use the full assembly only for tree structure
    x = jnp.zeros((1, 64, 64, 3))
    # structure override not wired for wide backbone; just check it builds lazily
    import flax.linen as nn
    tabulated = None
    try:
        variables = jax.eval_shape(
            lambda: m.init(jax.random.PRNGKey(0), x, train=False))
        tabulated = True
    except Exception as e:  # pragma: no cover
        raise AssertionError(f"wide assembly failed: {e}")
    assert tabulated
