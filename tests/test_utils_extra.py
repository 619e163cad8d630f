import jax.numpy as jnp
import numpy as np

from cl4wsis_tpu.models.tta import test_augmentation as tta_fuse
from cl4wsis_tpu.utils.visualize import (Label2Color, denorm, label_to_one_hot,
                                         voc_cmap)


def test_tta_mean_flip_identity_fn():
    """For a flip-equivariant fn, TTA fusion equals the plain output."""
    def fn(x):
        return jnp.concatenate([x, 1 - x], axis=-1)  # per-pixel, equivariant

    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 1), jnp.float32)
    fused, pred = tta_fuse(fn, x, scales=(1.0,), do_flip=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(fn(x)), atol=1e-6)
    assert pred.shape == (1, 8, 8)


def test_tta_multiscale_runs():
    def fn(x):
        return jnp.tile(jnp.mean(x, axis=-1, keepdims=True), (1, 1, 1, 3))

    x = jnp.asarray(np.random.RandomState(1).rand(1, 16, 16, 3), jnp.float32)
    fused, _ = tta_fuse(fn, x, scales=(0.75, 1.0, 1.25), do_flip=True)
    assert fused.shape == (1, 16, 16, 3)


def test_voc_cmap_and_label2color():
    cmap = voc_cmap()
    assert cmap.shape == (256, 3)
    assert cmap[0].tolist() == [0, 0, 0]
    assert cmap[1].tolist() == [128, 0, 0]  # aeroplane classic maroon
    l2c = Label2Color(cmap)
    img = l2c(np.array([[0, 1], [2, 3]]))
    assert img.shape == (2, 2, 3)


def test_denorm_onehot():
    x = np.zeros((2, 2, 3), np.float32)
    d = denorm(x)
    np.testing.assert_allclose(d[0, 0], [0.485, 0.456, 0.406], atol=1e-6)
    oh = label_to_one_hot(np.array([0, 2]), 3)
    np.testing.assert_array_equal(oh, [[1, 0, 0], [0, 0, 1]])


def test_logger_add_image(tmp_path):
    import os
    from cl4wsis_tpu.utils.logging import Logger
    lg = Logger(str(tmp_path), rank=0, name="t")
    lg.add_image("val/sample", np.random.rand(8, 8, 3), step=3)
    assert os.path.exists(str(tmp_path / "images" / "val_sample_3.png"))
    lg.close()


def test_logger_table_and_figure(tmp_path):
    import os
    from cl4wsis_tpu.metrics.stream import StreamSegMetrics
    from cl4wsis_tpu.utils.logging import Logger
    lg = Logger(str(tmp_path), rank=0, name="tf")
    lg.add_table("results", [[0, 0.5], [1, 0.7]], columns=["cls", "iou"])
    m = StreamSegMetrics(3)
    m.update(np.array([[0, 1, 2]]), np.array([[0, 1, 1]]))
    fig = m.confusion_figure()
    lg.add_figure("val/confusion", fig, step=1)
    assert os.path.exists(str(tmp_path / "figures" / "val_confusion_1.png"))
    lg.close()


def test_full_colormap_surface_matches_reference_tables():
    """ade_cmap/_COLORS are transcriptions of the reference's published
    palette tables (utils/utils.py:78-239, 280-357); when the reference
    tree is present, compare bit-for-bit."""
    import os
    import re

    from cl4wsis_tpu.utils import visualize as V

    ade = V.ade_cmap()
    assert ade.shape == (256, 3) and ade.dtype == np.uint8
    assert (ade[0] == 0).all() and (ade[151:] == 0).all()
    assert V._COLORS.shape == (73, 3)
    assert V._COLORS.min() >= 0.0 and V._COLORS.max() <= 1.0

    out = V.label_to_color_image(np.array([[0, 1], [72, 73]]))
    assert out.shape == (2, 2, 3)
    assert np.allclose(out[1, 1], V._COLORS[0])  # wraps mod 73

    assert V.color_map("voc").shape == (256, 3)
    assert (V.color_map("coco-voc") == ade).all()
    assert V.color_map("cityscapes").shape == (20, 3)

    den = V.Denormalize((0.5, 0.5, 0.5), (0.2, 0.2, 0.2))
    x = np.full((2, 2, 3), -2.5, np.float32)
    assert np.allclose(den(x), 0.0)

    ref = "/root/reference/utils/utils.py"
    if os.path.exists(ref):
        src = open(ref).read()
        seg = src[src.index("def ade_cmap"):src.index("def voc_cmap")]
        rows = np.array(re.findall(r"\[\s*(\d+),\s*(\d+),\s*(\d+)\]", seg),
                        np.uint8)
        assert (ade[:151] == rows).all()
        seg = src[src.index("_COLORS"):src.index("def label_to_color_image")]
        vals = np.array(re.findall(r"(\d\.\d+)", seg),
                        np.float32).reshape(-1, 3)
        assert np.abs(V._COLORS - vals).max() < 1e-6
