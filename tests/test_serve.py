"""Serving API: checkpoint -> Predictor -> instances + COCO export."""

import numpy as np

import jax
import jax.numpy as jnp

from cl4wsis_tpu.cl.ckpt import save_checkpoint
from cl4wsis_tpu.models import CL4WSISModel
from cl4wsis_tpu.serve import Predictor


def _tiny_model_and_ckpt(tmp_path):
    m = CL4WSISModel(classes=(3,), pooling_size=2,
                     backbone_structure=(1, 1, 1, 1))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, {"state": {"params": {"model": v["params"]},
                                     "batch_stats": {"model": v["batch_stats"]}},
                           "epoch": 0})
    return m, v, path


def test_predictor_runs_and_exports(tmp_path):
    m, v, _ = _tiny_model_and_ckpt(tmp_path)
    pred = Predictor(m, v, val_kernel=15, size_buckets=(64,))
    img = (np.random.RandomState(0).rand(48, 56, 3) * 255).astype(np.uint8)
    res = pred(img)
    assert res.ins_map.shape == (48, 56)
    assert res.seg.shape == (48, 56)
    insts = res.instances()
    coco = res.to_coco(image_id=7)
    assert len(coco) == len(insts)
    for r in coco:
        assert r["image_id"] == 7
        assert "counts" in r["segmentation"]
    # shape-bucket cache: second call with another size reuses the bucket
    res2 = pred((np.random.RandomState(1).rand(32, 40, 3) * 255).astype(np.uint8))
    assert res2.ins_map.shape == (32, 40)
    assert len(pred._fns) == 1


def test_predictor_from_checkpoint(tmp_path):
    m, v, path = _tiny_model_and_ckpt(tmp_path)
    # from_checkpoint rebuilds a full-size model; use the direct ctor for the
    # tiny test model and just validate the checkpoint plumbing
    from cl4wsis_tpu.cl.ckpt import load_checkpoint
    blob = load_checkpoint(path)
    p2 = Predictor(m, {"params": blob["state"]["params"]["model"],
                       "batch_stats": blob["state"]["batch_stats"]["model"]},
                   val_kernel=15, size_buckets=(64,))
    img = (np.random.RandomState(2).rand(64, 64, 3) * 255).astype(np.uint8)
    out = p2(img)
    assert np.isfinite(out.scores).all()
