"""End-to-end torch-checkpoint converter verification (VERDICT r4 next #4):
the REFERENCE's own torch ResNet / WiderResNetA2 (built from
/root/reference/models with the inplace_abn shim) gets RANDOM weights and
random running statistics, its state_dict goes through
``cl/ckpt.py:convert_torch_resnet``, and the flax backbone must reproduce
the torch eval-mode forward on the same input.

This is the in-container proof that the iABN ImageNet-pretrained ingest
path (reference ``segmentation_module.py:37-57``) is correct today, ahead
of any data-equipped real-VOC parity run (see docs/realdata_parity.md).

The torch side runs in a subprocess (tests/_refnet_forward_worker.py) so
the reference's top-level packages never enter this process.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"),
    reason="reference checkout not available")


def _ref_forward(arch: str, tmp_path):
    out = str(tmp_path / f"{arch}.npz")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    p = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tests", "_refnet_forward_worker.py"), arch, out],
        env=env, capture_output=True, text=True, timeout=600)
    assert p.returncode == 0, p.stdout + p.stderr
    blob = np.load(out)
    sd = {k[3:]: blob[k] for k in blob.files if k.startswith("sd:")}
    return blob["input"], blob["output"], sd


def _apply_converted(model, sd, x_nchw):
    import jax
    import jax.numpy as jnp

    from cl4wsis_tpu.cl.ckpt import convert_torch_resnet, tree_merge

    # abs_bn_weight=False: the shim (like torch BN) uses the signed weight;
    # the |weight| ingest default exists for the real inplace_abn binaries
    conv = convert_torch_resnet(sd, abs_bn_weight=False)
    x = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    ref = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x,
                                     train=False))()
    merged_p = tree_merge(ref["params"], conv["params"])
    merged_s = tree_merge(ref["batch_stats"], conv["batch_stats"])
    # every torch tensor must have landed on an existing flax leaf: the
    # merged tree has the same structure AND the converted tree introduced
    # no new keys (tree_merge would have grown the tree otherwise)
    assert (jax.tree_util.tree_structure(merged_p)
            == jax.tree_util.tree_structure(ref["params"]))
    assert (jax.tree_util.tree_structure(merged_s)
            == jax.tree_util.tree_structure(ref["batch_stats"]))
    out = model.apply({"params": merged_p, "batch_stats": merged_s}, x,
                      train=False)
    return np.asarray(out["res5"]).transpose(0, 3, 1, 2)


@pytest.mark.slow
def test_resnet_converter_forward_agreement(tmp_path):
    from cl4wsis_tpu.models.resnet import ResNet

    x, ref_out, sd = _ref_forward("resnet", tmp_path)
    ours = _apply_converted(ResNet(structure=(1, 1, 1, 1)), sd, x)
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_wrn_converter_forward_agreement(tmp_path):
    from cl4wsis_tpu.models.wide_resnet import wider_resnet16_a2

    x, ref_out, sd = _ref_forward("wrn", tmp_path)
    ours = _apply_converted(wider_resnet16_a2(), sd, x)
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-4)
