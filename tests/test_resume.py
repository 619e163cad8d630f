"""Checkpoint resume: --continue_ckpt restores params/optimizer/epoch and
continues training (reference run.py:99-106, train.py:773-795)."""

import os

import pytest

from cl4wsis_tpu.cli.main import main


@pytest.mark.slow
def test_continue_ckpt(tmp_path):
    ckpt_root = str(tmp_path / "ck")
    common = ["--synthetic", "true", "--tiny", "true", "--dataset", "voc",
              "--task", "15-5", "--batch_size", "8", "--crop_size", "64",
              "--checkpoint", ckpt_root, "--dtype", "float32",
              "--kernel", "15", "--val_kernel", "15",
              "--name", "r", "--step", "0", "--bce", "true",
              "--optim", "adam", "--lr", "5e-5"]
    assert main(common + ["--epochs", "1"]) == 0
    path = os.path.join(ckpt_root, "step", "voc-15-5-ov", "r_0")
    assert os.path.exists(path)
    # resume for a second epoch from the saved state
    assert main(common + ["--epochs", "2", "--continue_ckpt", "true"]) == 0
