"""Multi-step CL: VOC 10-5 protocol with two incremental steps
(reference scripts/run_10-5.sh) — classifier expansion chains twice."""

import os

import pytest

from cl4wsis_tpu.cli.main import main


@pytest.mark.slow
def test_10_5_two_steps(tmp_path):
    ckpt_root = str(tmp_path / "ck")
    common = [
        "--synthetic", "true", "--tiny", "true", "--dataset", "voc",
        "--task", "10-5", "--batch_size", "8", "--crop_size", "64",
        "--checkpoint", ckpt_root, "--dtype", "float32",
        "--kernel", "15", "--val_kernel", "15", "--epochs", "1",
    ]
    path = os.path.join(ckpt_root, "step", "voc-10-5-ov")

    assert main(common + ["--step", "0", "--name", "m", "--bce", "true",
                          "--optim", "adam", "--lr", "5e-5"]) == 0
    for step in (1, 2):
        prev = os.path.join(path, f"m_{step - 1}")
        assert os.path.exists(prev)
        # phase 1
        assert main(common + ["--step", str(step), "--name", "m",
                              "--weakly", "true", "--phase", "1",
                              "--optim", "sgd", "--lr", "1e-3",
                              "--pseudo_ep", "0", "--affinity", "true",
                              "--loss_de", "1", "--step_ckpt", prev]) == 0
        p1 = os.path.join(path, f"m_{step}")
        assert os.path.exists(p1)
        # phase 2 (overwrites m_{step}, like the reference recipe)
        assert main(common + ["--step", str(step), "--name", "m",
                              "--weakly", "true", "--phase", "2",
                              "--optim", "adam", "--lr", "5e-5",
                              "--step_ckpt", prev, "--seg_ckpt", p1]) == 0
    assert os.path.exists(os.path.join(path, "m_2"))
