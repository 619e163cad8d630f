"""Full 3-stage CLI chain on synthetic data: step-0 supervised -> step-1
phase-1 CL-WSSS (loads step-0 ckpt) -> step-1 phase-2 CL4WSIS (loads step-0
ckpt + phase-1 seg ckpt). This is the reference scripts/run.sh protocol
end-to-end (reference scripts/run.sh:12-40) at toy scale."""

import os

import pytest

from cl4wsis_tpu.cli.main import main


@pytest.mark.slow
def test_three_stage_chain(tmp_path):
    ckpt_root = str(tmp_path / "checkpoints")
    common = [
        "--synthetic", "true", "--tiny", "true", "--dataset", "voc",
        "--task", "15-5", "--batch_size", "8", "--crop_size", "64",
        "--checkpoint", ckpt_root, "--dtype", "float32",
        "--kernel", "15", "--val_kernel", "15", "--epochs", "1",
    ]
    # step 0: supervised base
    assert main(common + ["--step", "0", "--name", "exp", "--bce", "true",
                          "--optim", "adam", "--lr", "5e-5"]) == 0
    step0 = os.path.join(ckpt_root, "step", "voc-15-5-ov", "exp_0")
    assert os.path.exists(step0)

    # step 1 phase 1: CL-WSSS (loads step-0 ckpt via --step_ckpt)
    assert main(common + ["--step", "1", "--name", "exp_p1", "--weakly", "true",
                          "--phase", "1", "--optim", "sgd", "--lr", "1e-3",
                          "--lr_policy", "warmup", "--loss_de", "1",
                          "--affinity", "true", "--pseudo_ep", "0",
                          "--step_ckpt", step0]) == 0
    p1 = os.path.join(ckpt_root, "step", "voc-15-5-ov", "exp_p1_1")
    assert os.path.exists(p1)

    # step 1 phase 2: CL4WSIS instance (loads phase-1 seg ckpt)
    assert main(common + ["--step", "1", "--name", "exp_p2", "--weakly", "true",
                          "--phase", "2", "--optim", "adam", "--lr", "5e-5",
                          "--step_ckpt", step0, "--seg_ckpt", p1]) == 0
    assert os.path.exists(os.path.join(ckpt_root, "step", "voc-15-5-ov",
                                       "exp_p2_1"))
