"""CLI on the fabricated mini-VOC fixture: real data pipeline + final
instance mAP validation, and phase-1 CAM mIoU validation."""

import os

import numpy as np

import pytest

from cl4wsis_tpu.cli.main import main
from tests.test_data import _write_fake_voc


@pytest.mark.slow
def test_cli_voc_step0_with_validation(tmp_path):
    _write_fake_voc(str(tmp_path), n_images=16, size=48)
    ckpt = str(tmp_path / "ck")
    logdir = str(tmp_path / "logs")
    rc = main(["--data_root", str(tmp_path), "--dataset", "voc",
               "--task", "15-5", "--step", "0", "--name", "t",
               "--tiny", "true", "--epochs", "1", "--batch_size", "8",
               "--crop_size", "48", "--crop_size_val", "48",
               "--checkpoint", ckpt, "--dtype", "float32",
               "--bce", "true", "--optim", "adam", "--lr", "5e-5",
               "--kernel", "15", "--val_kernel", "15",
               "--logdir", logdir, "--pretrained", "false"])
    assert rc == 0
    step0 = os.path.join(ckpt, "step", "voc-15-5-ov", "t_0")
    assert os.path.exists(step0)
    # logger output in the reference layout: {logdir}/{task_name}/{name}/
    assert os.path.exists(os.path.join(logdir, "voc-15-5-ov", "t", "t.jsonl"))

    # phase 1 on the same fixture incl. CAM mIoU validation
    rc = main(["--data_root", str(tmp_path), "--dataset", "voc",
               "--task", "15-5", "--step", "1", "--name", "t1",
               "--tiny", "true", "--epochs", "1", "--batch_size", "8",
               "--crop_size", "48", "--crop_size_val", "48",
               "--checkpoint", ckpt, "--dtype", "float32",
               "--weakly", "true", "--phase", "1", "--optim", "sgd",
               "--lr", "1e-3", "--pseudo_ep", "0", "--affinity", "true",
               "--loss_de", "1", "--step_ckpt", step0,
               "--pretrained", "false"])
    assert rc == 0


@pytest.mark.slow
def test_cli_alternative_norm(tmp_path):
    """--norm_act abr trains through the full CLI (custom_bn parity path)."""
    _write_fake_voc(str(tmp_path), n_images=16, size=48)
    rc = main(["--data_root", str(tmp_path), "--dataset", "voc",
               "--task", "15-5", "--step", "0", "--name", "abr",
               "--tiny", "true", "--epochs", "1", "--batch_size", "8",
               "--crop_size", "48", "--crop_size_val", "48",
               "--checkpoint", str(tmp_path / "ck"), "--dtype", "float32",
               "--bce", "true", "--optim", "adam", "--lr", "5e-5",
               "--kernel", "15", "--val_kernel", "15",
               "--norm_act", "abr", "--pretrained", "false"])
    assert rc == 0


@pytest.mark.slow
def test_cli_test_only_mode(tmp_path):
    """--test true: no training, evaluate the resumed checkpoint."""
    _write_fake_voc(str(tmp_path), n_images=16, size=48)
    ckpt = str(tmp_path / "ck")
    common = ["--data_root", str(tmp_path), "--dataset", "voc",
              "--task", "15-5", "--step", "0", "--name", "t",
              "--tiny", "true", "--batch_size", "8",
              "--crop_size", "48", "--crop_size_val", "48",
              "--checkpoint", ckpt, "--dtype", "float32",
              "--bce", "true", "--optim", "adam", "--lr", "5e-5",
              "--kernel", "15", "--val_kernel", "15",
              "--pretrained", "false"]
    assert main(common + ["--epochs", "1"]) == 0
    assert main(common + ["--epochs", "1", "--test", "true",
                          "--continue_ckpt", "true"]) == 0


@pytest.mark.slow
def test_cli_sample_visualization(tmp_path):
    _write_fake_voc(str(tmp_path), n_images=16, size=48)
    ckpt = str(tmp_path / "ck")
    rc = main(["--data_root", str(tmp_path), "--dataset", "voc",
               "--task", "15-5", "--step", "0", "--name", "v",
               "--tiny", "true", "--epochs", "1", "--batch_size", "8",
               "--crop_size", "48", "--crop_size_val", "48",
               "--checkpoint", ckpt, "--dtype", "float32",
               "--bce", "true", "--optim", "adam", "--lr", "5e-5",
               "--kernel", "15", "--val_kernel", "15",
               "--sample_num", "2", "--pretrained", "false",
               "--logdir", str(tmp_path / "logs")])
    assert rc == 0
    import glob
    assert glob.glob(os.path.join(str(tmp_path / "logs"), "voc-15-5-ov",
                                  "v", "images", "*.png"))


@pytest.mark.slow
def test_cli_deeplabv3_semantic_only(tmp_path):
    """--model DeeplabV3: semantic-only CL (no instance branch), mIoU val."""
    _write_fake_voc(str(tmp_path), n_images=16, size=48)
    rc = main(["--data_root", str(tmp_path), "--dataset", "voc",
               "--task", "15-5", "--step", "0", "--name", "dl",
               "--model", "DeeplabV3", "--tiny", "true", "--epochs", "1",
               "--batch_size", "8", "--crop_size", "48",
               "--crop_size_val", "48", "--checkpoint", str(tmp_path / "ck"),
               "--dtype", "float32", "--bce", "true", "--optim", "adam",
               "--lr", "5e-5", "--pretrained", "false"])
    assert rc == 0


@pytest.mark.slow
def test_cli_pseudo_supervised_and_val_on_trainset(tmp_path):
    """--pseudo trains supervised from precomputed labels; --val_on_trainset
    evaluates on the train split."""
    root = str(tmp_path)
    _write_fake_voc(root, n_images=16, size=48)
    # fabricate pseudo labels for every image
    pdir = os.path.join(root, "voc", "mylab", "ins_seg_mylab")
    os.makedirs(pdir, exist_ok=True)
    masks = np.zeros((1, 48, 48), bool)
    masks[0, 8:24, 8:24] = True
    for i in range(16):
        np.save(os.path.join(pdir, f"img_{i:03d}.npy"),
                {"mask": masks, "class": np.array([15])})
    ckpt = str(tmp_path / "ck")
    common = ["--data_root", root, "--dataset", "voc", "--task", "15-5",
              "--tiny", "true", "--batch_size", "8", "--crop_size", "48",
              "--crop_size_val", "48", "--checkpoint", ckpt,
              "--dtype", "float32", "--kernel", "15", "--val_kernel", "15",
              "--pretrained", "false", "--epochs", "1"]
    assert main(common + ["--step", "0", "--name", "b", "--bce", "true",
                          "--optim", "adam", "--lr", "5e-5"]) == 0
    step0 = os.path.join(ckpt, "step", "voc-15-5-ov", "b_0")
    rc = main(common + ["--step", "1", "--name", "p", "--weakly", "true",
                        "--pseudo", "mylab", "--optim", "adam",
                        "--lr", "5e-5", "--step_ckpt", step0,
                        "--val_on_trainset", "true"])
    assert rc == 0
