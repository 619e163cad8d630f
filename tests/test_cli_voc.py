"""CLI on the fabricated mini-VOC fixture: real data pipeline + final
instance mAP validation, and phase-1 CAM mIoU validation."""

import os

import pytest

from cl4wsis_tpu.cli.main import main
from tests.test_data import _write_fake_voc


@pytest.mark.slow
def test_cli_voc_step0_with_validation(tmp_path):
    _write_fake_voc(str(tmp_path), n_images=16, size=48)
    ckpt = str(tmp_path / "ck")
    rc = main(["--data_root", str(tmp_path), "--dataset", "voc",
               "--task", "15-5", "--step", "0", "--name", "t",
               "--tiny", "true", "--epochs", "1", "--batch_size", "8",
               "--crop_size", "48", "--crop_size_val", "48",
               "--checkpoint", ckpt, "--dtype", "float32",
               "--bce", "true", "--optim", "adam", "--lr", "5e-5",
               "--kernel", "15", "--val_kernel", "15",
               "--pretrained", "false"])
    assert rc == 0
    step0 = os.path.join(ckpt, "step", "voc-15-5-ov", "t_0")
    assert os.path.exists(step0)
    # logger output exists
    assert os.path.exists(os.path.join(ckpt, "logs", "t.jsonl"))

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
               "--sample_num", "2", "--pretrained", "false"])
    assert rc == 0
    import glob
    assert glob.glob(os.path.join(ckpt, "logs", "images", "*.png"))


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
