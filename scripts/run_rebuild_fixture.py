"""Run the REBUILD end-to-end on the same mini-VOC fixture as
scripts/run_reference_fixture.py, with the same 3-stage hyperparameters,
and print one JSON line per stage with the per-epoch loss trajectory and
final validation metrics.

Together with the reference run this produces the side-by-side
same-pipeline parity table (VERDICT r2 item 4): identical fixture images /
annotations / splits, identical stage protocol (step-0 supervised BCE ->
phase-1 CAM -> phase-2 instance), reference `/root/reference/run.py`
driving torch-CPU vs this CLI driving JAX. Losses are compared as
trajectories (inits differ by framework RNG), final metrics side by side.

Usage (after run_reference_fixture.py wrote the fixture):
    python scripts/run_rebuild_fixture.py --root /tmp/refrun4 [--platform cpu]
"""

import argparse
import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _stage_args(stage, a, root):
    """Mirror run_reference_fixture._stage_args flag for flag."""
    common = [
        "--dataset", "voc", "--task", "15-5", "--overlap", "true",
        "--batch_size", str(a.batch), "--crop_size", str(a.size),
        "--crop_size_val", str(a.size), "--val_interval", "100",
        "--random_seed", str(a.seed), "--no_pretrained", "true",
        "--data_root", os.path.join(root, "data"),
        "--checkpoint", os.path.join(root, "rebuild_ckpt"),
        "--logdir", os.path.join(root, "rebuild_logs"),
        "--dtype", "float32", "--sample_num", "0",
        "--epochs", str(a.epochs),
        # per-epoch orbax saves pull the full state off-device every epoch
        # (~minutes per epoch through a TPU tunnel); the final epoch always
        # saves, which is all the next stage needs
        "--ckpt_interval", str(max(1, a.epochs // 3)),
    ]
    if a.torch_init:
        common += ["--torch_init", "true"]
    if stage == "step0":
        return common + ["--step", "0", "--name", "RB", "--bce", "true",
                         "--optim", "adam", "--lr", a.lr0,
                         "--weight_decay", "0"]
    ckpt0 = os.path.join(root, "rebuild_ckpt", "step", "voc-15-5-ov", "RB_0")
    stage1 = ["--step", "1", "--weakly", "true", "--alpha", "0.5",
              "--step_ckpt", ckpt0, "--loss_de", "1",
              "--lr_policy", "warmup", "--affinity", "true",
              "--pseudo_ep", "1"]
    if stage == "phase1":
        return common + stage1 + ["--name", "RB1", "--phase", "1",
                                  "--optim", "sgd", "--lr", "1e-3"]
    ckpt1 = os.path.join(root, "rebuild_ckpt", "step", "voc-15-5-ov", "RB1_1")
    return common + stage1 + ["--name", "RB2", "--phase", "2",
                              "--optim", "adam", "--lr", "5e-5",
                              "--weight_decay", "0",
                              "--seg_ckpt", ckpt1]


def _collect(logdir, task_name, name):
    """Per-epoch losses + final metrics from the Logger JSONL."""
    out = {"loss": [], "final": {}}
    for p in sorted(glob.glob(os.path.join(logdir, task_name, name,
                                           "*.jsonl"))):
        with open(p) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if rec.get("type") == "epoch" and "Loss/loss" in rec:
                    out["loss"].append(round(float(rec["Loss/loss"]), 4))
                for k in ("map", "map50", "Mean IoU", "Mean Acc"):
                    if k in rec:
                        out["final"][k] = (round(float(rec[k]), 4)
                                           if not isinstance(rec[k], list)
                                           else rec[k])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/refrun4")
    ap.add_argument("--stage", default="all",
                    choices=["step0", "phase1", "phase2", "all"])
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--torch_init", action="store_true",
                    help="torch-family init (matches the reference scale)")
    ap.add_argument("--platform", default=None,
                    help="cpu to force XLA:CPU; default = session platform")
    ap.add_argument("--images", type=int, default=16)
    ap.add_argument("--wrap", action="store_true")
    ap.add_argument("--paint", action="store_true",
                    help="learnable fixture: class-colored painted objects")
    ap.add_argument("--lr0", default="5e-5",
                    help="step-0 lr (mirror run_reference_fixture --lr0)")
    a = ap.parse_args()

    if a.platform:
        import jax
        jax.config.update("jax_platforms", a.platform)

    fixture = os.path.join(a.root, "data")
    if not os.path.exists(os.path.join(fixture, "voc",
                                       "pascal_sbd_train.json")):
        sys.path.insert(0, REPO)
        from tests.test_data import _write_fake_voc
        _write_fake_voc(fixture, n_images=a.images, size=a.size, rich=True,
                        wrap=a.wrap, paint=a.paint)
        print(f"fixture: wrote mini-VOC ({a.images} imgs @ {a.size}^2, "
              f"paint={a.paint}) to {fixture}", flush=True)

    from cl4wsis_tpu.cli.main import main as cli_main

    names = {"step0": "RB", "phase1": "RB1", "phase2": "RB2"}
    stages = [a.stage] if a.stage != "all" else ["step0", "phase1", "phase2"]
    for stage in stages:
        argv = _stage_args(stage, a, a.root)
        print(f"=== rebuild {stage}: starting ===", flush=True)
        t0 = time.time()
        rc = cli_main(argv)
        rec = {"stage": stage, "rc": rc,
               "wall_s": round(time.time() - t0, 1)}
        rec.update(_collect(os.path.join(a.root, "rebuild_logs"),
                            "voc-15-5-ov", names[stage]))
        print(json.dumps(rec), flush=True)
        if rc != 0:
            sys.exit(rc)


if __name__ == "__main__":
    main()
