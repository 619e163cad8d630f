"""Run the REFERENCE (/root/reference) end-to-end on the fabricated
mini-VOC fixture, on CPU, via the shim set in scripts/refshim/.

Purpose (VERDICT r2 item 4): upgrade "transcribed-op parity" to
"same-pipeline parity" — the reference's own run.py/train.py execute the
full 3-stage protocol (step-0 supervised, phase-1 CAM, phase-2 instance)
on the same fixture the rebuild's CLI tests use, so loss trajectories and
final metrics can be compared side by side on identical data.

The shims replace only environment-unavailable binaries (inplace_abn CUDA,
torchvision, pycocotools, chainercv, wandb) — reference code runs
unmodified. CUDA/DDP couplings are neutralized by monkeypatch before
import: tensors stay on CPU, DDP runs on a 1-process gloo group, AMP is
disabled (fp32; the rebuild's CPU tests also run fp32).

Usage (SOLO — 1-core host):
    python scripts/run_reference_fixture.py --root /tmp/refrun \
        --stage all --epochs 2 --size 64 --images 16
Prints one JSON line per stage with the per-epoch loss trajectory and
final validation scores.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIM = os.path.join(REPO, "scripts", "refshim")
for p in (REPO, "/root/reference", SHIM):
    if p in sys.path:
        sys.path.remove(p)
    sys.path.insert(0, p)  # SHIM ends up first


def _patch_torch():
    """Neutralize the reference's CUDA/DDP couplings (run.py:38-41,
    train.py:43,188-196,252) for a 1-process CPU run."""
    from contextlib import nullcontext

    import torch

    real_device = torch.device

    def device(*a, **k):
        if a and isinstance(a[0], int):
            return real_device("cpu")
        return real_device(*a, **k)

    torch.device = device
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.set_device = lambda *a, **k: None
    torch.cuda.manual_seed = lambda *a, **k: None
    torch.cuda.manual_seed_all = lambda *a, **k: None

    import torch.cuda.amp as amp

    class _Scaler(torch.amp.GradScaler):
        def __init__(self, *a, **k):
            super().__init__("cpu", enabled=False)

    amp.GradScaler = _Scaler
    amp.autocast = lambda *a, **k: nullcontext()

    import torch.nn.parallel as par
    real_ddp = par.DistributedDataParallel

    def ddp(module, device_ids=None, output_device=None, **kw):
        return real_ddp(module, **kw)

    par.DistributedDataParallel = ddp

    import torch.distributed as dist
    real_init = dist.init_process_group

    def init_pg(backend=None, **kw):
        if dist.is_initialized():  # run.main() per stage; init once
            return None
        return real_init(backend="gloo", **kw)

    dist.init_process_group = init_pg

    os.environ.setdefault("MASTER_ADDR", "127.0.0.1")
    os.environ.setdefault("MASTER_PORT", "29631")
    os.environ.setdefault("RANK", "0")
    os.environ.setdefault("WORLD_SIZE", "1")
    os.environ.setdefault("LOCAL_RANK", "0")


def _stage_args(stage, a):
    task = f"--dataset voc --task 15-5 --num_workers 0 --no_pretrained " \
           f"--batch_size {a.batch} --crop_size {a.size} " \
           f"--crop_size_val {a.size} --overlap --val_interval 100 " \
           f"--random_seed 42 --logdir {a.root}/logs --sample_num 0"
    if stage == "step0":
        return (f"--name REF --step 0 --bce --lr 5e-5 {task} "
                f"--epochs {a.epochs} --optim adam --weight_decay 0").split()
    ckpt0 = "checkpoints/step/voc-15-5-ov/REF_0.pth"
    if stage == "phase1":
        return (f"--name REF --step 1 --weakly {task} --alpha 0.5 "
                f"--lr 1e-3 --step_ckpt {ckpt0} --loss_de 1 "
                f"--lr_policy warmup --affinity --epochs {a.epochs} "
                f"--optim sgd --phase 1 --pseudo_ep 1").split()
    ckpt1 = "checkpoints/step/voc-15-5-ov/REF_1.pth"
    return (f"--name REF --step 1 --weakly {task} --alpha 0.5 --lr 5e-5 "
            f"--step_ckpt {ckpt0} --loss_de 1 --lr_policy warmup "
            f"--affinity --epochs {a.epochs} --optim adam --weight_decay 0 "
            f"--seg_ckpt {ckpt1} --phase 2 --pseudo_ep 1").split()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/refrun")
    ap.add_argument("--stage", default="all",
                    choices=["step0", "phase1", "phase2", "all"])
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--images", type=int, default=16)
    ap.add_argument("--batch", type=int, default=4)
    a = ap.parse_args()

    os.makedirs(a.root, exist_ok=True)
    fixture = os.path.join(a.root, "data")
    if not os.path.exists(os.path.join(fixture, "voc",
                                       "pascal_sbd_train.json")):
        from tests.test_data import _write_fake_voc
        _write_fake_voc(fixture, n_images=a.images, size=a.size)
        print(f"fixture: wrote mini-VOC ({a.images} imgs @ {a.size}^2) "
              f"to {fixture}", flush=True)

    _patch_torch()
    os.chdir(a.root)  # reference writes checkpoints/ relative to cwd
    os.makedirs("checkpoints/step", exist_ok=True)

    import argparser as ref_argparser

    stages = ([a.stage] if a.stage != "all"
              else ["step0", "phase1", "phase2"])
    for stage in stages:
        argv = _stage_args(stage, a) + ["--data_root", fixture]
        opts = ref_argparser.get_argparser().parse_args(argv)
        opts = ref_argparser.modify_command_options(opts)
        print(f"=== reference {stage}: starting ===", flush=True)
        t0 = time.time()
        import run as ref_run
        ref_run.main(opts)
        print(json.dumps({"stage": stage, "wall_s": round(time.time() - t0, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
