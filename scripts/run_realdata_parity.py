"""Real-data accuracy-parity readiness kit (VERDICT r4 next #4).

GIVEN real data + the iABN ImageNet checkpoints, this script runs the full
BASELINE.md side-by-side — the PyTorch reference (via scripts/refshim, CPU)
and the rebuild (via cl4wsis_tpu.cli.main, TPU or CPU) on the SAME splits
with the SAME recipes (reference scripts/run.sh / scripts/coco.sh) — and
emits the AP-parity table with the 0.5-pt mask-AP50 gate.

The container this repo is built in has NO VOC/SBD/COCO images and NO iABN
pretrained weights, so the default action is ``--check``: validate the data
layout both stacks need and print the exact stage commands (a documented
dry run — docs/realdata_parity.md). On a data-equipped machine:

    python scripts/run_realdata_parity.py --data_root /data --task 15-5 \
        --run both --workdir /tmp/parity --out logs/realdata_15-5.json

Stage recipes are transcribed from the reference scripts
(scripts/run.sh:12-40, scripts/coco.sh:10-28); the rebuild side uses the
flag-parity CLI (tests/test_cli_flags.py pins every flag).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ------------------------------------------------------------- requirements

def requirements(task: str, data_root: str, pretrained_dir: str):
    """(label, path, needed_by) rows both stacks need on disk.

    Sources: rebuild `cl4wsis_tpu/data/{voc,coco}.py`; reference
    `dataset/voc.py:73-125`, `dataset/coco.py`, `segmentation_module.py:37-42`,
    `dataset/__init__.py:57-70` (train-{step}.npy split indices).
    """
    v = os.path.join(data_root, "voc")
    c = os.path.join(data_root, "coco")
    rows = []
    if task in ("15-5", "10-10", "10-5"):
        rows += [
            ("VOC/SBD images", os.path.join(v, "JPEGImages"), "both"),
            ("SBD-coco train json", os.path.join(v, "pascal_sbd_train.json"), "both"),
            ("SBD-coco val json", os.path.join(v, "pascal_sbd_val.json"), "both"),
            ("split list (train)", os.path.join(v, "splits", "train_aug.txt"), "reference"),
            ("split list (val)", os.path.join(v, "splits", "val.txt"), "reference"),
            ("image-level 1-hot (train)", os.path.join(v, "voc_1h_labels_train.npy"), "reference"),
            ("image-level 1-hot (val)", os.path.join(v, "voc_1h_labels_val.npy"), "reference"),
            ("iABN ResNet-101 ImageNet ckpt",
             os.path.join(pretrained_dir, "resnet101_iabn_sync.pth.tar"), "both"),
        ]
    else:  # coco-voc
        rows += [
            ("COCO images (train)", os.path.join(c, "images", "train2017"), "both"),
            ("COCO images (val)", os.path.join(c, "images", "val2017"), "both"),
            ("COCO annotations", os.path.join(c, "annotations"), "both"),
            ("VOC/SBD images (step 1)", os.path.join(v, "JPEGImages"), "both"),
            ("SBD-coco train json", os.path.join(v, "pascal_sbd_train.json"), "both"),
            ("SBD-coco val json", os.path.join(v, "pascal_sbd_val.json"), "both"),
            ("as-coco split (train)", os.path.join(v, "splits", "train_aug_ascoco.txt"), "reference"),
            ("as-coco split (val)", os.path.join(v, "splits", "val_ascoco.txt"), "reference"),
            ("cocovoc 1-hot (train)", os.path.join(v, "cocovoc_1h_labels_train.npy"), "reference"),
            ("step index files", os.path.join(data_root, "coco-voc", "voc"), "both"),
            ("iABN WRN-38 ImageNet ckpt",
             os.path.join(pretrained_dir, "wide_resnet38_ipabn_lr_256.pth.tar"), "both"),
        ]
    return rows


def check(task, data_root, pretrained_dir, run: str = "check") -> bool:
    """Reference-only rows are optional ONLY when the reference stack will
    not run (--run check|rebuild); with --run reference|both they gate."""
    rows = requirements(task, data_root, pretrained_dir)
    ok = True
    print(f"readiness check — task {task}, data_root {data_root}")
    for label, path, who in rows:
        present = os.path.exists(path)
        optional = who == "reference" and run in ("check", "rebuild")
        ok &= present or optional
        print(f"  [{'OK' if present else 'MISSING'}] {label:34s} {path} ({who})")
    return ok


# ---------------------------------------------------------------- commands

def _recipe(task: str):
    """Per-stage (epochs, extra-args) from the reference recipe scripts."""
    if task == "coco-voc":
        return {"dataset": "coco-voc", "task": "voc", "alpha": "0.9",
                "epochs": (200, 30, 50), "val_interval": 50, "overlap": False}
    return {"dataset": "voc", "task": task, "alpha": "0.5",
            "epochs": (100, 40, 50), "val_interval": 10, "overlap": True}


def rebuild_cmds(a):
    r = _recipe(a.task)
    # always pass the flag explicitly: Config.overlap defaults to True, so
    # omitting it for coco-voc (overlap=False) would both train on the
    # wrong (overlapped) split and save checkpoints under the -ov path,
    # breaking the --step_ckpt/--seg_ckpt handoff below.
    ov = ["--overlap", "true" if r["overlap"] else "false"]
    base = [sys.executable, "-m", "cl4wsis_tpu.cli.main",
            "--dataset", r["dataset"], "--task", r["task"],
            "--batch_size", "16", "--val_interval", str(r["val_interval"]),
            "--data_root", a.data_root, "--pretrained_path", a.pretrained_dir,
            "--checkpoint", os.path.join(a.workdir, "rb_ckpt"),
            "--logdir", os.path.join(a.workdir, "rb_logs"),
            "--num_workers", str(a.num_workers), "--seed", str(a.seed)] + ov
    e0, e1, e2 = [max(1, int(e * a.epochs_scale)) for e in r["epochs"]]
    ovs = "-ov" if r["overlap"] else ""
    path = os.path.join(a.workdir, "rb_ckpt", "step",
                        f"{r['dataset']}-{r['task']}{ovs}")
    return [
        base + ["--name", "RB", "--step", "0", "--bce", "true",
                "--lr", "0.00005", "--epochs", str(e0), "--optim", "adam",
                "--weight_decay", "0"],
        base + ["--name", "RB", "--step", "1", "--weakly", "true",
                "--phase", "1", "--alpha", r["alpha"], "--lr", "0.001",
                "--loss_de", "1", "--lr_policy", "warmup",
                "--affinity", "true", "--epochs", str(e1), "--optim", "sgd",
                "--step_ckpt", os.path.join(path, "RB_0")],
        base + ["--name", "RB", "--step", "1", "--weakly", "true",
                "--phase", "2", "--alpha", r["alpha"], "--lr", "0.00005",
                "--loss_de", "1", "--lr_policy", "warmup",
                "--affinity", "true", "--epochs", str(e2), "--optim", "adam",
                "--weight_decay", "0",
                "--step_ckpt", os.path.join(path, "RB_0"),
                "--seg_ckpt", os.path.join(path, "RB_1")],
    ]


def reference_cmds(a, native: bool):
    """Reference stage commands. native=True emits the CUDA launch the
    reference documents (torch.distributed.launch); otherwise the shimmed
    single-process CPU invocation via this script's --_ref_stage mode."""
    r = _recipe(a.task)
    ov = "--overlap" if r["overlap"] else ""
    e0, e1, e2 = [max(1, int(e * a.epochs_scale)) for e in r["epochs"]]
    pars = (f"--dataset {r['dataset']} --task {r['task']} --batch_size 16 "
            f"{ov} --val_interval {r['val_interval']} --data_root "
            f"{a.data_root} --random_seed {a.seed}")
    ovs = "-ov" if r["overlap"] else ""
    path = f"checkpoints/step/{r['dataset']}-{r['task']}{ovs}"
    stages = [
        f"--name REF --step 0 --bce --lr 0.00005 {pars} --epochs {e0} "
        f"--optim adam --weight_decay 0",
        f"--name REF --step 1 --weakly {pars} --alpha {r['alpha']} "
        f"--lr 0.001 --step_ckpt {path}/REF_0.pth --loss_de 1 "
        f"--lr_policy warmup --affinity --epochs {e1} --optim sgd --phase 1",
        f"--name REF --step 1 --weakly {pars} --alpha {r['alpha']} "
        f"--lr 0.00005 --step_ckpt {path}/REF_0.pth --loss_de 1 "
        f"--lr_policy warmup --affinity --epochs {e2} --optim adam "
        f"--weight_decay 0 --seg_ckpt {path}/REF_1.pth --phase 2",
    ]
    if native:
        n = 8 if a.task == "coco-voc" else 1
        return [f"python -m torch.distributed.launch --nproc_per_node={n} "
                f"run.py --num_workers 4 --sample_num 8 {s}"
                for s in stages]
    return [[sys.executable, os.path.abspath(__file__), "--_ref_stage", s,
             "--workdir", a.workdir] for s in stages]


# -------------------------------------------------------------- execution

def _run_ref_stage(stage_args: str, workdir: str):
    """Internal mode: run ONE reference stage under the refshim on CPU
    (reuses run_reference_fixture's torch patching)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import run_reference_fixture as rf  # installs shim + reference paths

    rf._patch_torch()
    os.chdir(workdir)
    os.makedirs("checkpoints/step", exist_ok=True)
    import argparser as ref_argparser
    opts = ref_argparser.get_argparser().parse_args(stage_args.split())
    opts = ref_argparser.modify_command_options(opts)
    import torch

    import run as ref_run
    sentinel, sim = rf._make_device_sim()
    ref_run.torch = rf._TorchProxy(torch, sentinel)
    with sim:
        ref_run.main(opts)


# Both stacks' stdout formats. Reference: python-dict repr of the VOC
# evaluator results ('map': .., 'ap@0.5': ..). Rebuild: cli/main.py's
# logger.info line (mAP@[.5:.95]=.. mAP@.5=..) plus the JSONL echo
# ("map": .., "map50": ..) when the log file is inspected directly.
_MAP_RES = [re.compile(r"'map': (?:np\.float64\()?([0-9.eE+-]+)\)?"),
            re.compile(r"mAP@\[\.5:\.95\]=([0-9.eE+-]+)"),
            re.compile(r'"map": ([0-9.eE+-]+)')]
_MAP50_RES = [re.compile(r"'ap@0?\.5'?: (?:np\.float64\()?([0-9.eE+-]+)\)?"),
              re.compile(r"mAP@\.5=([0-9.eE+-]+)"),
              re.compile(r'"map50": ([0-9.eE+-]+)')]


def _last_match(patterns, log):
    """Value of the LAST occurrence (by position) across all formats."""
    hits = [(m.start(), float(m.group(1)))
            for p in patterns for m in p.finditer(log)]
    return max(hits)[1] if hits else None


def run_stages(cmds, log_prefix, timeout):
    results = []
    for i, cmd in enumerate(cmds):
        t0 = time.time()
        try:
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=timeout)
            rc, log = p.returncode, p.stdout + p.stderr
        except subprocess.TimeoutExpired as e:
            # record the partial log + a sentinel rc instead of crashing the
            # whole run (and losing every completed stage's results).
            rc = -1
            _txt = lambda x: (x.decode(errors="replace")
                              if isinstance(x, bytes) else (x or ""))
            log = (_txt(e.stdout) + _txt(e.stderr) +
                   f"\n[run_realdata_parity] stage timed out after {timeout}s")
        with open(f"{log_prefix}_stage{i}.log", "w") as f:
            f.write(log)
        results.append({"stage": i, "rc": rc,
                        "wall_s": round(time.time() - t0, 1),
                        "map": _last_match(_MAP_RES, log),
                        "map50": _last_match(_MAP50_RES, log)})
        if rc:
            results[-1]["tail"] = log[-1500:]
            break
    return results


def rebuild_metrics(a):
    """Final per-stage metrics from the rebuild logger's JSONL."""
    r = _recipe(a.task)
    ovs = "-ov" if r["overlap"] else ""
    logdir = os.path.join(a.workdir, "rb_logs",
                          f"{r['dataset']}-{r['task']}{ovs}", "RB")
    out = []
    if os.path.isdir(logdir):
        for fn in sorted(os.listdir(logdir)):
            if fn.endswith(".jsonl"):
                with open(os.path.join(logdir, fn)) as f:
                    res = [json.loads(l) for l in f if '"results"' in l
                           or '"type": "results"' in l]
                if res:
                    out.append({"file": fn, "final": res[-1]})
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", default="data")
    ap.add_argument("--pretrained_dir", default="pretrained")
    ap.add_argument("--task", default="15-5",
                    choices=["15-5", "10-10", "10-5", "coco-voc"])
    ap.add_argument("--run", default="check",
                    choices=["check", "rebuild", "reference", "both"])
    ap.add_argument("--workdir", default="/tmp/realdata_parity")
    ap.add_argument("--out", default="logs/realdata_parity.json")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--num_workers", type=int, default=4)
    ap.add_argument("--epochs_scale", type=float, default=1.0,
                    help="scale every stage's epoch budget (smoke: 0.01)")
    ap.add_argument("--timeout", type=int, default=14 * 24 * 3600)
    ap.add_argument("--_ref_stage", help=argparse.SUPPRESS)
    a = ap.parse_args(argv)

    if a._ref_stage:
        return _run_ref_stage(a._ref_stage, a.workdir)

    os.makedirs(a.workdir, exist_ok=True)
    ready = check(a.task, a.data_root, a.pretrained_dir, run=a.run)
    print()
    print("rebuild stage commands:")
    for c in rebuild_cmds(a):
        print("  " + " ".join(c))
    print("reference stage commands (native CUDA form; the shimmed-CPU form"
          " runs automatically with --run reference|both):")
    for c in reference_cmds(a, native=True):
        print("  " + c)
    if a.run == "check":
        print(f"\nready: {ready} (run with --run both to execute)")
        return 0 if ready else 1
    if not ready:
        print("\nABORT: required inputs missing (see MISSING rows above)")
        return 1

    results = {"config": {k: v for k, v in vars(a).items()
                          if not k.startswith("_")}}
    if a.run in ("rebuild", "both"):
        print("=== rebuild ===", flush=True)
        results["rebuild"] = run_stages(
            rebuild_cmds(a), os.path.join(a.workdir, "rb"), a.timeout)
        results["rebuild_logged"] = rebuild_metrics(a)
    if a.run in ("reference", "both"):
        print("=== reference (shimmed CPU) ===", flush=True)
        results["reference"] = run_stages(
            reference_cmds(a, native=False),
            os.path.join(a.workdir, "ref"), a.timeout)

    if a.run == "both":
        rb = {r["stage"]: r for r in results.get("rebuild", [])}
        rf_ = {r["stage"]: r for r in results.get("reference", [])}
        table = []
        for s in sorted(set(rb) | set(rf_)):
            b, r = rb.get(s, {}), rf_.get(s, {})
            row = {"stage": s, "rebuild_map50": b.get("map50"),
                   "reference_map50": r.get("map50")}
            if row["rebuild_map50"] is not None and \
                    row["reference_map50"] is not None:
                d = row["rebuild_map50"] - row["reference_map50"]
                row["delta_pts"] = round(100 * d, 2)
                row["within_0.5pt"] = abs(d) <= 0.005
            table.append(row)
        results["parity_table"] = table
        print(json.dumps(table, indent=2))

    os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", a.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
