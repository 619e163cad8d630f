"""Fixture-scale accuracy-parity experiment: reference vs rebuild, matched
init families, long enough for NONZERO final instance mAP (VERDICT r3
missing #1 / next #2).

For each seed, runs the torch reference (scripts/run_reference_fixture.py,
CPU, shimmed binaries) and the rebuild (scripts/run_rebuild_fixture.py
--torch_init, so fresh weights use the reference's kaiming-uniform init
scale) through all 3 stages on identically generated mini-VOC fixtures,
then writes one JSON with per-stage loss trajectories and final mAPs.

Usage (background; hours at the default sizes on this 1-core host):
    python scripts/run_parity_experiment.py --root /tmp/parity_r4 \
        --images 48 --size 64 --epochs 12 --seeds 42 43 \
        --out logs/parity_r4.json
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_reference(root, a, seed):
    cmd = [sys.executable, os.path.join(REPO, "scripts",
                                        "run_reference_fixture.py"),
           "--root", root, "--stage", "all", "--epochs", str(a.epochs),
           "--size", str(a.size), "--images", str(a.images),
           "--batch", str(a.batch), "--seed", str(seed), "--wrap"]
    if a.stage != "all":
        cmd[cmd.index("--stage") + 1] = a.stage
    if a.paint:
        cmd.append("--paint")
    t0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True,
                       timeout=a.timeout)
    log = p.stdout + p.stderr
    with open(os.path.join(root, "reference.log"), "w") as f:
        f.write(log)
    # final inst mAP lines: "INFO:0: {'ap': array([...]), 'map': np...}"
    maps = [float(m) for m in re.findall(
        r"'map': (?:np\.float64\()?([0-9.eE+-]+)\)?", log)]
    # one per-epoch average loss per stage from the epoch summaries
    losses = [float(m) for m in re.findall(
        r"End of Epoch \d+/\d+, Average Loss=([0-9.eE+-]+)", log)]
    return {"rc": p.returncode, "wall_s": round(time.time() - t0, 1),
            "maps": maps, "losses": losses,
            "tail": log[-1500:] if p.returncode else ""}


def run_rebuild(root, a, seed):
    cmd = [sys.executable, os.path.join(REPO, "scripts",
                                        "run_rebuild_fixture.py"),
           "--root", root, "--stage", "all", "--epochs", str(a.epochs),
           "--size", str(a.size), "--batch", str(a.batch),
           "--seed", str(seed), "--torch_init",
           "--platform", a.rb_platform, "--images", str(a.images), "--wrap"]
    if a.stage != "all":
        cmd[cmd.index("--stage") + 1] = a.stage
    if a.paint:
        cmd.append("--paint")
    t0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True,
                       timeout=a.timeout)
    log = p.stdout + p.stderr
    with open(os.path.join(root, "rebuild.log"), "w") as f:
        f.write(log)
    stages = []
    for line in log.splitlines():
        if line.startswith("{"):
            try:
                stages.append(json.loads(line))
            except ValueError:
                pass
    return {"rc": p.returncode, "wall_s": round(time.time() - t0, 1),
            "stages": stages, "tail": log[-1500:] if p.returncode else ""}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/parity_r4")
    ap.add_argument("--images", type=int, default=48)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seeds", type=int, nargs="+", default=[42, 43])
    ap.add_argument("--timeout", type=int, default=4 * 3600)
    ap.add_argument("--out", default="logs/parity_r4.json")
    ap.add_argument("--skip_reference", action="store_true")
    ap.add_argument("--stage", default="all",
                    choices=["step0", "phase1", "phase2", "all"])
    ap.add_argument("--paint", action="store_true",
                    help="learnable painted fixture (see tests/test_data)")
    ap.add_argument("--rb_platform", default="cpu",
                    help="rebuild platform (cpu, or empty for session TPU)")
    a = ap.parse_args()

    results = {"config": vars(a)}
    for seed in a.seeds:
        # the rebuild needs the fixture the reference runner writes; when
        # skipping the reference, generate it directly
        ref_root = os.path.join(a.root, f"ref_s{seed}")
        rb_root = os.path.join(a.root, f"rb_s{seed}")
        os.makedirs(ref_root, exist_ok=True)
        os.makedirs(rb_root, exist_ok=True)
        if not a.skip_reference:
            print(f"=== reference seed {seed} ===", flush=True)
            results[f"ref_s{seed}"] = run_reference(ref_root, a, seed)
            print(json.dumps(results[f"ref_s{seed}"])[:600], flush=True)
        fixture = os.path.join(rb_root, "data")
        if not os.path.exists(os.path.join(fixture, "voc",
                                           "pascal_sbd_train.json")):
            sys.path.insert(0, REPO)
            from tests.test_data import _write_fake_voc
            _write_fake_voc(fixture, n_images=a.images, size=a.size,
                            rich=True, wrap=True, paint=a.paint)
        print(f"=== rebuild seed {seed} ===", flush=True)
        results[f"rb_s{seed}"] = run_rebuild(rb_root, a, seed)
        print(json.dumps(results[f"rb_s{seed}"])[:600], flush=True)
        os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
        with open(a.out, "w") as f:
            json.dump(results, f, indent=2)
    print("wrote", a.out, flush=True)


if __name__ == "__main__":
    main()
