"""Pins the real-data parity readiness kit's plumbing (scripts/
run_realdata_parity.py) — the pieces that only fail after days of compute
if they regress: metric parsing for BOTH stacks' output formats, the
explicit --overlap flag, the run-mode-aware readiness gate, and timeout
robustness of the stage runner."""

import os
import subprocess
import sys
import types

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import run_realdata_parity as rp  # noqa: E402


def test_metric_regexes_cover_both_stacks():
    ref = "validate {'map': np.float64(0.311), 'ap@0.5': np.float64(0.521)}"
    assert rp._last_match(rp._MAP_RES, ref) == 0.311
    assert rp._last_match(rp._MAP50_RES, ref) == 0.521
    # rebuild CLI logger.info line (cli/main.py run_validation)
    rb = "[test] mAP@[.5:.95]=0.3145 mAP@.5=0.5312"
    assert rp._last_match(rp._MAP_RES, rb) == 0.3145
    assert rp._last_match(rp._MAP50_RES, rb) == 0.5312
    # rebuild JSONL echo
    js = '{"type": "results", "map": 0.1, "map50": 0.2}'
    assert rp._last_match(rp._MAP50_RES, js) == 0.2
    # last occurrence wins across formats
    both = ref + "\n" + rb
    assert rp._last_match(rp._MAP50_RES, both) == 0.5312
    assert rp._last_match(rp._MAP50_RES, "no metrics here") is None


def test_rebuild_cmds_pass_overlap_explicitly():
    """Config.overlap defaults to True: coco-voc (overlap=False) must pass
    --overlap false or the CLI trains the overlapped split and saves under
    the -ov path, breaking the --step_ckpt/--seg_ckpt handoff."""
    a = types.SimpleNamespace(task="coco-voc", data_root="d",
                              pretrained_dir="p", workdir="w",
                              num_workers=0, seed=1, epochs_scale=1.0)
    for cmd in rp.rebuild_cmds(a):
        i = cmd.index("--overlap")
        assert cmd[i + 1] == "false"
    # and the handoff paths agree with the non-ov checkpoint layout
    stage1 = rp.rebuild_cmds(a)[1]
    ck = stage1[stage1.index("--step_ckpt") + 1]
    assert "coco-voc-voc/" in ck.replace(os.sep, "/") and "-ov" not in ck
    a.task = "15-5"
    for cmd in rp.rebuild_cmds(a):
        assert cmd[cmd.index("--overlap") + 1] == "true"


def test_readiness_gate_requires_reference_rows_when_reference_runs(tmp_path):
    droot = str(tmp_path / "none")
    # reference-only rows are optional for check/rebuild …
    assert rp.check("15-5", droot, droot, run="check") is False  # 'both' rows
    # … fabricate every 'both' row; reference rows still missing
    rows = rp.requirements("15-5", droot, str(tmp_path / "pre"))
    for _, path, who in rows:
        if who == "both":
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "w") as f:
                f.write("x")
    assert rp.check("15-5", droot, str(tmp_path / "pre"), run="rebuild")
    assert not rp.check("15-5", droot, str(tmp_path / "pre"), run="both")
    assert not rp.check("15-5", droot, str(tmp_path / "pre"), run="reference")


def test_run_stages_survives_timeout(tmp_path):
    cmds = [[sys.executable, "-c",
             "print('mAP@.5=0.4000'); import time; time.sleep(60)"],
            [sys.executable, "-c", "print('never runs')"]]
    res = rp.run_stages(cmds, str(tmp_path / "t"), timeout=3)
    assert len(res) == 1 and res[0]["rc"] == -1  # recorded, then stopped
    assert os.path.exists(str(tmp_path / "t_stage0.log"))


def test_run_stages_parses_and_continues(tmp_path):
    cmds = [[sys.executable, "-c", "print(\"{'ap@0.5': 0.5}\")"],
            [sys.executable, "-c", "print('mAP@[.5:.95]=0.21 mAP@.5=0.31')"]]
    res = rp.run_stages(cmds, str(tmp_path / "s"), timeout=30)
    assert [r["map50"] for r in res] == [0.5, 0.31]
    assert res[1]["map"] == 0.21 and all(r["rc"] == 0 for r in res)
