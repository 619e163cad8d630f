"""Multi-host CLI integration (VERDICT r4 next #3): 4 CPU processes under
``jax.distributed.initialize`` each executing the REAL ``cli/main.py`` —
sharded Loader feeding the jitted step on a 4-way global mesh, rank-0
orbax checkpoint write (with the post-save barrier), resume via
``--continue_ckpt``, and the sharded eval merge in the final validation.

This is the rebuild's equivalent of the reference's N-process DDP launch
(reference ``run.py:38-77``, ``scripts/run.sh:4-6``), where each rank owns a
DataLoader shard and gradients/metrics sync through the backend; here the
N processes form one SPMD program per step and the same assertions hold:
every rank computes the IDENTICAL global loss each epoch, the checkpoint
written by rank 0 resumes on all ranks, and resume trains exactly the
remaining epochs.

Slow-marked: 4 cold jax imports + distributed compiles on a 1-core host.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_four_process_cli_train_resume_eval(tmp_path):
    from tests.test_data import _write_fake_voc

    nprocs = 4
    data_root = str(tmp_path / "data")
    # rich=True: every image carries an old class, so ALL 16 images are in
    # the step-0 train split -> exactly one full batch per rank per epoch
    _write_fake_voc(data_root, n_images=16, size=48, rich=True)

    coordinator = f"127.0.0.1:{_free_port()}"
    outs = [str(tmp_path / f"r{r}.json") for r in range(nprocs)]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # fresh processes read XLA_FLAGS at backend init: raise the XLA:CPU
    # collective rendezvous timeouts (CLAUDE.md — 4 processes sharing one
    # core reach collectives arbitrarily late and the 40s default aborts)
    env["XLA_FLAGS"] = (
        "--xla_cpu_collective_call_warn_stuck_timeout_seconds=600 "
        "--xla_cpu_collective_call_terminate_timeout_seconds=7200")
    procs = [subprocess.Popen(
        [sys.executable,
         os.path.join(REPO, "tests", "_multihost_cli_worker.py"),
         coordinator, str(nprocs), str(r), "1", data_root,
         str(tmp_path), outs[r]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for r in range(nprocs)]
    logs = [p.communicate(timeout=3600)[0] for p in procs]
    for r, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"rank {r}:\n{log[-3000:]}"

    res = [json.load(open(o)) for o in outs]
    for r in res:
        assert r["rc1"] == 0 and r["rc2"] == 0
        assert r["ckpt_exists"]
        # run 1 trained epochs 0,1; resume picked up the epoch-1 ckpt and
        # trained EXACTLY epoch 2 (reference run.py resume semantics)
        assert r["n_run1"] == 2
        assert [e for e, _ in r["losses"]] == [0, 1, 2]
    # every rank observed the IDENTICAL global loss each epoch: the loss is
    # computed by one SPMD program over the globally-sharded batch, i.e.
    # the DDP gradient/metric sync equivalence
    for r in res[1:]:
        assert r["losses"] == res[0]["losses"], (res[0]["losses"],
                                                 r["losses"])
