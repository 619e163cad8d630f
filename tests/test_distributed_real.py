"""REAL 2-process jax.distributed smoke test (VERDICT r3 item 6).

tests/test_multihost.py covers the process_count>1 branches with
monkeypatched topology; this test actually spawns two CPU processes that
rendezvous through jax.distributed.initialize and run
multihost_utils.process_allgather inside StreamSegMetrics.synch /
InstanceAPAccumulator.synch, plus real-topology Loader sharding.

Slow-marked: two cold jax imports + a distributed rendezvous on a 1-core
host take ~1-2 min.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_allgather_paths(tmp_path):
    coordinator = f"127.0.0.1:{_free_port()}"
    outs = [str(tmp_path / f"r{r}.json") for r in range(2)]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the workers configure the cpu platform themselves; make sure no
    # leaked per-test device-count flags interfere
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "_distributed_worker.py"),
         coordinator, "2", str(r), outs[r]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for r in range(2)]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]

    res = [json.load(open(o)) for o in outs]
    # both processes hold the GLOBAL confusion matrix after synch:
    # rank0 added (gt=0 -> pred=1) x16, rank1 added (gt=1 -> pred=2) x16
    for r in res:
        conf = np.asarray(r["conf"])
        assert r["total"] == 32
        assert conf[0, 1] == 16 and conf[1, 2] == 16
    assert res[0]["conf"] == res[1]["conf"]
    # AP accumulator merged both shards: 2 GT positives of class 1, both
    # matched -> mAP@.5 == 1.0 on every process
    for r in res:
        assert r["n_pos_1"] == 2
        assert r["map50"] == pytest.approx(1.0)
    # loader shards are disjoint and cover the dataset
    assert not (set(res[0]["idxs"]) & set(res[1]["idxs"]))
    assert len(res[0]["idxs"]) + len(res[1]["idxs"]) == 16
