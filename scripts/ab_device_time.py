"""Device-time A/B harness for phase-2 kernel variants on the real chip.

Wall clock through the axon tunnel is unreliable; this script times each
variant by what the DEVICE executed (jax.profiler trace -> utils/device_time)
and prints one JSON line per variant.

Usage (on the TPU env):
    python scripts/ab_device_time.py baseline no_pallas_cc cc8 cc16

Variants toggle env flags / bench args, all running bench_phase2's program
with a profiler trace around the timed loop.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

VARIANTS = {
    "baseline": {},  # round 3+: includes the Pallas CC default
    "no_pallas_cc": {"CL4WSIS_PALLAS_CC": "0"},
    "cc8": {"CL4WSIS_BENCH_CC_ITERS": "8"},
    "cc16": {"CL4WSIS_BENCH_CC_ITERS": "16"},
    # round 5: the class-banked pixel assignment (default on) vs the
    # full-S lane reduce it replaced
    "no_banked_assign": {"CL4WSIS_BANKED_ASSIGN": "0"},
}


def run_variant(name: str) -> dict:
    trace = f"/tmp/ab_trace_{name}"
    shutil.rmtree(trace, ignore_errors=True)
    env = dict(os.environ)
    env.update(VARIANTS[name])
    env["CL4WSIS_BENCH_PROFILE"] = trace
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    rec = json.loads(line[-1]) if line else {"error": out.stderr[-400:]}
    rec["variant"] = name
    return rec


if __name__ == "__main__":
    names = sys.argv[1:] or ["baseline"]
    for n in names:
        print(json.dumps(run_variant(n)), flush=True)
