"""Device-time A/B: nearest-center pixel assignment, eval-shaped.

VERDICT r2 item 8 closure for the assignment implementations. The TRAIN hot
path (ops/refine.py) moved to assign_pixels_lanes' argmin lane reduce in
round 3; this harness times the retained chunked-scan oracle against it in
isolation on the EVAL/serving shapes (ops/instance_postproc.py:
S = C*(max_ctr+max_cluster) slots, batch 1) with jax.profiler device time
(tunnel wall clock is fiction, CLAUDE.md).

Recorded result (real v5e, 512² x 480 slots, reps 20):
  scan 82.056 ms/call, lanes 0.526 ms/call — 156x, exact match.
That measurement also settled the old opt-in Pallas assignment kernel:
DELETED (no consumer left — the pure-XLA argmin reduce streams at memory
speed with zero gathers, and the kernel did not even lower at S=480).

Usage:  python scripts/bench_assign_ab.py [--reps 20]
Prints one JSON line with device ms/call + exactness.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_inputs(H, W, S, seed=0):
    import numpy as np

    rs = np.random.RandomState(seed)
    # component field: blocky roots (realistic: pixels of one component
    # share a root id; centers carry the root of the component they sit in)
    cell = 64
    grid = rs.randint(0, 2, (H // cell, W // cell))
    roots = np.zeros((H, W), np.int32)
    for i in range(H // cell):
        for j in range(W // cell):
            if grid[i, j]:
                roots[i*cell:(i+1)*cell, j*cell:(j+1)*cell] = i * (W // cell) + j
            else:
                roots[i*cell:(i+1)*cell, j*cell:(j+1)*cell] = H * W
    ys = rs.randint(0, H, S).astype(np.int32)
    xs = rs.randint(0, W, S).astype(np.int32)
    valid = rs.rand(S) < 0.4
    ctr_root = roots[ys, xs]
    valid &= ctr_root != H * W
    offsets = rs.randn(H, W, 2).astype(np.float32) * 3.0
    return ys, xs, valid, ctr_root.astype(np.int32), offsets, roots


def time_fn(f, args, reps):
    import jax

    from cl4wsis_tpu.utils.device_time import device_time_report

    out = f(*args)
    jax.block_until_ready(out)
    tdir = tempfile.mkdtemp(prefix="assign_ab_")
    try:
        with jax.profiler.trace(tdir):
            for _ in range(reps):
                out = f(*args)
            jax.block_until_ready(out)
        rep = device_time_report(tdir)
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
    return rep["device_busy_s"] / reps, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--slots", type=int, default=480)  # VOC eval: 20*(16+8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cl4wsis_tpu.ops.grouping import (assign_pixels_lanes,
                                          assign_pixels_scan)

    H = W = args.size
    inputs = tuple(jax.device_put(jnp.asarray(a))
                   for a in make_inputs(H, W, args.slots))

    t_scan, out_scan = time_fn(
        jax.jit(lambda *a: assign_pixels_scan(*a)), inputs, args.reps)
    t_lanes, out_lanes = time_fn(
        jax.jit(assign_pixels_lanes), inputs, args.reps)
    res = {"size": H, "slots": args.slots,
           "scan_ms": round(t_scan * 1e3, 3),
           "lanes_ms": round(t_lanes * 1e3, 3),
           "speedup": round(t_scan / t_lanes, 1),
           "lanes_match": bool(np.array_equal(np.asarray(out_scan),
                                              np.asarray(out_lanes)))}
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
