"""Device-time A/B: multilabel connected components, XLA fallback vs Pallas.

VERDICT r2 item 2a/8: the Pallas VMEM CC kernel is verified bit-exact on
chip but has never had a recorded device-time win because the FULL phase-2
program's Mosaic compile exceeded the bench timeout through the tunnel.
This harness A/Bs the CC op in ISOLATION — a small program that compiles in
seconds — on the same shapes/content the phase-2 label factory feeds it
(bs16 x 512^2, VOC-15-5: 5 new classes), using jax.profiler device time
(the tunnel wall clock is fiction, CLAUDE.md).

Inputs cover the two regimes that bound the fixpoint iteration count:
  * blobby  — converged-training masks (synthetic scene generator, the
    common case: few sweeps to fixpoint);
  * speckle — random-init argmax noise (the bench worst case: maximal
    component count and tortuosity).

Usage:  python scripts/bench_cc_ab.py [--reps 10]
Prints one JSON line per (variant, kernel) with device ms/call.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_inputs(batch: int, size: int, n_classes: int):
    import numpy as np

    from cl4wsis_tpu.data.synthetic import synthetic_batches

    rs = np.random.RandomState(0)
    blobby = None
    for b in synthetic_batches(batch, size, n_classes=n_classes, seed=0,
                               n_batches=1):
        blobby = b["seg"].astype(np.int32)
    # speckle: iid class draws, ~72% background — matches the random-init
    # argmax regime after the old-class zeroing in phase2 (most pixels
    # land in old classes / bg and are zeroed; survivors are iid spatial
    # noise in the new-class range)
    speckle = rs.randint(0, 2 * (n_classes + 1), (batch, size, size))
    speckle = np.where(speckle <= n_classes, speckle, 0).astype(np.int32)
    return {"blobby": blobby, "speckle": speckle}


def run_one(cls_maps, use_pallas: bool, cc_iters: int, reps: int):
    import jax
    import jax.numpy as jnp

    from cl4wsis_tpu.ops import pallas_cc
    from cl4wsis_tpu.ops.cc import connected_components_multilabel
    from cl4wsis_tpu.utils.device_time import device_time_report

    old_enabled = pallas_cc.ENABLED
    pallas_cc.ENABLED = use_pallas
    # the toggle is read at trace time inside an inner @jax.jit whose cache
    # key does not include it — drop cached traces so the flip takes effect
    jax.clear_caches()
    try:
        x = jax.device_put(jnp.asarray(cls_maps))

        @jax.jit
        def f(x):
            return jax.vmap(lambda c: connected_components_multilabel(
                c, connectivity=8, num_iters=cc_iters))(x)

        out = f(x)  # compile + warm
        jax.block_until_ready(out)
        tdir = tempfile.mkdtemp(prefix="cc_ab_")
        try:
            with jax.profiler.trace(tdir):
                for _ in range(reps):
                    out = f(x)
                jax.block_until_ready(out)
            rep = device_time_report(tdir)
        finally:
            shutil.rmtree(tdir, ignore_errors=True)
        return rep["device_busy_s"] / reps, out
    finally:
        pallas_cc.ENABLED = old_enabled


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--classes", type=int, default=5)
    ap.add_argument("--cc-iters", type=int, default=64)
    args = ap.parse_args()

    import jax
    import numpy as np

    # persistent cache: one Mosaic compile per program shape, ever
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

    inputs = make_inputs(args.batch, args.size, args.classes)
    for variant, cls_maps in inputs.items():
        t_xla, out_xla = run_one(cls_maps, False, args.cc_iters, args.reps)
        res = {"variant": variant, "batch": args.batch, "size": args.size,
               "xla_ms": round(t_xla * 1e3, 2)}
        try:
            t_pal, out_pal = run_one(cls_maps, True, args.cc_iters, args.reps)
            res["pallas_ms"] = round(t_pal * 1e3, 2)
            res["speedup"] = round(t_xla / t_pal, 2)
            res["exact_match"] = bool(np.array_equal(np.asarray(out_xla),
                                                     np.asarray(out_pal)))
        except Exception as e:
            res["pallas_error"] = f"{type(e).__name__}: {e}"
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
