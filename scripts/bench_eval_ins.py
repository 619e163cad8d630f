"""Device-time breakdown of the instance-eval path at VOC val shapes.

VERDICT r4 next #8 asks whether ops/instance_postproc.get_ins_map's
``_slot_stats``/assign lane reduces (n_slots = 20*(32+8) = 800 at eval vs
121 in training refine) should share the phase-2 fused sorted-domain
kernel. Per the measure-first house rule, this times on the real chip:

  (a) the full production eval forward (model fwd + TTA fuse + resize +
      get_ins_map) per image at the 512 bucket,
  (b) get_ins_map alone at the same shape,
  (c) get_ins_map with max_ctr=16 (the train-refine slot count) as a
      sensitivity probe for the slot-lane width.

Prints one JSON line per measurement (device-time via profiler traces;
tunnel wall clock is untrusted, CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import jax
import jax.numpy as jnp
import numpy as np


def _device_time(fn, iters: int = 10) -> float:
    from cl4wsis_tpu.utils.device_time import device_time_report
    fn()  # compile + warm
    tdir = tempfile.mkdtemp(prefix="evalins_trace_")
    try:
        with jax.profiler.trace(tdir):
            for _ in range(iters):
                out = fn()
            jax.block_until_ready(out)
        rep = device_time_report(tdir)
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
    return rep["device_busy_s"] / iters


def main():
    try:
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

    from cl4wsis_tpu.models import make_model
    from cl4wsis_tpu.ops.instance_postproc import get_ins_map
    from cl4wsis_tpu.train.eval import make_eval_forward

    C = 20                     # VOC thing classes
    H = W = 512                # the largest VOC val bucket
    rng = np.random.RandomState(0)

    # (b)/(c): get_ins_map alone on realistic inputs — blobby seg, a few
    # dozen center spikes
    seg_logit = jnp.asarray(rng.randn(H, W, C + 1).astype(np.float32))
    seg_prob = jax.nn.softmax(
        jax.image.resize(seg_logit[::8, ::8], (H, W, C + 1), "linear") * 4.0,
        axis=-1)
    center = jnp.zeros((H, W, C), jnp.float32)
    ys, xs, cs = (rng.randint(8, H - 8, 64), rng.randint(8, W - 8, 64),
                  rng.randint(0, C, 64))
    center = center.at[ys, xs, cs].set(0.9)
    offset = jnp.asarray(rng.randn(H, W, 2).astype(np.float32) * 4)
    seg_prob, center, offset = jax.device_put((seg_prob, center, offset))

    for tag, mc in (("get_ins_map_valcfg", 32), ("get_ins_map_mc16", 16)):
        t = _device_time(lambda: get_ins_map(
            seg_prob, center, offset, num_classes=C, val_thresh=0.1,
            val_kernel=41, beta=3.0, max_ctr=mc, max_cluster=8))
        print(json.dumps({"tag": tag, "device_s_per_image": round(t, 5),
                          "n_slots": C * (mc + 8)}), flush=True)

    # (a): the full production eval forward at the same bucket
    model = make_model(classes=(16, 5), crop_size=512,
                       dtype=jnp.bfloat16)
    x = jnp.zeros((1, H, W, 3), jnp.bfloat16)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
    fwd = make_eval_forward(model, variables, C, val_flip=True,
                            val_thresh=0.1, val_kernel=41, beta=3.0)
    img = jnp.asarray(rng.randn(1, 500, 375, 3).astype(np.float32))
    t = _device_time(lambda: fwd(img, (500, 375)))
    print(json.dumps({"tag": "full_eval_forward_flipTTA",
                      "device_s_per_image": round(t, 5)}), flush=True)


if __name__ == "__main__":
    main()
