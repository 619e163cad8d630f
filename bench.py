"""Benchmark: training throughput (images/sec/chip) on the flagship config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

North star (BASELINE.md): phase-2 CL4WSIS training on VOC 15-5 at >= 3x the
A100 images/sec/chip of the PyTorch reference. The reference publishes no
numbers; A100_REF_IMG_S below is our working estimate of the reference's
phase-2 throughput per A100 (ResNet-101 @ 512^2, global batch 16, AMP, with
the per-image Python/cv2 label factory in the loop). vs_baseline =
(our img/s/chip) / (3 * A100_REF_IMG_S) so 1.0 means the target is met.

Currently benches the most advanced runnable path (updated as phases land):
phase-2 training step if available, else step-0.
"""

from __future__ import annotations

import json
import time

A100_REF_IMG_S = 30.0  # estimated reference phase-2 img/s per A100 (see docstring)
TARGET = 3 * A100_REF_IMG_S


def bench_step0(batch_size: int = 16, size: int = 512, steps: int = 20):
    import jax
    import jax.numpy as jnp

    from cl4wsis_tpu.data.synthetic import synthetic_batches
    from cl4wsis_tpu.models import make_model
    from cl4wsis_tpu.train import schedule
    from cl4wsis_tpu.train.step0 import init_state, make_step0_train_step

    model = make_model(classes=(16,), backbone="resnet101", crop_size=size,
                       dtype=jnp.bfloat16)
    tx = schedule.make_optimizer(
        None, "adam", schedule.make_schedule("poly", 5e-5, 10000))
    state = init_state(model, tx, jax.random.PRNGKey(0),
                       input_shape=(1, size, size, 3))
    train_step = make_step0_train_step(model, tx, sigma=6, max_inst=50)

    batch_np = next(synthetic_batches(batch_size, size, n_classes=15, seed=0,
                                      n_batches=1))
    batch = {"image": jnp.asarray(batch_np["image"]),
             "seg": jnp.asarray(batch_np["seg"]),
             "inst": jnp.asarray(batch_np["inst"])}
    rng = jax.random.PRNGKey(1)

    # warmup / compile
    state, metrics = train_step(state, batch, rng)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = train_step(state, batch, jax.random.fold_in(rng, i))
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0
    return batch_size * steps / dt, "step0"


def main():
    import os
    which = os.environ.get("CL4WSIS_BENCH", "phase2")
    if which == "step0":
        img_s, tag = bench_step0()
    else:
        from cl4wsis_tpu.train.phase2 import bench_phase2
        img_s, tag = bench_phase2()
    print(json.dumps({
        "metric": f"images/sec/chip ({tag} train, VOC-15-5-shaped, 512^2 bf16)",
        "value": round(img_s, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(img_s / TARGET, 3),
    }))


if __name__ == "__main__":
    main()
