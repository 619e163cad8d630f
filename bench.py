"""Benchmark: training throughput (images/sec/chip) on the flagship config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...audit}.

North star (BASELINE.md): phase-2 CL4WSIS training on VOC 15-5 at >= 3x the
A100 images/sec/chip of the PyTorch reference. The reference publishes no
numbers; A100_REF_IMG_S below is our working estimate of the reference's
phase-2 throughput per A100 (ResNet-101 @ 512^2, global batch 16, AMP, with
the per-image Python/cv2 label factory in the loop). vs_baseline =
(our img/s/chip) / (3 * A100_REF_IMG_S) so 1.0 means the target is met.

Auditability (VERDICT r1 item 3): the JSON also reports the XLA-compiled
program's own FLOP estimate per step, the derived TFLOP/s, and the implied
MFU against the detected chip's bf16 peak. If implied_mfu > 1 the timing is
physically impossible and the line carries "suspect_timing": true — wall
clock through the axon tunnel is known-unreliable (CLAUDE.md), so MFU is the
sanity gate a reviewer can check.

Set CL4WSIS_BENCH_PROFILE=/some/dir to additionally capture a jax.profiler
trace of the timed loop (device-time ground truth for human inspection).
"""

from __future__ import annotations

import json

# MEASURED upper bound of the reference's phase-2 img/s (round 3,
# scripts/bench_reference.py, solo on this host): the reference's label
# factory runs serially on the host inside the train loop
# (train.py:449-500); its HOST-ONLY residue (per-class cv2 CC on .cpu()
# masks, per-instance .item() syncs, numpy gaussian stamping) costs
# 74.3 ms/img on clean blobby masks even if every torch op
# (get_instance_segmentation: 1478 of 1538 ms/img measured) were GPU-free.
# 1/74.3ms = 13.46 img/s is therefore a generous empirical ceiling for the
# reference on ANY GPU (noisy early-training masks: 4.93). Method +
# raw numbers: BASELINE.md "Measured reference bound".
A100_REF_IMG_S = 13.46
BASELINE_NOTE = ("measured: reference label factory host-only residue, "
                 "clean-mask variant, GPU work assumed free "
                 "(scripts/bench_reference.py, BASELINE.md)")
TARGET = 3 * A100_REF_IMG_S

# bf16 peak TFLOP/s per chip, by jax device_kind substring (public specs)
CHIP_PEAK_TFLOPS = [
    ("v6e", 918.0), ("v6", 918.0),
    ("v5p", 459.0), ("v5e", 197.0), ("v5 lite", 197.0), ("v5litepod", 197.0),
    ("v4", 275.0), ("v3", 123.0), ("v2", 45.0),
]


def chip_peak_tflops(kind: str) -> float | None:
    k = kind.lower()
    for sub, peak in CHIP_PEAK_TFLOPS:
        if sub in k:
            return peak
    return None


def bench_step0(batch_size: int = 16, size: int = 512, steps: int = 20,
                n_batches: int = 4):
    import time

    import jax
    import jax.numpy as jnp

    from cl4wsis_tpu.data.synthetic import synthetic_batches
    from cl4wsis_tpu.models import make_model
    from cl4wsis_tpu.train import schedule
    from cl4wsis_tpu.train.phase2 import _cost_analysis_flops
    from cl4wsis_tpu.train.step0 import init_state, make_step0_train_step

    model = make_model(classes=(16,), backbone="resnet101", crop_size=size,
                       dtype=jnp.bfloat16)
    tx = schedule.make_optimizer(
        None, "adam", schedule.make_schedule("poly", 5e-5, 10000))
    state = init_state(model, tx, jax.random.PRNGKey(0),
                       input_shape=(1, size, size, 3))
    train_step = make_step0_train_step(model, tx, sigma=6, max_inst=50)

    batches = []
    for b in synthetic_batches(batch_size, size, n_classes=15, seed=0,
                               n_batches=n_batches):
        batches.append({"image": jax.device_put(jnp.asarray(b["image"])),
                        "seg": jax.device_put(jnp.asarray(b["seg"])),
                        "inst": jax.device_put(jnp.asarray(b["inst"]))})
    rng = jax.random.PRNGKey(1)

    compiled = train_step.lower(state, batches[0], rng).compile()
    flops = _cost_analysis_flops(compiled)

    state, metrics = train_step(state, batches[0], rng)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = train_step(state, batches[i % n_batches],
                                    jax.random.fold_in(rng, i))
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0
    out = {"img_s": batch_size * steps / dt, "tag": "step0",
           "flops_per_step": flops, "batch_size": batch_size,
           "steps": steps, "dt": dt}
    # device-true timing (wall clock through the tunnel is untrusted)
    try:
        import shutil
        import tempfile

        from cl4wsis_tpu.utils.device_time import (device_time_report,
                                                   main_module_times)
        tdir = tempfile.mkdtemp(prefix="bench_trace_")
        try:
            with jax.profiler.trace(tdir):
                for i in range(steps):
                    state, metrics = train_step(
                        state, batches[i % n_batches],
                        jax.random.fold_in(rng, 99 + i))
                jax.block_until_ready(metrics["loss"])
            rep = device_time_report(tdir)
            per_step = main_module_times(tdir)
        finally:
            shutil.rmtree(tdir, ignore_errors=True)
        if rep["device_busy_s"] > 0:
            out["device_dt"] = rep["device_busy_s"]
            out["device_steps"] = steps
            if per_step:
                out["device_step_min"] = min(per_step)
                out["device_step_mean"] = sum(per_step) / len(per_step)
                out["device_step_n"] = len(per_step)
    except Exception:
        if jax.default_backend() == "tpu":
            raise
    return out


def bench_phase1(batch_size: int = 16, size: int = 512, steps: int = 20,
                 n_batches: int = 4, backbone: str = "resnet101",
                 output_stride: int = 16, old: int = 16, new: int = 5,
                 tag: str = "phase1", desc: str = None):
    """Phase-1 CL-WSSS step at the VOC 15-5 recipe shape: dual backbones,
    3B flac pseudolabeler passes, PAMR affinity, pseudo-GT losses, randrop —
    the post-warmup (use_pseudo) program, which is the heavier one
    (reference train.py:303-416). Completes the 3-stage throughput story
    next to bench_step0 / bench_phase2 / bench_coco_wrn.
    backbone/output_stride/old/new parameterize the COCO-to-VOC recipe
    (WRN-38-A2, OS8, 448^2, 61 old + 20 new; scripts/coco.sh:20-21)."""
    import time

    import jax
    import jax.numpy as jnp

    from cl4wsis_tpu.data.synthetic import synthetic_batches
    from cl4wsis_tpu.models import make_model
    from cl4wsis_tpu.train import schedule
    from cl4wsis_tpu.train.phase1 import (make_phase1_train_step,
                                          phase1_group_fn)
    from cl4wsis_tpu.train.phase2 import _cost_analysis_flops
    from cl4wsis_tpu.train.trainer import TrainState
    from cl4wsis_tpu.wss import PeakGenerator, PseudoLabeler

    OLD, NEW = old, new
    TOT = OLD + NEW
    dtype = jnp.bfloat16
    model = make_model(classes=(OLD, NEW), crop_size=size, branch="none",
                       backbone=backbone, output_stride=output_stride,
                       dtype=dtype)
    model_old = make_model(classes=(OLD,), crop_size=size, branch="none",
                           backbone=backbone, output_stride=output_stride,
                           dtype=dtype)
    pl_mod = PseudoLabeler(num_classes=TOT, dtype=dtype)
    pg_mod = PeakGenerator(num_classes=TOT - 1, old_classes=OLD - 1,
                           dtype=dtype)

    x = jnp.zeros((1, size, size, 3), dtype)
    mv = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
    ov = jax.jit(lambda: model_old.init(jax.random.PRNGKey(0), x,
                                        train=False))()
    fs = size // output_stride
    feat_ch = 4096 if "wider" in backbone else 2048
    plv = pl_mod.init(jax.random.PRNGKey(1),
                      jnp.zeros((1, fs, fs, feat_ch), dtype), train=False)
    pgv = pg_mod.init(jax.random.PRNGKey(2),
                      jnp.zeros((1, fs, fs, TOT), dtype), train=True)

    params = {"model": mv["params"], "pseudolabeler": plv["params"],
              "peakgenerator": pgv["params"]}
    stats = {"model": mv["batch_stats"],
             "pseudolabeler": plv["batch_stats"], "peakgenerator": {}}
    tx = schedule.make_optimizer(
        params, "sgd", schedule.make_schedule("poly", 1e-3, 10000),
        group_scale={"body": 1.0, "seg": 10.0, "instance": 0.0,
                     "pseudo": 10.0},
        group_fn=phase1_group_fn, momentum=0.9)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=stats, opt_state=tx.init(params))
    step = make_phase1_train_step(model, model_old, pl_mod, pg_mod, tx,
                                  old_classes=OLD, use_pseudo=True)

    batches = []
    for b in synthetic_batches(batch_size, size, n_classes=TOT - 1, seed=0,
                               n_batches=n_batches):
        batches.append(
            {"image": jax.device_put(jnp.asarray(b["image"], dtype)),
             "l1h": jax.device_put(jnp.asarray(b["l1h"][:, 1:]))})
    rng = jax.random.PRNGKey(3)

    compiled = step.lower(state, batches[0], ov, rng).compile()
    flops = _cost_analysis_flops(compiled)

    state, m = step(state, batches[0], ov, rng)
    jax.block_until_ready(m["loss"])

    t0 = time.perf_counter()
    for i in range(steps):
        state, m = step(state, batches[i % n_batches], ov,
                        jax.random.fold_in(rng, i))
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    out = {"img_s": batch_size * steps / dt, "tag": tag,
           "desc": desc or (f"VOC-15-5 phase-1 CL-WSSS, {size}^2 "
                            f"bs{batch_size} bf16"),
           "flops_per_step": flops, "batch_size": batch_size,
           "steps": steps, "dt": dt}
    try:
        import shutil
        import tempfile

        from cl4wsis_tpu.utils.device_time import (device_time_report,
                                                   main_module_times)
        tdir = tempfile.mkdtemp(prefix="bench_trace_")
        try:
            with jax.profiler.trace(tdir):
                for i in range(steps):
                    state, m = step(state, batches[i % n_batches], ov,
                                    jax.random.fold_in(rng, 99 + i))
                jax.block_until_ready(m["loss"])
            rep = device_time_report(tdir)
            per_step = main_module_times(tdir)
        finally:
            shutil.rmtree(tdir, ignore_errors=True)
        if rep["device_busy_s"] > 0:
            out["device_dt"] = rep["device_busy_s"]
            out["device_steps"] = steps
            if per_step:
                out["device_step_min"] = min(per_step)
                out["device_step_mean"] = sum(per_step) / len(per_step)
                out["device_step_n"] = len(per_step)
    except Exception:
        if jax.default_backend() == "tpu":
            raise
    return out


def bench_coco_wrn(batch_size: int = 16, size: int = 448, steps: int = 10,
                   n_batches: int = 2):
    """COCO-to-VOC flagship memory-story bench (VERDICT r2 item 5): a FULL
    WRN-38-A2 step-0 train step at the reference recipe's global batch 16,
    crop 448, OS 8 (scripts/coco.sh:13) on ONE chip.

    The reference needs inplace_abn to fit this (segmentation_module.py:5-6,
    saving ~50% of activation memory on 8 GPUs x batch 2); here the step is
    one XLA program whose fit is decided by the compiler's buffer assignment
    — reported via memory_analysis so the claim is checkable. Set
    CL4WSIS_BENCH_REMAT=1 to additionally rematerialize backbone blocks.
    """
    import os
    import time

    import jax
    import jax.numpy as jnp

    from cl4wsis_tpu.data.synthetic import synthetic_batches
    from cl4wsis_tpu.models import make_model
    from cl4wsis_tpu.train import schedule
    from cl4wsis_tpu.train.phase2 import _cost_analysis_flops
    from cl4wsis_tpu.train.step0 import init_state, make_step0_train_step

    remat = os.environ.get("CL4WSIS_BENCH_REMAT", "0") == "1"
    # step 0 of COCO-to-VOC trains the 60 non-VOC thing classes
    # (tasks.py "voc" on coco; +1 bg)
    model = make_model(classes=(61,), backbone="wider_resnet38_a2",
                       output_stride=8, crop_size=size, dtype=jnp.bfloat16,
                       remat=remat)
    tx = schedule.make_optimizer(
        None, "adam", schedule.make_schedule("poly", 5e-5, 10000))
    state = init_state(model, tx, jax.random.PRNGKey(0),
                       input_shape=(1, size, size, 3))
    train_step = make_step0_train_step(model, tx, sigma=6, max_inst=50)

    batches = []
    for b in synthetic_batches(batch_size, size, n_classes=60, seed=0,
                               n_batches=n_batches):
        batches.append({"image": jax.device_put(jnp.asarray(b["image"])),
                        "seg": jax.device_put(jnp.asarray(b["seg"])),
                        "inst": jax.device_put(jnp.asarray(b["inst"]))})
    rng = jax.random.PRNGKey(1)

    compiled = train_step.lower(state, batches[0], rng).compile()
    flops = _cost_analysis_flops(compiled)
    mem = {}
    try:
        ma = compiled.memory_analysis()
        mem = {"hbm_args_gb": round(ma.argument_size_in_bytes / 2**30, 2),
               "hbm_temp_gb": round(ma.temp_size_in_bytes / 2**30, 2),
               "hbm_output_gb": round(ma.output_size_in_bytes / 2**30, 2)}
    except Exception:
        pass

    state, metrics = train_step(state, batches[0], rng)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = train_step(state, batches[i % n_batches],
                                    jax.random.fold_in(rng, i))
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0
    out = {"img_s": batch_size * steps / dt,
           "tag": "coco_wrn38_step0" + ("_remat" if remat else ""),
           "desc": f"COCO-to-VOC recipe, WRN-38 OS8, {size}^2 bs{batch_size} bf16",
           "flops_per_step": flops, "batch_size": batch_size,
           "steps": steps, "dt": dt}
    out.update(mem)
    # device-time ground truth (tunnel wall clock is fiction; CLAUDE.md)
    try:
        import shutil
        import tempfile

        from cl4wsis_tpu.utils.device_time import (device_time_report,
                                                   main_module_times)
        tdir = tempfile.mkdtemp(prefix="bench_trace_")
        try:
            with jax.profiler.trace(tdir):
                for i in range(steps):
                    state, metrics = train_step(
                        state, batches[i % n_batches],
                        jax.random.fold_in(rng, 99 + i))
                jax.block_until_ready(metrics["loss"])
            rep = device_time_report(tdir)
            per_step = main_module_times(tdir)
        finally:
            shutil.rmtree(tdir, ignore_errors=True)
        if rep["device_busy_s"] > 0:
            out["device_dt"] = rep["device_busy_s"]
            out["device_steps"] = steps
            if per_step:
                out["device_step_min"] = min(per_step)
                out["device_step_mean"] = sum(per_step) / len(per_step)
                out["device_step_n"] = len(per_step)
    except Exception:
        if jax.default_backend() == "tpu":
            raise
    return out


class _JpegDataset:
    """Synthetic-decode workload: a real VOC-train-shaped sample — JPEG
    decode (500x375) + RandomResizedCrop-to-512 + flip + normalize + label
    nearest-resize — without needing dataset files in the container."""

    def __init__(self, n_images: int = 24, crop: int = 512, seed: int = 0):
        import io

        import numpy as np
        from PIL import Image

        from cl4wsis_tpu.data.transforms import train_transform
        rs = np.random.RandomState(seed)
        self.blobs, self.labels = [], []
        for _ in range(n_images):
            arr = rs.randint(0, 255, (375, 500, 3), np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG", quality=90)
            self.blobs.append(buf.getvalue())
            self.labels.append(rs.randint(0, 21, (375, 500), np.uint8))
        self.transform = train_transform(crop)
        self._Image = Image
        self._io = io

    def __len__(self):
        return 4096

    def __getitem__(self, i):
        import numpy as np

        from cl4wsis_tpu.data.transforms import normalize_image
        k = i % len(self.blobs)
        img = self._Image.open(self._io.BytesIO(self.blobs[k])).convert("RGB")
        lbl = self._Image.fromarray(self.labels[k])
        rng = np.random.RandomState(i)
        img, lbl = self.transform(img, lbl, rng)
        return {"image": normalize_image(img),
                "seg": np.asarray(lbl, np.int32)}


def bench_host(batch_size: int = 16, n_batches: int = 24, num_workers: int = 4):
    """Host input-pipeline throughput (samples/s): JPEG decode + train
    transform + collate through the production Loader."""
    import time

    from cl4wsis_tpu.data.loader import Loader

    ds = _JpegDataset()
    loader = Loader(ds, batch_size, seed=0, num_workers=num_workers)
    it = loader.epoch(0)
    next(it)  # warm the pool
    t0 = time.perf_counter()
    n = 0
    for _ in range(n_batches):
        next(it)
        n += batch_size
    dt = time.perf_counter() - t0
    return {"img_s": n / dt, "tag": f"host-loader(workers={num_workers})",
            "flops_per_step": 0.0, "batch_size": batch_size,
            "steps": n_batches, "dt": dt}


def main():
    import os

    import jax

    # persistent compilation cache: tunnel compiles fluctuate 20s-10min for
    # identical programs (CLAUDE.md), so repeat bench/A-B runs load the
    # compiled executable instead of re-paying that lottery
    try:
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # cache is an optimization only

    which = os.environ.get("CL4WSIS_BENCH", "phase2")
    # the COCO-to-VOC recipe shape (reference scripts/coco.sh): WRN-38-A2,
    # OS8, 448^2, global batch 16; CL step has 61 old / 20 new classes
    coco_kw = dict(size=448, backbone="wider_resnet38_a2", output_stride=8,
                   old=61, new=20)
    if which == "step0":
        r = bench_step0()
    elif which == "phase1":
        r = bench_phase1()
    elif which == "coco_wrn":
        r = bench_coco_wrn()
    elif which == "coco_p1":
        r = bench_phase1(tag="coco_phase1",
                         desc="COCO-to-VOC phase-1, WRN-38 OS8 448^2 bs16 bf16",
                         **coco_kw)
    elif which == "coco_p2":
        from cl4wsis_tpu.train.phase2 import bench_phase2
        r = bench_phase2(tag="coco_phase2",
                         desc="COCO-to-VOC phase-2, WRN-38 OS8 448^2 bs16 bf16",
                         **coco_kw)
    elif which == "host":
        r = bench_host(num_workers=int(os.environ.get("CL4WSIS_WORKERS", "4")))
    else:
        from cl4wsis_tpu.train.phase2 import bench_phase2
        r = bench_phase2()

    img_s = r["img_s"]
    if which == "host":
        # host input pipeline: samples/s it can feed the chip; ratio >= 1 vs
        # the 3x-A100 img/s target means the host is not the bottleneck
        print(json.dumps({
            "metric": f"host pipeline samples/s ({r['tag']}, JPEG decode + "
                      "train transform + collate)",
            "value": round(img_s, 2), "unit": "samples/s",
            "vs_baseline": round(img_s / TARGET, 3),
            "steps": r["steps"], "batch_size": r["batch_size"]}))
        return

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", str(dev.platform))
    peak = chip_peak_tflops(kind)

    desc = r.get("desc", "VOC-15-5-shaped, 512^2 bf16")
    out = {
        "metric": f"images/sec/chip ({r['tag']} train, {desc})",
        "value": round(img_s, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(img_s / TARGET, 3),
        "baseline_img_s": A100_REF_IMG_S,
        "baseline_note": BASELINE_NOTE,
        "chip": kind,
        "steps": r["steps"],
    }
    # compiled-program HBM footprint (memory_analysis) — the checkable form
    # of the iABN memory-story claim (VERDICT r2 item 5)
    for k in ("hbm_args_gb", "hbm_temp_gb", "hbm_output_gb"):
        if k in r:
            out[k] = r[k]
    # wall-clock audit block: everything derived from the tunnel's wall
    # clock lives HERE and only here — it is known-unreliable (acks
    # block_until_ready early), so none of it may be read against the
    # headline. implied_mfu > 1 marks the wall numbers physically
    # impossible.
    wall = {"img_s": round(img_s, 2),
            "step_time_s": round(r["dt"] / r["steps"], 4)}
    if r["flops_per_step"] > 0:
        tflops_s = r["flops_per_step"] * r["steps"] / r["dt"] / 1e12
        wall["tflops_s"] = round(tflops_s, 1)
        if peak is not None:
            wall["implied_mfu"] = round(tflops_s / peak, 3)
            if tflops_s > peak:
                wall["suspect_timing"] = True
        out["xla_flops_per_step"] = r["flops_per_step"]
        out["chip_peak_bf16_tflops"] = peak
    if r.get("device_dt"):
        # the bench self-measured DEVICE time via a profiled loop: this is
        # the headline; the wall figures stay quarantined in "wall"
        dev_s = r["device_dt"] / r["device_steps"]
        dev_img_s = r["batch_size"] / dev_s
        out.update({
            "metric": out["metric"] + " [device-time measured]",
            "value": round(dev_img_s, 2),
            "vs_baseline": round(dev_img_s / TARGET, 3),
            "device_step_time_s": round(dev_s, 4),
            "device_steps_timed": r["device_steps"],
        })
        if r.get("device_step_n"):
            out["device_step_mean_s"] = round(r["device_step_mean"], 4)
            out["device_step_min_s"] = round(r["device_step_min"], 4)
        if r["flops_per_step"] > 0 and peak:
            out["device_mfu"] = round(
                r["flops_per_step"] / dev_s / 1e12 / peak, 3)
    else:
        out["timing"] = "wall-clock only (UNTRUSTED off-TPU tunnel)"
    out["wall"] = wall

    # profiler ground truth: when a trace was captured, derive step time
    # from what the DEVICE actually executed instead of the tunnel's clock
    profile_dir = os.environ.get("CL4WSIS_BENCH_PROFILE", "")
    if profile_dir:
        try:
            from cl4wsis_tpu.utils.device_time import device_time_report
            rep = device_time_report(profile_dir)
            if rep["device_busy_s"] > 0:
                dev_s = rep["device_busy_s"] / r["steps"]
                out["device_step_time_s"] = round(dev_s, 4)
                out["device_img_s"] = round(r["batch_size"] / dev_s, 2)
                if r["flops_per_step"] > 0 and peak:
                    out["device_mfu"] = round(
                        r["flops_per_step"] / dev_s / 1e12 / peak, 3)
                # promote to the headline like the self-measured path does
                if "[device-time measured]" not in out["metric"]:
                    out["metric"] += " [device-time measured]"
                out["value"] = out["device_img_s"]
                out["vs_baseline"] = round(out["device_img_s"] / TARGET, 3)
                out.pop("timing", None)
        except Exception as e:  # trace formats vary; never fail the bench
            out["device_time_error"] = type(e).__name__
    print(json.dumps(out))


if __name__ == "__main__":
    main()
