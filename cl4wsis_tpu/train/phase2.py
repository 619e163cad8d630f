"""Phase-2 (CL4WSIS instance) jitted train step.

Re-design of the reference phase-2 loop body (``train.py:256-272,418-541``):
backbone + semantic branch frozen, only the instance decoder/head trains.
Per step:

1. frozen TTA seg forward on [img, flip(img)], averaged (train.py:259-263);
2. instance branch on stop-gradient features (grads only here);
3. CAM from frozen pseudolabeler -> PeakGenerator (eval) -> smoothing ->
   peaks (train.py:421-436);
4. pseudo center/offset/weight from the 1-peak-1-component rule on the
   frozen-seg argmax (device op, replaces the per-image cv2 loop);
5. self-refinement labels from the model's own center/offset predictions;
6. blend pseudo/refined by weight maps; old-class supervision from the old
   model's center/offset outputs (x0.5 each, train.py:506-519).

The whole thing — dual backbone passes, CAM, connected components, peak
matching, grouping, refinement, losses, optimizer — is ONE XLA program.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from cl4wsis_tpu.ops.peaks import peak_extract_nchw, smoothing
from cl4wsis_tpu.ops.pseudo_labels import pseudo_label_generation
from cl4wsis_tpu.ops.refine import refine_label_generation
from cl4wsis_tpu.ops.resize import resize_bilinear, resize_bilinear_nchw
from cl4wsis_tpu.train import losses
from cl4wsis_tpu.train.state import TrainState
from cl4wsis_tpu.train.step0 import CENTER_LOSS_WEIGHT, OFFSET_LOSS_WEIGHT


def make_phase2_train_step(model, model_old, pseudolabeler, peakgenerator,
                           tx: optax.GradientTransformation,
                           old_classes: int,
                           *,
                           sigma: int = 6,
                           pseudo_thresh: float = 0.7,
                           refine_thresh: float = 0.3,
                           nms_kernel: int = 41,
                           peak_kernel: int = 15,
                           beta: float = 3.0,
                           run_refine: bool = True,
                           max_peaks: int = 25,
                           max_ctr: int = 16,
                           max_cluster: int = 8,
                           max_comp: int = 64,
                           cc_iters: int = 64,
                           mesh=None) -> Callable:
    """Build the phase-2 step.

    params tree: {"model": ...}; pseudolabeler/peakgenerator variables ride
    in `aux_vars` (frozen, trained in phase 1). `old_vars` is the frozen
    previous-step model.

    `mesh`: the data mesh when training multi-chip. The label factory's CC
    fixpoint `while_loop`s stop on `jnp.any(changed)`; under plain GSPMD
    over a sharded batch that condition is a cross-chip all-reduce EVERY
    sweep (tens of iterations x 2 CC passes x collective latency — the
    8-device CPU dryrun spent 200s in them). The factory is per-image, so
    with a mesh it runs under `jax.shard_map`: each device iterates to its
    OWN local fixpoint with zero collectives.
    """
    tot_classes = model.tot_classes
    n_things = tot_classes - 1
    old_things = old_classes - 1

    from cl4wsis_tpu.ops.pallas_stamp import stamp_centers_batched
    from cl4wsis_tpu.ops.pseudo_labels import (class_components,
                                               pseudo_label_slots)
    from cl4wsis_tpu.ops.refine import refine_label_slots

    def label_factory(seg_gt, cls_label, peak_ys, peak_xs, peak_valid,
                      soft, center_sg, offset_sg):
        """Per-image label factory (class CC + pseudo labels + refinement).
        Everything is independent per batch element — safe to shard_map."""
        size = seg_gt.shape[1:3]
        # the class-CC fixpoint pass + stats are computed ONCE and shared
        # between the pseudo-label and refinement ops (identical (seg,
        # label) input — each pass was a top-3 cost of the whole step in
        # the round-2 profile, and it used to run twice). Peaks ride the
        # shared sorted-domain pass (per-component valid-peak counts are a
        # segmented scan there, not an HW-table segment_sum).
        comps = jax.vmap(
            lambda s, cl, py, px, pv: class_components(
                s, cl, num_classes=n_things, first_class=old_things,
                cc_iters=cc_iters, peak_ys=py, peak_xs=px, peak_valid=pv))(
            seg_gt, cls_label, peak_ys, peak_xs, peak_valid)
        pl_fn = partial(pseudo_label_slots, num_classes=n_things,
                        sigma=sigma, max_comp=max_comp, cc_iters=cc_iters,
                        first_class=old_things)
        p_slots, po, pw, _, p_trunc = jax.vmap(
            lambda s, py, px, pv, cl, comp: pl_fn(s, py, px, pv, cl,
                                                  components=comp))(
            seg_gt, peak_ys, peak_xs, peak_valid, cls_label, comps)
        # the gaussian stamp runs BATCHED outside the vmap: a vmapped
        # dynamic-window stamp cannot batch and lowers to while-loops over
        # the batch (~65 ms/step on the round-4 trace); the batched kernel
        # (Pallas on TPU) composes every image/slot in one pass
        pc = stamp_centers_batched(*p_slots, num_classes=n_things,
                                   sigma=sigma, shape=size)
        out = {"pc": pc, "po": po, "pw": pw, "p_trunc": p_trunc}
        if run_refine:
            rf_fn = partial(refine_label_slots, num_classes=n_things,
                            sigma=sigma, refine_thresh=refine_thresh,
                            nms_kernel=nms_kernel, beta=beta, max_ctr=max_ctr,
                            max_cluster=max_cluster, cc_iters=cc_iters,
                            first_class=old_things)
            refined = jax.vmap(
                lambda sp, c, o, cl, s, comp: rf_fn(sp, c, o, cl, s,
                                                    components=comp))(
                soft, center_sg, offset_sg, cls_label, seg_gt, comps)
            refined["center"] = stamp_centers_batched(
                refined.pop("stamp_valid"), refined.pop("stamp_y"),
                refined.pop("stamp_x"), refined.pop("stamp_cls"),
                num_classes=n_things, sigma=sigma, shape=size)
            out["refined"] = refined
        return out

    if mesh is not None and mesh.size > 1:
        from cl4wsis_tpu.core.mesh import DATA_AXIS
        from jax.sharding import PartitionSpec as P
        spec = P(DATA_AXIS)
        label_factory = jax.shard_map(label_factory, mesh=mesh,
                                      in_specs=spec, out_specs=spec,
                                      check_vma=False)

    def loss_fn(params, stats, batch, old_vars, aux_vars, rng):
        images, l1h = batch["image"], batch["l1h"]
        size = images.shape[1:3]

        # ---- old model (frozen): seg + center + offset -------------------
        out_old, _ = model_old.apply(old_vars, images, train=False,
                                     interpolate=False)
        out_old = jax.lax.stop_gradient(out_old)

        # ---- frozen seg TTA forward on img and flip(img) -----------------
        # two same-sharding passes instead of the reference's
        # concat([img, flip]) batch-doubling (train.py:261): eval-mode BN
        # makes them bit-identical, and the concat/split pattern forces an
        # all-to-all resharding on a data-parallel mesh (the halves live on
        # different devices) — pure overhead, and it aborts XLA:CPU's
        # collective rendezvous on slow hosts.
        mvars = {"params": params["model"], "batch_stats": stats["model"]}
        (seg_a, feats) = model.apply(mvars, images, train=False,
                                     interpolate=False,
                                     method=model.forward_seg)
        (seg_b, _) = model.apply(mvars, jnp.flip(images, axis=2),
                                 train=False, interpolate=False,
                                 method=model.forward_seg)
        seg_a = jax.lax.stop_gradient(seg_a)
        seg_b = jax.lax.stop_gradient(seg_b)
        feats = jax.lax.stop_gradient(feats)
        seg_max = (seg_a["seg"] + jnp.flip(seg_b["seg"], axis=2)) / 2.0

        # ---- instance branch on detached features (the only grads) ------
        feats_b = feats["features"]
        instance = model.apply(
            {"params": params["model"], "batch_stats": stats["model"]},
            feats_b, train=True, method=model.forward_instance,
            mutable=["batch_stats"], rngs={"dropout": rng})
        instance, model_stats = instance
        # f32 from here: the losses/refine compute in f32 anyway, and
        # keeping these bf16 forced a slow odd-layout relayout copy of the
        # sliced center map (profiled ~0.3s/step)
        center_out = resize_bilinear(
            instance["center"].astype(jnp.float32), size, align_corners=False)
        offset_out = resize_bilinear(
            instance["offset"].astype(jnp.float32), size, align_corners=False)

        # ---- CAM -> peaks -------------------------------------------------
        int_masks = pseudolabeler.apply(aux_vars["pseudolabeler"],
                                        feats_b["res5"], train=False)
        _, cam = peakgenerator.apply(aux_vars["peakgenerator"], int_masks,
                                     label=l1h, train=False)
        cam = smoothing(cam)
        # peaks are only consumed for NEW classes (cls_label zeroes old
        # ones below): slice to NC channels, go channel-first at the SMALL
        # cam resolution (a full-res relayout costs ~0.3s/step), upsample
        # in NCHW (bit-identical einsum contractions), extract, re-pad
        cam_t = jax.lax.stop_gradient(
            cam[..., old_things:]).transpose(0, 3, 1, 2)
        cam_t = resize_bilinear_nchw(cam_t, size, align_corners=False)
        peak_conf, peak_ys, peak_xs = peak_extract_nchw(
            cam_t, kernel=peak_kernel, k=max_peaks)
        pad = ((0, 0), (old_things, 0), (0, 0))
        peak_conf = jnp.pad(peak_conf, pad)
        peak_ys = jnp.pad(peak_ys, pad)
        peak_xs = jnp.pad(peak_xs, pad)

        # ---- frozen-seg argmax GT -----------------------------------------
        seg_max_up = jax.lax.stop_gradient(
            resize_bilinear(seg_max, size, align_corners=False))
        soft = jax.nn.softmax(seg_max_up.astype(jnp.float32), axis=-1)
        soft = soft.at[..., old_classes:].multiply(
            l1h[:, None, None, old_classes - 1:])
        seg_gt = jnp.argmax(soft, axis=-1).astype(jnp.int32)
        old_fg = ((seg_gt < old_classes) & (seg_gt != 0))[..., None].astype(jnp.float32)
        seg_gt = jnp.where(seg_gt < old_classes, 0, seg_gt)

        cls_label = l1h.at[:, :old_things].set(0.0)   # new classes only
        peak_valid = (peak_conf >= pseudo_thresh) & (cls_label[:, :, None] > 0)

        # ---- pseudo labels + self-refinement (device label factory) -------
        # only NEW classes can produce labels (old cls_label entries are 0),
        # so skip the old classes' CC/matching work entirely. Runs under
        # shard_map on a multi-chip mesh (see make_phase2_train_step doc).
        fac = label_factory(seg_gt, cls_label, peak_ys, peak_xs, peak_valid,
                            soft, jax.lax.stop_gradient(center_out),
                            jax.lax.stop_gradient(offset_out))
        pc, po, pw = fac["pc"], fac["po"], fac["pw"]
        label_truncated = jnp.sum(fac["p_trunc"])

        if run_refine:
            refined = fac["refined"]
            label_truncated = label_truncated + jnp.sum(refined["truncated"])
            pw_sum = jnp.maximum(old_fg, pw)
            pc_new = pw * pc[..., old_things:] + \
                (1 - pw) * refined["center"][..., old_things:]
            pc = pc.at[..., old_things:].set(pc_new)
            po = pw_sum * po + (1 - pw_sum) * refined["offset"]
            pw = jnp.maximum(pw, refined["weight"])

        # ---- old/new center+offset losses ---------------------------------
        out_old_center = resize_bilinear(out_old["center"], size, align_corners=False)
        out_old_offset = resize_bilinear(out_old["offset"], size, align_corners=False)

        center_loss_1 = 0.5 * losses.weighted_mse(
            center_out[..., :old_things], out_old_center, old_fg) * CENTER_LOSS_WEIGHT
        offset_loss_1 = 0.5 * losses.weighted_l1(
            offset_out, out_old_offset, old_fg) * OFFSET_LOSS_WEIGHT
        center_loss_2 = 0.5 * losses.weighted_mse(
            center_out[..., old_things:], pc[..., old_things:], pw) * CENTER_LOSS_WEIGHT
        offset_loss_2 = 0.5 * losses.weighted_l1(
            offset_out, po, pw) * OFFSET_LOSS_WEIGHT

        l_center = center_loss_1 + center_loss_2
        l_offset = offset_loss_1 + offset_loss_2
        loss = l_center + l_offset
        metrics = {"loss": loss, "l_center": l_center, "l_offset": l_offset,
                   "pseudo_weight_px": jnp.sum(pw),
                   # label-factory slot-cap saturation this step (0 = the
                   # static caps lost nothing vs the reference's unbounded
                   # label factory; see PARITY.md "slot caps")
                   "label_truncated": label_truncated}
        return loss, (model_stats["batch_stats"], metrics)

    @partial(jax.jit, donate_argnums=0)
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   old_vars: Any, aux_vars: Any, rng: jax.Array
                   ) -> Tuple[TrainState, Dict[str, Any]]:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_model_stats, metrics)), grads = grad_fn(
            state.params, state.batch_stats, batch, old_vars, aux_vars, rng)
        state = state.apply_gradients(tx, grads)
        # forward_instance only touches the instance branch; merge its stats
        # into the full tree (body/seg BN stays frozen, train.py:235-240)
        merged = _deep_merge(state.batch_stats["model"], new_model_stats)
        state = state.replace(batch_stats={"model": merged})
        return state, metrics

    return train_step


def _deep_merge(base, update):
    if isinstance(base, dict):
        out = dict(base)
        for k, v in update.items():
            out[k] = _deep_merge(base[k], v) if k in base else v
        return out
    return update


def bench_phase2(batch_size: int = 16, size: int = 512, steps: int = 20,
                 n_batches: int = 4, backbone: str = "resnet101",
                 output_stride: int = 16, old: int = 16, new: int = 5,
                 tag: str = "phase2", desc: str = None):
    """Throughput bench for the BASELINE.md north-star config (VOC 15-5
    phase-2 shaped by default; backbone/output_stride/old/new parameterize
    the COCO-to-VOC recipe: WRN-38-A2, OS8, 448^2, 61 old + 20 new —
    reference scripts/coco.sh:26-28).

    Streams ``n_batches`` DISTINCT pre-transferred batches round-robin (no
    single cached-batch artifact) and reports the XLA-compiled program's own
    FLOP estimate so the caller can derive TFLOP/s and implied MFU.

    Returns a dict: {img_s, tag, flops_per_step, batch_size, steps, dt}.
    """
    import os
    import sys
    import time

    from cl4wsis_tpu.data.synthetic import synthetic_batches
    from cl4wsis_tpu.models import make_model
    from cl4wsis_tpu.train import schedule
    from cl4wsis_tpu.wss import PeakGenerator, PseudoLabeler

    t_start = time.time()

    def beat(msg):
        # tunnel compiles fluctuate 20s-10min+ (CLAUDE.md); stderr heartbeats
        # make a wedged run diagnosable without killing it
        print(f"bench_phase2 [{time.time() - t_start:.0f}s] {msg}",
              file=sys.stderr, flush=True)

    steps = int(os.environ.get("CL4WSIS_BENCH_STEPS", steps))
    OLD, NEW = old, new
    TOT = OLD + NEW
    dtype = jnp.bfloat16
    model = make_model(classes=(OLD, NEW), crop_size=size, branch="ins",
                       backbone=backbone, output_stride=output_stride,
                       detach_instance=True, dtype=dtype)
    model_old = make_model(classes=(OLD,), crop_size=size, branch="ins",
                           backbone=backbone, output_stride=output_stride,
                           dtype=dtype)
    pl_mod = PseudoLabeler(num_classes=TOT, dtype=dtype)
    pg_mod = PeakGenerator(num_classes=TOT - 1, old_classes=OLD - 1, dtype=dtype)

    x = jnp.zeros((1, size, size, 3), dtype)
    beat("initializing models")
    mv = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
    ov = jax.jit(lambda: model_old.init(jax.random.PRNGKey(0), x, train=False))()
    fs = size // output_stride
    feat_ch = 4096 if "wider" in backbone else 2048
    plv = pl_mod.init(jax.random.PRNGKey(1),
                      jnp.zeros((1, fs, fs, feat_ch), dtype), train=False)
    pgv = pg_mod.init(jax.random.PRNGKey(2),
                      jnp.zeros((1, fs, fs, TOT), dtype), train=True)
    aux_vars = {"pseudolabeler": plv, "peakgenerator": pgv}

    params = {"model": mv["params"]}
    stats = {"model": mv["batch_stats"]}
    tx = schedule.make_optimizer(
        params, "adam", schedule.make_schedule("poly", 5e-5, 10000),
        group_scale={"body": 0.0, "seg": 0.0, "instance": 10.0, "pseudo": 0.0},
        group_fn=lambda p: schedule.default_group_fn(p.split("/", 1)[1]))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=stats, opt_state=tx.init(params))
    cc_iters = int(os.environ.get("CL4WSIS_BENCH_CC_ITERS", "64"))
    step = make_phase2_train_step(model, model_old, pl_mod, pg_mod, tx,
                                  old_classes=OLD, cc_iters=cc_iters)

    batches = []
    for b in synthetic_batches(batch_size, size, n_classes=TOT - 1, seed=0,
                               n_batches=n_batches):
        batches.append({"image": jax.device_put(jnp.asarray(b["image"], dtype)),
                        "l1h": jax.device_put(jnp.asarray(b["l1h"][:, 1:]))})
    rng = jax.random.PRNGKey(3)

    # compile once explicitly so we can pull XLA's own FLOP estimate
    beat("compiling train step")
    lowered = step.lower(state, batches[0], ov, aux_vars, rng)
    compiled = lowered.compile()
    flops = _cost_analysis_flops(compiled)

    beat("warmup step")
    state, m = step(state, batches[0], ov, aux_vars, rng)
    jax.block_until_ready(m["loss"])
    beat("timed loop")

    import contextlib
    profile_dir = os.environ.get("CL4WSIS_BENCH_PROFILE", "")
    ctx = (jax.profiler.trace(profile_dir) if profile_dir
           else contextlib.nullcontext())
    with ctx:
        t0 = time.perf_counter()
        for i in range(steps):
            state, m = step(state, batches[i % n_batches], ov, aux_vars,
                            jax.random.fold_in(rng, i))
        jax.block_until_ready(m["loss"])
        dt = time.perf_counter() - t0
    out = {"img_s": batch_size * steps / dt, "tag": tag,
           "flops_per_step": flops, "batch_size": batch_size,
           "steps": steps, "dt": dt}
    if desc:
        out["desc"] = desc

    # device-time ground truth by default: the remote-TPU tunnel acks
    # block_until_ready before the device finishes, so the wall clock above
    # overstates throughput by large factors. A profiled loop gives the
    # DEVICE's own step time. Disable with CL4WSIS_BENCH_DEVICE_TIME=0.
    if (os.environ.get("CL4WSIS_BENCH_DEVICE_TIME", "1") == "1"
            and not profile_dir):
        on_tpu = jax.default_backend() == "tpu"
        try:
            import shutil
            import tempfile

            from cl4wsis_tpu.utils.device_time import (device_time_report,
                                                       main_module_times)
            dev_steps = int(os.environ.get("CL4WSIS_BENCH_DEVICE_STEPS", "20"))
            beat(f"device-time loop ({dev_steps} profiled steps)")
            tdir = tempfile.mkdtemp(prefix="bench_trace_")
            try:
                with jax.profiler.trace(tdir):
                    for i in range(dev_steps):
                        state, m = step(state, batches[i % n_batches], ov,
                                        aux_vars, jax.random.fold_in(rng, 99 + i))
                    jax.block_until_ready(m["loss"])
                rep = device_time_report(tdir)
                per_step = main_module_times(tdir)
            finally:
                shutil.rmtree(tdir, ignore_errors=True)
            if rep["device_busy_s"] > 0:
                out["device_dt"] = rep["device_busy_s"]
                out["device_steps"] = dev_steps
                if per_step:
                    out["device_step_min"] = min(per_step)
                    out["device_step_mean"] = sum(per_step) / len(per_step)
                    out["device_step_n"] = len(per_step)
            elif on_tpu:
                raise RuntimeError("profiler trace captured no device time")
        except Exception as e:
            if on_tpu:
                # on TPU, silently reverting to the known-fictitious wall
                # clock would report ~100x throughput — refuse instead
                # (VERDICT r2 weak #7)
                raise RuntimeError(
                    "device-time measurement failed on TPU; refusing to "
                    "report tunnel wall clock as the headline. Set "
                    "CL4WSIS_BENCH_DEVICE_TIME=0 to explicitly opt out. "
                    f"Cause: {type(e).__name__}: {e}") from e
            # CPU/interpret runs: wall clock is real; proceed without
    return out


def _cost_analysis_flops(compiled):
    """Pull the per-execution FLOP estimate from a compiled XLA program.

    Returns 0.0 when the backend doesn't expose cost analysis (callers must
    treat 0 as unknown, not free)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax: one dict per device
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0
