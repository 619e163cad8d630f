"""CLI entry point: the reference's ``run.py`` as a single SPMD program.

python -m cl4wsis_tpu.cli.main --dataset voc --task 15-5 --step 0 ...

No torch.distributed.launch / rendezvous: one process per host,
``jax.distributed.initialize()`` when multi-host, data sharded over the
mesh inside the jitted steps.
"""

from __future__ import annotations

import os
import sys
from typing import Optional

import numpy as np

from cl4wsis_tpu.cl import tasks
from cl4wsis_tpu.cli.config import Config, parse_config


def build_data(cfg: Config):
    if cfg.synthetic:
        from cl4wsis_tpu.data.synthetic import synthetic_batches

        n_things = tasks.get_per_task_classes(cfg.dataset, cfg.task, cfg.step)
        tot = sum(n_things)

        class SyntheticLoader:
            def __init__(self, n_batches=4):
                self.n = n_batches

            def __len__(self):
                return self.n

            def epoch(self, epoch):
                for b in synthetic_batches(cfg.batch_size, cfg.crop_size,
                                           n_classes=tot - 1,
                                           seed=cfg.seed + epoch,
                                           n_batches=self.n):
                    b["l1h"] = b.pop("l1h")[:, 1:]
                    yield b

        return SyntheticLoader(), None

    from cl4wsis_tpu.data.loader import Loader
    step_dict = tasks.get_task_dict(cfg.dataset, cfg.task, cfg.step)
    if cfg.dataset == "voc":
        from cl4wsis_tpu.data.voc import make_voc_datasets
        train, val = make_voc_datasets(cfg.data_root, step_dict, cfg.step,
                                       cfg.crop_size, cfg.crop_size_val,
                                       overlap=cfg.overlap,
                                       masking=not cfg.no_mask,
                                       pseudo=cfg.pseudo,
                                       val_on_trainset=cfg.val_on_trainset,
                                       seed=cfg.seed)
    elif cfg.dataset == "coco-voc" and cfg.step > 0:
        # step 1 of coco-voc: VOC images, labels in the COCO id space
        # (reference VOCasCOCOSegmentationIncremental)
        from cl4wsis_tpu.data.voc import make_voc_datasets
        train, val = make_voc_datasets(cfg.data_root, step_dict, cfg.step,
                                       cfg.crop_size, cfg.crop_size_val,
                                       overlap=cfg.overlap,
                                       masking=not cfg.no_mask, as_coco=True,
                                       seed=cfg.seed)
    elif cfg.dataset in ("coco", "coco-voc"):
        from cl4wsis_tpu.data.coco import make_coco_datasets
        # reference split-index files (dataset/__init__.py:57-70): the coco
        # path trains on data/{ds}/{task}[-ov]/train-{step}.npy indices
        ov = "-ov" if (cfg.overlap and cfg.dataset == "voc") else ""
        idx_path = os.path.join(cfg.data_root, cfg.dataset,
                                f"{cfg.task}{ov}", f"train-{cfg.step}.npy")
        indices = np.load(idx_path) if os.path.exists(idx_path) else None
        train, val = make_coco_datasets(cfg.data_root, step_dict, cfg.step,
                                        cfg.crop_size, cfg.crop_size_val,
                                        train_indices=indices, seed=cfg.seed)
    else:
        raise NotImplementedError(cfg.dataset)
    import jax
    if cfg.grain:
        from cl4wsis_tpu.data.grain_pipeline import GrainLoader
        loader = GrainLoader(train, cfg.batch_size, seed=cfg.seed,
                             num_workers=cfg.num_workers)
    else:
        loader = Loader(train, cfg.batch_size, seed=cfg.seed,
                        process_index=jax.process_index(),
                        process_count=jax.process_count(),
                        num_workers=cfg.num_workers)
    return loader, val


def main(argv: Optional[list] = None) -> int:
    cfg = parse_config(argv)
    import jax

    if int(os.environ.get("CL4WSIS_MULTIHOST", "0")):
        jax.distributed.initialize()

    loader, val = build_data(cfg)
    iters = max(len(loader), 1)

    from cl4wsis_tpu.train.trainer import Trainer
    trainer = Trainer(cfg, iters_per_epoch=iters)
    cfg = trainer.cfg  # finalized

    # checkpoint plumbing (run.py:90-106)
    start_epoch = 0
    if cfg.step > 0:
        prev = cfg.step_ckpt or trainer.default_ckpt_path(cfg.step - 1)
        if os.path.exists(prev):
            trainer.load_step_ckpt(prev)
            print(f"[ckpt] loaded step checkpoint {prev}")
    if cfg.seg_ckpt and os.path.exists(cfg.seg_ckpt):
        trainer.load_seg_ckpt(cfg.seg_ckpt)
        print(f"[ckpt] loaded seg checkpoint {cfg.seg_ckpt}")
    resume = cfg.ckpt or (trainer.default_ckpt_path()
                          if cfg.continue_ckpt else None)
    if resume and os.path.exists(resume):
        start_epoch = trainer.load_resume(resume)
        print(f"[ckpt] resumed from {resume} at epoch {start_epoch}")

    ckpt_out = trainer.default_ckpt_path()
    os.makedirs(os.path.dirname(ckpt_out), exist_ok=True)

    from cl4wsis_tpu.utils.logging import Logger
    # reference run.py:48-49: logdir_full = {logdir}/{task_name}/{name}/,
    # summary gated on --visualize
    ov = "-ov" if cfg.overlap else ""
    logdir_full = os.path.join(cfg.logdir,
                               f"{cfg.dataset}-{cfg.task}{ov}", cfg.name)
    logger = Logger(logdir_full, rank=jax.process_index(), step=cfg.step,
                    name=cfg.name, summary=cfg.visualize)
    logger.add_config(cfg)

    # determinism canary (run.py:118-119): a fixed-key random draw printed
    # so cross-run / cross-host drift is eyeballable
    canary = jax.random.randint(jax.random.PRNGKey(cfg.seed), (4,), 0, 1000)
    logger.info(f"[canary] {np.asarray(canary).tolist()}")

    def _local_vars(tree):
        # Validation is data-parallel over PROCESSES (each rank evaluates
        # its strided shard, accumulators merge in synch()): the eval jit
        # must be a process-local program, so when the train state lives on
        # a multi-process mesh, pull the (replicated) variables to host and
        # commit them to this process's local device.
        if jax.process_count() > 1:
            return jax.device_put(jax.device_get(tree))
        return tree

    def run_validation(tag: str):
        if val is None:
            return
        if cfg.model == "DeeplabV3" and cfg.phase != 1:
            # semantic-only model: mIoU on the model's own seg output
            import jax.numpy as jnp
            from cl4wsis_tpu.data.loader import eval_samples
            from cl4wsis_tpu.ops.resize import resize_bilinear
            from cl4wsis_tpu.train.eval import validate_semseg

            mv = _local_vars(trainer.model_variables())

            # variables are jit ARGUMENTS, not closure constants: the
            # program caches across validations instead of retracing with
            # each epoch's weights baked in (CLAUDE.md working rule).
            @jax.jit
            def classify_seg(mv, image):
                pred, _ = trainer.model.apply(
                    mv, image, train=False, interpolate=False,
                    method=trainer.model.forward_seg)
                seg = resize_bilinear(pred["seg"], image.shape[1:3],
                                      align_corners=False)
                return jax.nn.softmax(seg.astype(jnp.float32), axis=-1)

            res = validate_semseg(lambda image: classify_seg(mv, image),
                                  eval_samples(val, jax.process_index(),
                                               jax.process_count()),
                                  trainer.tot_classes)
            logger.add_results(res)
            logger.info(f"[{tag}] MeanIoU={res['Mean IoU']:.4f} "
                        f"MeanAcc={res['Mean Acc']:.4f}")
            return
        if cfg.phase == 1:
            # CAM semantic mIoU via the pseudolabeler
            # (run.py:144-150, train.py:695-745)
            import jax.numpy as jnp
            from cl4wsis_tpu.data.loader import eval_samples
            from cl4wsis_tpu.ops.resize import resize_bilinear
            from cl4wsis_tpu.train.eval import validate_semseg

            mv = _local_vars(trainer.model_variables())
            plv = _local_vars(trainer.pseudolabeler_variables())

            # variables as jit arguments (not baked constants) — see above.
            @jax.jit
            def classify(mv, plv, image):
                feats = trainer.model.apply(
                    mv, image, train=False,
                    method=trainer.model.forward_features)
                cam = trainer.pseudolabeler.apply(plv, feats["res5"], train=False)
                cam = resize_bilinear(cam, image.shape[1:3], align_corners=False)
                return jax.nn.softmax(cam.astype(jnp.float32), axis=-1)

            res = validate_semseg(lambda image: classify(mv, plv, image),
                                  eval_samples(val, jax.process_index(),
                                               jax.process_count()),
                                  trainer.tot_classes,
                                  old_classes=trainer.old_classes)
            logger.add_results(res)
            logger.info(f"[{tag}] Val_CAM MeanIoU={res['Mean IoU']:.4f} "
                        f"MeanAcc={res['Mean Acc']:.4f} "
                        f"MeanPrec={res['Mean Precision']:.4f}")
        else:
            from cl4wsis_tpu.data.loader import eval_samples
            from cl4wsis_tpu.train.eval import (make_eval_forward,
                                                validate_instances)
            fwd = make_eval_forward(trainer.model,
                                    _local_vars(trainer.model_variables()),
                                    trainer.tot_classes - 1,
                                    val_flip=cfg.val_flip,
                                    val_thresh=cfg.val_thresh,
                                    val_kernel=cfg.val_kernel, beta=cfg.beta,
                                    max_ctr=cfg.val_max_ctr,
                                    max_cluster=cfg.max_cluster)
            if cfg.sample_num > 0:
                # save sample prediction visualizations (reference
                # --sample_num wandb images)
                import jax.numpy as jnp
                from cl4wsis_tpu.utils.visualize import (denorm,
                                                         label_to_color_image)
                for i in range(min(cfg.sample_num, len(val))):
                    s = val[i]
                    out = fwd(jnp.asarray(s["image"]), s["gt_masks"].shape[1:])
                    ins = np.asarray(out["ins_map"])
                    img = np.clip(denorm(s["image"][0]), 0, 1)
                    # instance ids through the reference's 73-color table
                    # (train.py:32 label_to_color_image), background black.
                    # Wrap ids onto rows 1..72 BEFORE the shift: a plain
                    # (ins+1) % 73 sends ids ≡ 72 (mod 73) to row 0 = black,
                    # hiding them against the background fill.
                    ins_rgb = (label_to_color_image(ins % 72 + 1) * 255
                               * (ins >= 0)[..., None])
                    vis = np.concatenate(
                        [(img * 255).astype(np.uint8), ins_rgb], axis=1)
                    logger.add_image(f"{tag}/sample", vis.astype(np.uint8), i)
            res = validate_instances(
                fwd, eval_samples(val, jax.process_index(),
                                  jax.process_count()))
            logger.add_results({"map": res["map"], "map50": res["map50"],
                                "ap": res["ap"].tolist(),
                                "truncated_centers": res["truncated_centers"]})
            logger.info(f"[{tag}] mAP@[.5:.95]={res['map']:.4f} "
                        f"mAP@.5={res['map50']:.4f}")
            if res["truncated_centers"]:
                logger.info(f"[{tag}] WARNING: {res['truncated_centers']} "
                            "center candidates hit the slot cap "
                            "(--val_max_ctr); consider raising it")

    # --test: skip training, evaluate the loaded checkpoint (run.py:114)
    train_epochs = range(start_epoch, 0 if cfg.test else cfg.epochs)
    for epoch in train_epochs:
        metrics = trainer.train_epoch(epoch, loader.epoch(epoch),
                                      logger=logger)
        loss = metrics.get("loss", float("nan"))
        assert np.isfinite(loss), f"loss diverged: {metrics}"
        logger.info(f"[epoch {epoch}] loss={loss:.4f} "
                    f"({metrics['n_batches']} it, {metrics['epoch_time_s']:.1f}s)")
        for k, v in metrics.items():
            logger.add_scalar(f"Loss/{k}" if k.startswith("l") else k, v, epoch)
        logger.commit()
        if (epoch + 1) % cfg.ckpt_interval == 0 or epoch == cfg.epochs - 1:
            trainer.save(ckpt_out, epoch)
        # in-training validation every val_interval epochs (run.py:132-153)
        if (epoch + 1) % cfg.val_interval == 0 and epoch != cfg.epochs - 1:
            run_validation(f"val e{epoch}")

    run_validation("test")  # final test pass (run.py:168-182)
    logger.close()
    print("[done]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
