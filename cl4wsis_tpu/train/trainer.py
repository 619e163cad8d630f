"""Trainer: per-phase setup, epoch loop, validation dispatch, checkpoints.

Re-design of reference ``run.py:37-192`` + ``train.py:39-196``: builds the
models/aux modules per phase, the grouped optimizer (``train.py:144-185``),
the per-phase jitted step, and drives epochs with per-epoch checkpointing
(``run.py:122-130``) and phase-dependent validation (``run.py:132-153``).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cl4wsis_tpu.cl import tasks
from cl4wsis_tpu.cl.ckpt import (ckpt_path, expand_for_new_step, load_checkpoint,
                                 load_torch_pretrained, save_checkpoint,
                                 tree_merge)
from cl4wsis_tpu.core import create_mesh, replicate, shard_batch
from cl4wsis_tpu.models import make_model
from cl4wsis_tpu.train import schedule
from cl4wsis_tpu.train.phase1 import make_phase1_train_step, phase1_group_fn
from cl4wsis_tpu.train.phase2 import make_phase2_train_step
from cl4wsis_tpu.train.state import TrainState
from cl4wsis_tpu.train.step0 import make_step0_train_step
from cl4wsis_tpu.wss import PeakGenerator, PseudoLabeler


class Trainer:
    def __init__(self, cfg, iters_per_epoch: int):
        self.cfg = cfg = cfg.finalize(iters_per_epoch)
        self.mesh = create_mesh()
        self.dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.dtype]

        self.classes = tasks.get_per_task_classes(cfg.dataset, cfg.task, cfg.step)
        self.tot_classes = sum(self.classes)
        self.old_classes = self.tot_classes - self.classes[-1]
        self.weakly = cfg.weakly and cfg.step > 0
        # --pseudo: dataset supplies precomputed instance labels; training is
        # the supervised (step-0 style) step, no pseudolabeler machinery
        self.supervised_pseudo = self.weakly and cfg.pseudo is not None

        mk = dict(backbone=cfg.backbone, output_stride=cfg.output_stride,
                  crop_size=cfg.crop_size, branch=cfg.branch, dtype=self.dtype,
                  norm_act=cfg.norm_act, remat=cfg.remat)
        if getattr(cfg, "tiny", False):
            mk["backbone_structure"] = (1, 1, 1, 1)
        self.model = make_model(self.classes, detach_instance=cfg.detach_instance,
                                **mk)
        self.model_old = None
        self.old_vars = None
        if cfg.step > 0:
            old_cls = tasks.get_per_task_classes(cfg.dataset, cfg.task,
                                                 cfg.step - 1)
            self.model_old = make_model(old_cls, **mk)

        self.pseudolabeler = None
        self.peakgenerator = None
        if self.weakly and cfg.pseudo is None:
            if cfg.peak_from != "peakgenerator":
                # reference train.py:88: any other value leaves
                # self.peakgenerator unset and the weakly phases crash
                raise NotImplementedError(
                    f"peak_from={cfg.peak_from!r}: only 'peakgenerator' "
                    "is implemented (matching the reference)")
            self.pseudolabeler = PseudoLabeler(num_classes=self.tot_classes,
                                               dtype=self.dtype)
            self.peakgenerator = PeakGenerator(
                num_classes=self.tot_classes - 1,
                old_classes=self.old_classes - 1,
                alpha=cfg.pam_alpha, dtype=self.dtype)

        self._init_states()
        self._build_optimizer()
        self._train_steps: Dict[Any, Any] = {}

    # ------------------------------------------------------------- setup

    def _init_states(self):
        cfg = self.cfg
        x = jnp.zeros((1, cfg.crop_size, cfg.crop_size, 3), self.dtype)
        self.variables = jax.jit(
            lambda: self.model.init(jax.random.PRNGKey(cfg.seed), x,
                                    train=False))()
        pretrained_body = False
        if cfg.pretrained and not cfg.synthetic:
            name = ("wide_resnet38_ipabn_lr_256.pth.tar"
                    if "wide" in cfg.backbone
                    else f"{cfg.backbone}_iabn_sync.pth.tar")
            pre = load_torch_pretrained(
                os.path.join(cfg.pretrained_path, name), cfg.backbone)
            if pre is not None:
                pretrained_body = True
                self.variables = {
                    "params": tree_merge(self.variables["params"],
                                         {"body": pre["params"]}),
                    "batch_stats": tree_merge(self.variables["batch_stats"],
                                              {"body": pre["batch_stats"]})}

        if self.model_old is not None:
            self.old_vars = jax.jit(
                lambda: self.model_old.init(jax.random.PRNGKey(cfg.seed), x,
                                            train=False))()

        self.aux_vars: Dict[str, Any] = {}
        if self.pseudolabeler is not None:
            fs = cfg.crop_size // cfg.output_stride
            ch = 4096 if "wide" in cfg.backbone else 2048
            feat = jnp.zeros((1, fs, fs, ch), self.dtype)
            plv = self.pseudolabeler.init(jax.random.PRNGKey(1), feat,
                                          train=False)
            cam = jnp.zeros((1, fs, fs, self.tot_classes), self.dtype)
            pgv = self.peakgenerator.init(jax.random.PRNGKey(2), cam, train=True)
            self.aux_vars = {"pseudolabeler": plv, "peakgenerator": pgv}

        if cfg.torch_init:
            # re-sample every FRESH kernel/bias in torch's init families so
            # fixture runs start at the reference's loss scale (the top-
            # level names here drive torch_init's per-module path rules)
            from cl4wsis_tpu.models.torch_init import (DEFAULT_SKIP,
                                                       torch_family_init)
            tree = {"model": self.variables["params"]}
            if self.aux_vars:
                tree["pseudolabeler"] = self.aux_vars["pseudolabeler"]["params"]
                tree["peakgenerator"] = self.aux_vars["peakgenerator"]["params"]
            skip = DEFAULT_SKIP + (("body",) if pretrained_body else ())
            tree = torch_family_init(tree, jax.random.PRNGKey(cfg.seed + 77),
                                     skip_paths=skip)
            self.variables = dict(self.variables, params=tree["model"])
            if self.aux_vars:
                self.aux_vars = {
                    "pseudolabeler": dict(self.aux_vars["pseudolabeler"],
                                          params=tree["pseudolabeler"]),
                    "peakgenerator": dict(self.aux_vars["peakgenerator"],
                                          params=tree["peakgenerator"])}

    def _build_optimizer(self):
        cfg = self.cfg
        sched = schedule.make_schedule(cfg.lr_policy, cfg.lr, cfg.max_iters or 1,
                                       start_decay=cfg.start_decay,
                                       power=cfg.lr_power,
                                       decay_step=cfg.lr_decay_step,
                                       decay_factor=cfg.lr_decay_factor)
        if cfg.phase == 1:
            params = {"model": self.variables["params"],
                      "pseudolabeler": self.aux_vars["pseudolabeler"]["params"],
                      "peakgenerator": self.aux_vars["peakgenerator"]["params"]}
            stats = {"model": self.variables["batch_stats"],
                     "pseudolabeler": self.aux_vars["pseudolabeler"]["batch_stats"],
                     "peakgenerator": {}}
            scale = {"body": 1.0, "seg": cfg.lr_head,
                     # absolute lr_pseudo expressed as a multiplier of lr
                     "pseudo": cfg.lr_pseudo / max(cfg.lr, 1e-12),
                     "instance": cfg.lr_head}
            group_fn = phase1_group_fn
        else:
            params = {"model": self.variables["params"]}
            stats = {"model": self.variables["batch_stats"]}
            body = 0.0 if cfg.freeze else 1.0
            seg = 0.0 if cfg.freeze_seg else cfg.lr_head
            scale = {"body": body, "seg": seg, "instance": cfg.lr_head,
                     "pseudo": 0.0}
            group_fn = lambda p: schedule.default_group_fn(  # noqa: E731
                p.split("/", 1)[1] if p.startswith("model/") else p)
        self.tx = schedule.make_optimizer(
            params, cfg.optim, sched, weight_decay=cfg.weight_decay,
            group_scale=scale, group_fn=group_fn, momentum=cfg.momentum)
        self.state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                                batch_stats=stats,
                                opt_state=self.tx.init(params))
        self.state = replicate(self.state, self.mesh)
        if self.old_vars is not None:
            self.old_vars = replicate(self.old_vars, self.mesh)
        if cfg.phase == 1:
            # the live pseudolabeler/peakgenerator ride inside the train
            # state; keeping a second (aliased) copy would be deleted by
            # buffer donation on the first step
            self.aux_vars = {}
        elif self.aux_vars:
            self.aux_vars = replicate(self.aux_vars, self.mesh)

    # ------------------------------------------------------------ steps

    def _get_step(self, epoch: int):
        cfg = self.cfg
        if self.supervised_pseudo:
            if "p0" not in self._train_steps:
                self._train_steps["p0"] = make_step0_train_step(
                    self.model, self.tx, seg_loss="bce", sigma=cfg.sigma)
            return self._train_steps["p0"]
        if cfg.phase == 1:
            key = ("p1", epoch >= cfg.pseudo_ep)
            if key not in self._train_steps:
                self._train_steps[key] = make_phase1_train_step(
                    self.model, self.model_old, self.pseudolabeler,
                    self.peakgenerator, self.tx, self.old_classes,
                    loss_de=cfg.loss_de, l_seg_weight=cfg.l_seg,
                    alpha=cfg.alpha, icarl_bkg=cfg.icarl_bkg,
                    use_affinity=cfg.affinity, use_flac=cfg.flac,
                    use_randrop=cfg.randrop, use_pseudo=epoch >= cfg.pseudo_ep,
                    no_mask=cfg.no_mask)
            return self._train_steps[key]
        if cfg.phase == 2:
            if "p2" not in self._train_steps:
                self._train_steps["p2"] = make_phase2_train_step(
                    self.model, self.model_old, self.pseudolabeler,
                    self.peakgenerator, self.tx, self.old_classes,
                    sigma=cfg.sigma, pseudo_thresh=cfg.pseudo_thresh,
                    refine_thresh=cfg.refine_thresh, nms_kernel=cfg.kernel,
                    beta=cfg.beta, run_refine=cfg.run_refine,
                    max_ctr=cfg.max_ctr, max_cluster=cfg.max_cluster,
                    max_comp=cfg.max_comp, mesh=self.mesh)
            return self._train_steps["p2"]
        if "p0" not in self._train_steps:
            # reference default (no --bce/--dce) is nn.BCEWithLogitsLoss on a
            # long map, which errors at runtime; published scripts always use
            # --bce, so that is the fallback here too (train.py:102-110)
            seg_loss = "dce" if (cfg.dce and not (cfg.bce or cfg.icarl)) else "bce"
            self._train_steps["p0"] = make_step0_train_step(
                self.model, self.tx, seg_loss=seg_loss, sigma=cfg.sigma)
        return self._train_steps["p0"]

    # ------------------------------------------------------------ loops

    # reference wandb tag names for interval logging (train.py:560-564)
    _REF_TAGS = {"loss": "Loss/tot", "l_cam_int": "Loss/CAM_int",
                 "l_cam_new": "Loss/CAM_out", "l_cls": "Loss/SEG_int",
                 "l_seg": "Loss/SEG_out"}

    def train_epoch(self, epoch: int, batches, logger=None) -> Dict[str, float]:
        """One epoch. Returned metrics are EPOCH MEANS over all batches
        (reference train.py:543,568-580: epoch_loss accumulated per step,
        divided by len(loader) at the end); per-loss components are logged
        as interval means every ``print_interval`` steps when a logger is
        attached (train.py:552-566).

        Aggregation stays on device (lazy adds) so dispatch remains async;
        the only host syncs are the first batch (fail fast on NaN/compile
        errors) and each print_interval boundary, matching the reference's
        per-interval .item() cadence.
        """
        cfg = self.cfg
        step_fn = self._get_step(epoch)
        phase = None if self.supervised_pseudo else cfg.phase
        rng = jax.random.PRNGKey(cfg.seed + epoch)
        agg = None          # on-device running sums over the epoch
        interval = None     # on-device running sums since last print
        n = 0
        n_int = 0
        t0 = time.time()
        timer = None
        if cfg.profile_dir and epoch == 0:
            from cl4wsis_tpu.utils.logging import StepTimer
            timer = StepTimer(cfg.profile_dir, trace_steps=range(2, 5))
        for i, batch in enumerate(self._prefetch_device(batches)):
            rng, sub = jax.random.split(rng)
            if timer is not None:
                timer.start_step(i)
            if phase == 1:
                self.state, metrics = step_fn(self.state, batch, self.old_vars, sub)
            elif phase == 2:
                self.state, metrics = step_fn(self.state, batch, self.old_vars,
                                              self.aux_vars, sub)
            else:
                self.state, metrics = step_fn(self.state, batch, sub)
            if timer is not None:
                timer.end_step(i, metrics["loss"])
            agg = metrics if agg is None else jax.tree_util.tree_map(
                jnp.add, agg, metrics)
            interval = metrics if interval is None else jax.tree_util.tree_map(
                jnp.add, interval, metrics)
            n += 1
            n_int += 1
            if i == 0 or cfg.debug:
                jax.block_until_ready(metrics["loss"])
            if logger is not None and (i + 1) % cfg.print_interval == 0:
                means = {k: float(v) / n_int for k, v in interval.items()}
                logger.debug(f"Epoch {epoch}, Batch {i + 1}, "
                             f"Loss={means.get('loss', float('nan')):.6f}")
                ipe = (cfg.max_iters // cfg.epochs) if cfg.epochs else 0
                x = epoch * max(ipe, i + 1) + i + 1
                for k, v in means.items():
                    logger.add_scalar(self._REF_TAGS.get(k, f"Loss/{k}"), v, x,
                                      intermediate=True)
                logger.commit(intermediate=True)
                interval = None
                n_int = 0
        if n == 0:
            raise ValueError(
                "epoch produced no batches — dataset smaller than "
                "batch_size after task filtering?")
        metrics = {k: float(v) / n for k, v in agg.items()}
        metrics["epoch_time_s"] = time.time() - t0
        metrics["n_batches"] = n
        if timer is not None:
            metrics.update({f"step_{k}": v for k, v in timer.summary().items()})
        return metrics

    def _prefetch_device(self, batches, size: int = 2):
        """Start H2D transfers `size` batches ahead of the consuming step
        (transfers are async; this hides copy latency behind compute)."""
        from collections import deque
        q: deque = deque()
        for batch_np in batches:
            q.append(self._device_batch(batch_np))
            if len(q) > size:
                yield q.popleft()
        while q:
            yield q.popleft()

    def _device_batch(self, batch_np: Dict[str, np.ndarray]):
        cfg = self.cfg
        out = {"image": jnp.asarray(batch_np["image"], self.dtype)}
        if cfg.phase in (1, 2) and not self.supervised_pseudo:
            out["l1h"] = jnp.asarray(batch_np["l1h"], jnp.float32)
        else:
            out["seg"] = jnp.asarray(batch_np["seg"], jnp.int32)
            out["inst"] = jnp.asarray(batch_np["inst"], jnp.int32)
        return shard_batch(out, self.mesh)

    # ------------------------------------------------------- checkpoints

    def model_variables(self) -> Dict[str, Any]:
        return {"params": self.state.params["model"],
                "batch_stats": self.state.batch_stats["model"]}

    def pseudolabeler_variables(self) -> Optional[Dict[str, Any]]:
        if self.cfg.phase == 1:
            return {"params": self.state.params["pseudolabeler"],
                    "batch_stats": self.state.batch_stats["pseudolabeler"]}
        if self.aux_vars:
            return self.aux_vars["pseudolabeler"]
        return None

    def save(self, path: str, epoch: int):
        """Every process enters the orbax save: in a multi-process runtime
        ``Checkpointer.save`` is a COLLECTIVE (it runs internal
        ``sync_global_processes`` barriers), and orbax writes host-local
        numpy/replicated values from the primary host only — the moral
        equivalent of the reference's ``if rank == 0: save_ckpt``
        (run.py:122-130) with the barrier built in. Gating the call on
        process 0 deadlocks/mismatches the other ranks' next collective
        (found by tests/test_multihost_cli.py). The trailing barrier keeps a
        subsequent load from racing a half-written checkpoint."""
        tree = {"state": jax.device_get(self.state),
                "aux_vars": jax.device_get(self.aux_vars),
                "epoch": epoch}
        save_checkpoint(path, tree)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(f"ckpt_saved_{epoch}")

    def load_resume(self, path: str) -> int:
        blob = load_checkpoint(path)
        # orbax restores plain dicts; rebuild the TrainState struct. The
        # optimizer state is restored by-structure into the freshly-built
        # opt state (tuple structure is lost in serialization).
        s = blob["state"]
        opt_state = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(self.state.opt_state),
            jax.tree_util.tree_leaves(s["opt_state"]))
        state = TrainState(step=jnp.asarray(s["step"]),
                           params=s["params"],
                           batch_stats=s["batch_stats"],
                           opt_state=opt_state)
        self.state = replicate(state, self.mesh)
        if blob.get("aux_vars"):
            self.aux_vars = replicate(blob["aux_vars"], self.mesh)
        return int(blob["epoch"]) + 1

    def load_step_ckpt(self, path: str):
        """Previous-step checkpoint into new model + frozen old model
        (``train.py:747-771``)."""
        blob = load_checkpoint(path)
        old_model_vars = {
            "params": blob["state"]["params"]["model"],
            "batch_stats": blob["state"]["batch_stats"]["model"]}
        merged = expand_for_new_step(
            {"params": self.state.params["model"],
             "batch_stats": self.state.batch_stats["model"]},
            old_model_vars, self.classes,
            init_balanced=self.cfg.init_balanced)
        params = dict(self.state.params)
        stats = dict(self.state.batch_stats)
        params["model"] = merged["params"]
        stats["model"] = merged["batch_stats"]
        self.state = self.state.replace(params=replicate(params, self.mesh),
                                        batch_stats=replicate(stats, self.mesh))
        if self.model_old is not None:
            # deep-copy: these arrays also live in the (donated) train state;
            # device_put caching would otherwise alias the buffers and the
            # first donating step would delete the frozen model
            copied = jax.tree_util.tree_map(lambda x: np.array(x),
                                            old_model_vars)
            ov = {"params": tree_merge(self.old_vars["params"],
                                       copied["params"]),
                  "batch_stats": tree_merge(self.old_vars["batch_stats"],
                                            copied["batch_stats"])}
            self.old_vars = replicate(ov, self.mesh)

    def load_seg_ckpt(self, path: str):
        """Phase-1 result into phase-2 model + pseudolabeler/peakgenerator
        (``train.py:797-812``)."""
        blob = load_checkpoint(path)
        params = dict(self.state.params)
        stats = dict(self.state.batch_stats)
        params["model"] = tree_merge(params["model"],
                                     blob["state"]["params"]["model"])
        stats["model"] = tree_merge(stats["model"],
                                    blob["state"]["batch_stats"]["model"])
        self.state = self.state.replace(params=replicate(params, self.mesh),
                                        batch_stats=replicate(stats, self.mesh))
        if self.aux_vars and "pseudolabeler" in blob["state"]["params"]:
            aux = {
                "pseudolabeler": {
                    "params": blob["state"]["params"]["pseudolabeler"],
                    "batch_stats": blob["state"]["batch_stats"]["pseudolabeler"]},
                "peakgenerator": {
                    "params": blob["state"]["params"]["peakgenerator"]},
            }
            self.aux_vars = replicate(
                tree_merge(jax.device_get(self.aux_vars), aux), self.mesh)

    def default_ckpt_path(self, step: Optional[int] = None) -> str:
        cfg = self.cfg
        return ckpt_path(cfg.checkpoint, cfg.dataset, cfg.task, cfg.overlap,
                         cfg.name, cfg.step if step is None else step)
