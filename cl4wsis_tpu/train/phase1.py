"""Phase-1 (CL-WSSS) jitted train step.

Re-design of the reference phase-1 loop body (``train.py:303-416,521-541``):
with only image-level labels for the new classes, train the PseudoLabeler
CAM head (+ PeakGenerator) on live backbone features, supervised by

* l_cam_new: image-level nGWP-focal BCE on new-class CAM channels,
* l_loc: BCE of old-class CAM channels toward the *old model's* seg output
  (background-shift fix),
* flac: flip/rotation consistency MSE on the mean new-class CAM,
* l_peak: image-level BCE on PeakGenerator logits,
* lde: MSE distillation between new and old backbone features,
* after `pseudo_ep` epochs: PAMR-refined CAM -> pseudo seg GT -> gated BCE
  on the model's seg output (l_seg), class-balanced CE on the raw CAM
  (l_cls), and the randrop negative loss.

Everything — two backbones, 3B pseudolabeler forward, PAMR's 10 propagation
iterations — compiles into ONE XLA program per (use_pseudo) variant; the
reference runs these as separate CUDA launches per module.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from cl4wsis_tpu.ops.pamr import pamr
from cl4wsis_tpu.ops.resize import resize_bilinear
from cl4wsis_tpu.train import losses
from cl4wsis_tpu.train.state import TrainState
from cl4wsis_tpu.wss import losses as wss_losses

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def denorm(images: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(IMAGENET_MEAN, images.dtype)
    std = jnp.asarray(IMAGENET_STD, images.dtype)
    return images * std + mean


def _rot90_batch(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """rot90 by a traced k in {1,2,3} on NHWC (square spatial dims)."""
    return jax.lax.switch(k - 1, [
        lambda a: jnp.rot90(a, 1, axes=(1, 2)),
        lambda a: jnp.rot90(a, 2, axes=(1, 2)),
        lambda a: jnp.rot90(a, 3, axes=(1, 2)),
    ], x)


def _rot90_back(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.switch(k - 1, [
        lambda a: jnp.rot90(a, 3, axes=(1, 2)),
        lambda a: jnp.rot90(a, 2, axes=(1, 2)),
        lambda a: jnp.rot90(a, 1, axes=(1, 2)),
    ], x)


def make_phase1_train_step(model, model_old, pseudolabeler, peakgenerator,
                           tx: optax.GradientTransformation,
                           old_classes: int,
                           *,
                           loss_de: float = 1.0,
                           l_seg_weight: float = 1.0,
                           alpha: float = 0.5,
                           icarl_bkg: float = -1.0,
                           use_affinity: bool = True,
                           use_flac: bool = True,
                           use_randrop: bool = True,
                           use_pseudo: bool = False,
                           no_mask: bool = False) -> Callable:
    """Build the phase-1 step. `use_pseudo` selects the post-warmup program
    (epoch >= pseudo_ep); build one step per variant (both cached by jit)."""
    tot_classes = model.tot_classes

    def loss_fn(params, stats, batch, old_vars, rng):
        images, l1h = batch["image"], batch["l1h"]
        bs = images.shape[0]
        rng_drop, rng_angle, rng_randrop = jax.random.split(rng, 3)

        # ---- old model, frozen eval ------------------------------------
        (out_old, feats_old) = model_old.apply(
            old_vars, images, train=False, interpolate=False,
            method=model_old.forward_seg)
        out_old = jax.lax.stop_gradient(out_old)
        feats_old = jax.lax.stop_gradient(feats_old)

        # ---- new model, train mode (body + seg head get grads) ---------
        ((pred, feats), model_stats) = model.apply(
            {"params": params["model"], "batch_stats": stats["model"]},
            images, train=True, interpolate=False,
            mutable=["batch_stats"], rngs={"dropout": rng_drop})

        feat_body = feats["body"]

        # ---- pseudolabeler ----------------------------------------------
        pl_vars = {"params": params["pseudolabeler"],
                   "batch_stats": stats["pseudolabeler"]}
        # eval pass (running stats, no grad) -> int_masks for pseudo GT
        int_masks = jax.lax.stop_gradient(
            pseudolabeler.apply(pl_vars, feat_body, train=False))

        if use_flac:
            angle_k = jax.random.randint(rng_angle, (), 1, 4)
            feat_in = jnp.concatenate(
                [feat_body, jnp.flip(feat_body, axis=2),
                 _rot90_batch(feat_body, angle_k)], axis=0)
        else:
            feat_in = feat_body

        int_masks_raw, pl_stats = pseudolabeler.apply(
            pl_vars, feat_in, train=True, mutable=["batch_stats"])

        flac_loss = 0.0
        if use_flac:
            new_sl = slice(old_classes, None)
            A = int_masks_raw
            a_ori = jax.nn.sigmoid(jnp.mean(A[:bs, ..., new_sl], axis=-1))
            a_flip = jax.nn.sigmoid(jnp.mean(
                jnp.flip(A[bs:2 * bs, ..., new_sl], axis=2), axis=-1))
            a_rot = jax.nn.sigmoid(jnp.mean(A[2 * bs:, ..., new_sl], axis=-1))
            a_rot_back = _rot90_back(jax.lax.stop_gradient(a_rot)[..., None],
                                     angle_k)[..., 0]
            a_target = jax.lax.stop_gradient(
                jnp.maximum(jnp.maximum(a_ori, a_flip), a_rot_back))
            a_rot_target = jax.lax.stop_gradient(
                _rot90_batch(a_target[..., None], angle_k)[..., 0])
            flac_loss = (jnp.mean(jnp.square(a_ori - a_target)) +
                         jnp.mean(jnp.square(a_flip - a_target)) +
                         jnp.mean(jnp.square(a_rot - a_rot_target))) / 3.0
            int_masks_raw = int_masks_raw[:bs]
        pl_stats = pl_stats["batch_stats"]

        # ---- peak generator ---------------------------------------------
        peak_logits, _ = peakgenerator.apply(
            {"params": params["peakgenerator"]}, int_masks_raw, train=True)

        # ---- CAM losses ---------------------------------------------------
        # l1h is (B, tot-1); new-class slice starts at old_classes-1
        cam_labels = l1h if no_mask else l1h[:, old_classes - 1:]
        l_cam_new = wss_losses.bce_loss(
            int_masks_raw, cam_labels, mode="ngwp", reduction="mean")
        l_peak = losses.bce_with_logits(
            peak_logits[:, old_classes - 1:], l1h[:, old_classes - 1:])

        cam_size = int_masks.shape[1:3]
        out_old_seg = resize_bilinear(out_old["seg"], cam_size, align_corners=False)
        out_seg = resize_bilinear(pred["seg"], cam_size, align_corners=False)
        target_old = jax.nn.sigmoid(out_old_seg.astype(jnp.float32))
        if no_mask:
            # train.py:351-352: mask old-class targets by image labels
            target_old = target_old.at[..., 1:].multiply(
                l1h[:, None, None, :old_classes - 1])
        l_loc = losses.bce_with_logits(int_masks_raw[..., :old_classes], target_old)

        l_cam_int = l_cam_new + l_loc + l_peak
        if use_flac:
            l_cam_int = l_cam_int + flac_loss

        lde = loss_de * losses.feature_distillation(feat_body, feats_old["body"])

        l_seg = 0.0
        l_cls = 0.0
        if use_pseudo:
            soft = jax.nn.softmax(int_masks.astype(jnp.float32), axis=-1)
            int_masks_orig = soft
            int_masks_soft = soft
            if use_affinity:
                im = denorm(images)
                int_masks_soft = pamr(
                    resize_bilinear(im, cam_size, align_corners=True),
                    jax.lax.stop_gradient(int_masks_soft))

            lab = l1h[:, None, None, :]
            int_masks_orig = int_masks_orig.at[..., 1:].multiply(lab)
            int_masks_soft = int_masks_soft.at[..., 1:].multiply(lab)

            pseudo_gt_seg = jax.lax.stop_gradient(wss_losses.pseudo_gtmask(
                int_masks_soft, ambiguous=True, cutoff_top=0.6,
                cutoff_bkg=0.7, cutoff_low=0.2))

            lx = wss_losses.binarize(int_masks_orig)
            pseudo_gt_seg_lx = alpha * lx + (1 - alpha) * int_masks_orig

            px_cls = jnp.sum(pseudo_gt_seg_lx.reshape(bs, -1, tot_classes), axis=1)
            bw = (px_cls[:, old_classes:] > 0) == (l1h[:, old_classes - 1:] > 0)
            batch_weight = (jnp.sum(bw, axis=1) ==
                            (tot_classes - old_classes)).astype(jnp.float32)

            pseudo_seg_map = jnp.concatenate(
                [target_old, pseudo_gt_seg_lx[..., old_classes:]], axis=-1)
            if icarl_bkg == -1:
                bg = jnp.minimum(pseudo_seg_map[..., 0], pseudo_gt_seg_lx[..., 0])
            else:
                bg = ((1 - icarl_bkg) * pseudo_seg_map[..., 0] +
                      icarl_bkg * pseudo_gt_seg_lx[..., 0])
            pseudo_seg_map = pseudo_seg_map.at[..., 0].set(bg)

            per_pix = jnp.sum(losses._bce_logits(out_seg, pseudo_seg_map), axis=-1)
            per_img = jnp.mean(per_pix.reshape(bs, -1), axis=-1)
            l_seg = l_seg_weight * jnp.sum(batch_weight * per_img) / (
                jnp.sum(batch_weight) + 1e-5)

            l_cls = wss_losses.balanced_mask_loss_ce(int_masks_raw, pseudo_gt_seg, l1h)

            if use_randrop:
                ref = jax.nn.sigmoid(int_masks.astype(jnp.float32))
                ref = ref.at[..., 1:].multiply(lab)
                l_cam_int = l_cam_int + wss_losses.randrop_loss(
                    int_masks_raw, ref, rng_randrop, old_classes,
                    label=l1h if no_mask else None)

        l_reg = l_cls + l_cam_int
        loss_tot = l_seg + lde + l_reg
        new_stats = {"model": model_stats["batch_stats"],
                     "pseudolabeler": pl_stats,
                     "peakgenerator": stats.get("peakgenerator", {})}
        metrics = {"loss": loss_tot, "l_seg": l_seg, "l_cam_int": l_cam_int,
                   "l_cam_new": l_cam_new, "l_loc": l_loc, "l_cls": l_cls,
                   "lde": lde, "flac": flac_loss}
        return loss_tot, (new_stats, metrics)

    @partial(jax.jit, donate_argnums=0)
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   old_vars: Any, rng: jax.Array
                   ) -> Tuple[TrainState, Dict[str, Any]]:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_stats, metrics)), grads = grad_fn(
            state.params, state.batch_stats, batch, old_vars, rng)
        state = state.apply_gradients(tx, grads)
        state = state.replace(batch_stats=new_stats)
        return state, metrics

    return train_step


def phase1_group_fn(path: str) -> str:
    """LR-group mapping for the combined phase-1 param tree."""
    if path.startswith("model/body/"):
        return "body"
    if path.startswith(("pseudolabeler/", "peakgenerator/")):
        return "pseudo"
    return "seg"
