"""WSS losses: ngwp focal pooling, image-level BCE, pseudo-GT masks,
balanced mask losses, randrop negative loss.

Re-design of reference ``utils/wss_loss.py`` and ``wss/single_stage.py:18-123``
as pure NHWC functions.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from cl4wsis_tpu.ops.resize import resize_bilinear
from cl4wsis_tpu.train.losses import _bce_logits


def ngwp_focal(outputs: jnp.ndarray, focal: bool = True, lam: float = 1e-2
               ) -> jnp.ndarray:
    """nGWP image logits + focal penalty (``utils/wss_loss.py:7-22``)."""
    B, H, W, C = outputs.shape
    x = outputs.astype(jnp.float32).reshape(B, H * W, C)
    masks = jax.nn.softmax(x, axis=-1)
    y_ngwp = jnp.sum(x * masks, axis=1) / (1.0 + jnp.sum(masks, axis=1))
    if focal:
        m = jnp.mean(masks, axis=1)
        y_focal = (1.0 - m) ** 3 * jnp.log(lam + m)
        return y_ngwp + y_focal
    return y_ngwp


def bce_loss(outputs: jnp.ndarray, labels: jnp.ndarray, mode: str = "ngwp",
             reduction: str = "sum") -> jnp.ndarray:
    """Image-level BCE on pooled CAM logits, last len(labels) channels
    (``utils/wss_loss.py:36-53``)."""
    if mode == "ngwp":
        y = ngwp_focal(outputs)
    else:
        B, H, W, C = outputs.shape
        y = jnp.mean(outputs.reshape(B, H * W, C), axis=1)
    n_cls = labels.shape[-1]
    y = y[:, -n_cls:]
    per = _bce_logits(y, labels)
    if reduction == "sum":
        return jnp.mean(jnp.sum(per, axis=1))
    return jnp.mean(per)


def binarize(x: jnp.ndarray) -> jnp.ndarray:
    """One-hot of the channel argmax (>= max, ties all set) —
    ``utils/wss_loss.py:188-190``."""
    m = jnp.max(x, axis=-1, keepdims=True)
    return (x >= m).astype(x.dtype)


def pseudo_gtmask(mask: jnp.ndarray, ambiguous: bool = True,
                  cutoff_top: float = 0.6, cutoff_bkg: float = 0.7,
                  cutoff_low: float = 0.2) -> jnp.ndarray:
    """Soft masks -> binary pseudo GT with adaptive per-class cutoffs
    (``wss/single_stage.py:18-40``). mask: (B,H,W,C) probabilities."""
    B, H, W, C = mask.shape
    m = mask.reshape(B, H * W, C)
    mx = jnp.max(m, axis=1, keepdims=True)
    scale = jnp.concatenate(
        [jnp.full((1, 1, 1), cutoff_bkg), jnp.full((1, 1, C - 1), cutoff_top)],
        axis=-1).astype(m.dtype)
    thresh = jnp.maximum(mx * scale, cutoff_low)
    pseudo = (m > thresh).astype(mask.dtype)
    if ambiguous:
        amb = (jnp.sum(pseudo, axis=-1, keepdims=True) > 1).astype(mask.dtype)
        pseudo = (1.0 - amb) * pseudo
    return pseudo.reshape(B, H, W, C)


def _balanced_weights(pseudo_gt: jnp.ndarray, gt_labels: jnp.ndarray):
    """Shared class/batch weighting of the balanced mask losses
    (``wss/single_stage.py:43-80``)."""
    B, H, W, C = pseudo_gt.shape
    npc = jnp.sum(pseudo_gt.reshape(B, H * W, C), axis=1)          # B,C
    ntot = jnp.sum(npc, axis=-1, keepdims=True)                    # B,1
    class_weight = (ntot - npc) / (1.0 + ntot)                     # B,C
    pix_weight = jnp.sum(pseudo_gt * class_weight[:, None, None, :], axis=-1)

    # batch gate: image passes iff its pseudo mask contains exactly the
    # GT image-level class set (+ background)
    gt_num = jnp.sum(gt_labels, axis=-1) + 1.0
    npc_gated = npc.at[:, 1:].multiply(gt_labels)
    ps_num = jnp.sum((npc_gated > 0).astype(jnp.float32), axis=-1)
    batch_weight = (gt_num == ps_num).astype(jnp.float32)
    return pix_weight, batch_weight, npc


def balanced_mask_loss_ce(mask_logits: jnp.ndarray, pseudo_gt: jnp.ndarray,
                          gt_labels: jnp.ndarray,
                          ignore_index: int = 255) -> jnp.ndarray:
    """Class-balanced CE over pseudo GT with image-level gating."""
    B, H, W, C = pseudo_gt.shape
    mask_logits = resize_bilinear(mask_logits, (H, W), align_corners=True)
    mask_gt = jnp.argmax(pseudo_gt, axis=-1)
    valid = jnp.sum(pseudo_gt, axis=-1) >= 1.0

    logp = jax.nn.log_softmax(mask_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, mask_gt[..., None], axis=-1)[..., 0]
    nll = nll * valid

    pix_weight, batch_weight, _ = _balanced_weights(pseudo_gt, gt_labels)
    per_img = jnp.mean((pix_weight * nll).reshape(B, -1), axis=-1)
    return jnp.mean(batch_weight * per_img)


def balanced_mask_loss_unce(mask_logits: jnp.ndarray, pseudo_gt: jnp.ndarray,
                            gt_labels: jnp.ndarray, old_cl: int,
                            ignore_index: int = 255) -> jnp.ndarray:
    """Unbiased variant: old classes folded into background
    (``wss/single_stage.py:83-123``)."""
    B, H, W, C = pseudo_gt.shape
    mask_logits = resize_bilinear(mask_logits, (H, W), align_corners=True)
    x = mask_logits.astype(jnp.float32)
    mask_gt = jnp.argmax(pseudo_gt, axis=-1)
    valid = jnp.sum(pseudo_gt, axis=-1) >= 1.0

    den = jax.nn.logsumexp(x, axis=-1)
    log_bkg = jax.nn.logsumexp(x[..., :old_cl], axis=-1) - den
    log_new = x[..., old_cl:] - den[..., None]
    picked = jnp.take_along_axis(
        log_new, jnp.clip(mask_gt - old_cl, 0, C - old_cl - 1)[..., None],
        axis=-1)[..., 0]
    logp = jnp.where(mask_gt < old_cl, jnp.where(mask_gt == 0, log_bkg, 0.0), picked)
    # NB: nll_loss picks outputs[label]; labels 1..old_cl-1 index zero-filled
    # channels in the reference, giving 0 loss — matched by the where above.
    nll = -(logp * valid)

    pix_weight, batch_weight, _ = _balanced_weights(pseudo_gt, gt_labels)
    per_img = jnp.mean((pix_weight * nll).reshape(B, -1), axis=-1)
    return jnp.mean(batch_weight * per_img)


def randrop_loss(inputs: jnp.ndarray, entropy_ref: jnp.ndarray, rng: jax.Array,
                 old_classes: int, label: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
    """Random-drop negative loss (``utils/wss_loss.py:217-252``): on pixels
    where a new class is confident (> 0.5), BCE a random *old* class toward 1
    as a negative/regularization signal.

    inputs: (B,h,w,C) CAM logits; entropy_ref: (B,h,w,C) sigmoid CAM masked
    by image labels.
    """
    B, H, W, C = inputs.shape
    seg_new_max = jnp.max(entropy_ref[..., old_classes:], axis=-1)
    weight = (seg_new_max > 0.5).astype(jnp.float32)

    labels_neg = jax.random.randint(rng, (B, H, W), 0, old_classes)
    ignore = weight == 0
    if label is not None:
        # drop negative classes absent from the image-level label
        present = jnp.take_along_axis(
            jnp.pad(label, ((0, 0), (1, 0)), constant_values=1.0),
            labels_neg.reshape(B, -1), axis=1).reshape(B, H, W)
        ignore = ignore | (present == 0)

    onehot = jax.nn.one_hot(labels_neg, C, dtype=jnp.float32)
    onehot = onehot * (~ignore)[..., None]
    # positive-channel-only BCE (wss_loss.py:254-274 variant)
    per = _bce_logits(inputs, onehot) * (onehot == 1.0)
    pix = jnp.sum(per, axis=-1)
    valid = jnp.sum(onehot, axis=-1) != 0
    n_valid = jnp.sum(valid)
    loss = jnp.where(n_valid > 0, jnp.sum(pix * valid) / jnp.maximum(n_valid, 1), 0.0)
    return jnp.where(jnp.sum(weight) > 0, loss, 0.0)
