"""Training losses (pure functions over NHWC arrays).

Re-design of reference ``utils/loss.py``. Every loss is a pure jittable
function; reductions match the reference's actual call-site usage (the
Trainer constructs them with reduction='none' then `.mean()`s —
``train.py:102-110,295-300``).

Conventions: logits/targets are NHWC (channels last); integer label maps are
(B, H, W) with 255 = ignore.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits_ignore(logits: jnp.ndarray, targets: jnp.ndarray,
                           ignore_index: int = 255) -> jnp.ndarray:
    """Per-pixel sum-over-class BCE vs one-hot targets, 0 at ignore pixels.

    Matches BCEWithLogitsLossWithIgnoreIndex(reduction='none')
    (``utils/loss.py:62-85``): returns (B, H, W); the caller means over all
    pixels (ignored pixels contribute 0 but stay in the denominator,
    as in ``train.py:288-291`` + ``.mean()``).
    """
    C = logits.shape[-1]
    valid = targets != ignore_index
    onehot = jax.nn.one_hot(jnp.where(valid, targets, 0), C, dtype=logits.dtype)
    onehot = onehot * valid[..., None]
    per_class = _bce_logits(logits, onehot)
    return jnp.sum(per_class, axis=-1) * valid


def _bce_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy with logits (torch semantics)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean BCE-with-logits over soft targets (torch nn.BCEWithLogitsLoss)."""
    return jnp.mean(_bce_logits(logits, targets))


def deeplab_ce(logits: jnp.ndarray, labels: jnp.ndarray,
               ignore_index: int = 255,
               top_k_percent: float = 0.2) -> jnp.ndarray:
    """Hard-pixel-mining cross entropy (``utils/loss.py:278-307``).

    CE over valid pixels; only the top-k fraction of *all* pixel losses
    (ignored ones contribute 0) enter the mean, like the reference which
    top-ks over the full flattened loss tensor.
    """
    C = logits.shape[-1]
    valid = labels != ignore_index
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, jnp.where(valid, labels, 0)[..., None],
                               axis=-1)[..., 0]
    nll = nll * valid
    flat = nll.reshape(-1)
    if top_k_percent >= 1.0:
        return jnp.mean(flat)
    k = max(int(top_k_percent * flat.size), 1)
    top = jax.lax.top_k(flat, k)[0]
    return jnp.mean(top)


def weighted_mse(out: jnp.ndarray, target: jnp.ndarray,
                 weight: jnp.ndarray) -> jnp.ndarray:
    """Center-map loss: sum(w * (out-target)^2) / count(w > 0).

    `weight` is (B, H, W, 1), broadcast over channels; the normalizer counts
    positive *weight* entries, not broadcasted elements
    (``utils/loss.py:259-275``).
    """
    loss = jnp.square(out.astype(jnp.float32) - target.astype(jnp.float32)) * weight
    n = jnp.sum(weight > 0).astype(jnp.float32)
    return jnp.where(n > 0, jnp.sum(loss) / jnp.maximum(n, 1.0), 0.0)


def weighted_l1(out: jnp.ndarray, target: jnp.ndarray,
                weight: jnp.ndarray) -> jnp.ndarray:
    """Offset-map loss: sum(w * |out-target|) / count(w > 0)."""
    loss = jnp.abs(out.astype(jnp.float32) - target.astype(jnp.float32)) * weight
    n = jnp.sum(weight > 0).astype(jnp.float32)
    return jnp.where(n > 0, jnp.sum(loss) / jnp.maximum(n, 1.0), 0.0)


def unbiased_ce(logits: jnp.ndarray, labels: jnp.ndarray, old_cl: int,
                ignore_index: int = 255) -> jnp.ndarray:
    """Unbiased cross entropy: old classes fold into background probability
    (``utils/loss.py:122-142``). Returns the mean over valid pixels."""
    logits = logits.astype(jnp.float32)
    den = jax.nn.logsumexp(logits, axis=-1)
    log_bkg = jax.nn.logsumexp(logits[..., :old_cl], axis=-1) - den
    log_new = logits[..., old_cl:] - den[..., None]
    # labels < old_cl map to the folded background bucket 0
    lab = jnp.where(labels < old_cl, 0, labels)
    valid = labels != ignore_index
    lab = jnp.where(valid, lab, 0)
    picked_new = jnp.take_along_axis(
        log_new, jnp.clip(lab - old_cl, 0, logits.shape[-1] - old_cl - 1)[..., None],
        axis=-1)[..., 0]
    logp = jnp.where(lab == 0, log_bkg, picked_new)
    nll = -(logp * valid)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def kd_loss(inputs: jnp.ndarray, targets: jnp.ndarray, alpha: float = 1.0,
            mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Soft cross-entropy distillation (``utils/loss.py:145-169``).

    inputs: new-model logits (B,H,W,C_tot); targets: old-model logits
    (B,H,W,C_old). Loss = -mean over pixels of mean over old classes of
    softmax(target*alpha) * log_softmax(input[..., :C_old]).
    """
    c_old = targets.shape[-1]
    x = inputs[..., :c_old].astype(jnp.float32)
    outputs = jax.nn.log_softmax(x, axis=-1)
    labels = jax.nn.softmax(targets.astype(jnp.float32) * alpha, axis=-1)
    loss = jnp.mean(outputs * labels, axis=-1)
    if mask is not None:
        loss = loss * mask
    return -jnp.mean(loss)


def unbiased_kd_loss(inputs: jnp.ndarray, targets: jnp.ndarray, alpha: float = 1.0,
                     mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Unbiased KD: new-class logits fold into the background of the old
    distribution (``utils/loss.py:172-205``)."""
    c_tot = inputs.shape[-1]
    c_old = targets.shape[-1]
    x = inputs.astype(jnp.float32)
    t = targets.astype(jnp.float32) * alpha
    den = jax.nn.logsumexp(x, axis=-1)
    out_no_bkg = x[..., 1:c_old] - den[..., None]
    bkg_and_new = jnp.concatenate([x[..., :1], x[..., c_old:c_tot]], axis=-1)
    out_bkg = jax.nn.logsumexp(bkg_and_new, axis=-1) - den
    labels = jax.nn.softmax(t, axis=-1)
    loss = (labels[..., 0] * out_bkg +
            jnp.sum(labels[..., 1:] * out_no_bkg, axis=-1)) / c_old
    if mask is not None:
        loss = loss * mask
    return -jnp.mean(loss)


def icarl_loss(inputs: jnp.ndarray, targets: jnp.ndarray, output_old: jnp.ndarray,
               bkg: float = 1.0, ignore_index: int = 255) -> jnp.ndarray:
    """iCaRL distillation-BCE (``utils/loss.py:88-119``): one-hot targets with
    old-class channels replaced by the old model's (sigmoid) outputs."""
    C = inputs.shape[-1]
    c_old = output_old.shape[-1]
    valid = targets != ignore_index
    onehot = jax.nn.one_hot(jnp.where(valid, targets, 0), C, dtype=jnp.float32)
    onehot = onehot * valid[..., None]
    onehot = onehot.at[..., 1:c_old].set(output_old[..., 1:])
    if bkg != -1:
        onehot = onehot.at[..., 0].set(bkg * onehot[..., 0] + (1 - bkg) * output_old[..., 0])
    else:
        onehot = onehot.at[..., 0].set(jnp.minimum(onehot[..., 0], output_old[..., 0]))
    loss = jnp.sum(_bce_logits(inputs, onehot), axis=-1)
    return jnp.mean(loss)


def feature_distillation(features: jnp.ndarray, features_old: jnp.ndarray) -> jnp.ndarray:
    """loss_de: MSE between new and old backbone features (``train.py:362-363``)."""
    return jnp.mean(jnp.square(features.astype(jnp.float32) -
                               features_old.astype(jnp.float32)))
