"""Step-0 (fully supervised base step) jitted train step.

Re-design of the reference supervised path (``train.py:241-300,528-541``):
seg BCE-with-ignore (mean) + 200 x weighted-MSE center + 0.01 x weighted-L1
offset, AMP replaced by bf16 compute (no loss scaling needed on TPU), DDP
replaced by jit over a sharded batch.

The center/offset/weight targets are generated on device inside the same
jitted program (``ops/labelgen.py``) from the (seg, instance-id) maps —
the reference computes these per-sample in dataloader workers
(``dataset/dataset.py:218-224``).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from cl4wsis_tpu.ops.labelgen import batched_label_generation
from cl4wsis_tpu.ops.resize import resize_bilinear
from cl4wsis_tpu.train import losses
from cl4wsis_tpu.train.state import TrainState

CENTER_LOSS_WEIGHT = 200.0   # train.py:100
OFFSET_LOSS_WEIGHT = 0.01    # train.py:101


def make_step0_train_step(model, tx: optax.GradientTransformation,
                          seg_loss: str = "bce", sigma: int = 6,
                          max_inst: int = 50) -> Callable:
    """Returns jitted fn: (state, batch, rng) -> (state, metrics).

    batch: image (B,H,W,3) float, seg (B,H,W) int32 (255 ignore),
           inst (B,H,W) int32 dense instance ids.
    """
    n_things = model.tot_classes - 1

    def loss_fn(params, batch_stats, batch, rng):
        # accept both raw model trees and the trainer's {"model": ...} wrap
        p = params.get("model", params)
        s = batch_stats.get("model", batch_stats)
        (pred, _), new_vars = model.apply(
            {"params": p, "batch_stats": s},
            batch["image"], train=True, interpolate=False,
            mutable=["batch_stats"], rngs={"dropout": rng})
        size = batch["image"].shape[1:3]
        # reference interpolates raw outputs with align_corners=False here
        # (train.py:281-282), unlike eval-time upsampling
        pred = {k: resize_bilinear(v, size, align_corners=False)
                for k, v in pred.items()}

        if model.has_instance:
            center, offset, weight = batched_label_generation(
                batch["seg"], batch["inst"], num_classes=n_things,
                sigma=sigma, max_inst=max_inst)

        if seg_loss == "bce":
            l_seg = jnp.mean(losses.bce_with_logits_ignore(pred["seg"], batch["seg"]))
        elif seg_loss == "dce":
            l_seg = losses.deeplab_ce(pred["seg"], batch["seg"])
        else:
            raise ValueError(seg_loss)
        if model.has_instance:
            l_center = losses.weighted_mse(pred["center"], center, weight) * CENTER_LOSS_WEIGHT
            l_offset = losses.weighted_l1(pred["offset"], offset, weight) * OFFSET_LOSS_WEIGHT
        else:  # --model DeeplabV3: semantic-only CL (no instance branch)
            l_center = 0.0
            l_offset = 0.0
        loss = l_seg + l_center + l_offset
        metrics = {"loss": loss, "l_seg": l_seg, "l_center": l_center,
                   "l_offset": l_offset}
        new_stats = new_vars["batch_stats"]
        if "model" in batch_stats:
            new_stats = {"model": new_stats}
        return loss, (new_stats, metrics)

    @partial(jax.jit, donate_argnums=0)
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array) -> Tuple[TrainState, Dict[str, Any]]:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_stats, metrics)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng)
        state = state.apply_gradients(tx, grads)
        state = state.replace(batch_stats=new_stats)
        return state, metrics

    return train_step


def init_state(model, tx: optax.GradientTransformation, rng: jax.Array,
               input_shape=(1, 512, 512, 3)) -> TrainState:
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32), train=False)
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params=variables["params"],
                      batch_stats=variables["batch_stats"],
                      opt_state=tx.init(variables["params"]))
